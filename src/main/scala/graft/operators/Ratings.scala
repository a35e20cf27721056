package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.sources.Tables

/** The reference's model-serving data model (ratings fact + latent factor
  * tables, FIXTURES.md §1) mapped deterministically onto the driver's
  * TPC-H-ish testdata (FIXTURES.md §2).
  *
  *  - ratings fact  = orders ⋈ lineitem → (user_id, item_id, rating)
  *  - user factors  = per c_custkey k-dim LCG vector (stand-in for the ALS
  *    user factor file, flink-als/ALSImpl.scala:55-62)
  *  - item factors  = per p_partkey k-dim LCG vector
  *
  * Factors are a pure function of the key so every downstream operator is
  * DuckDB-oracle checkable; at scale they would be a trained model table —
  * the join topology (fact ⋈ broadcast dim) is identical.
  */
object Ratings {

  val DefaultK = 8

  /** The rating fact. One row per lineitem; user = ordering customer,
    * item = part, rating = quantity. */
  def ratings(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(
        Tables.table(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_quantity")),
        col("o_orderkey") === col("l_orderkey"))
      .select(
        col("o_custkey").as("user_id"),
        col("l_partkey").as("item_id"),
        col("l_quantity").as("rating"))

  /** DuckDB twin of [[ratings]] as a CTE body. */
  val ratingsSql: String =
    """SELECT o_custkey AS user_id, l_partkey AS item_id, l_quantity AS rating
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin

  /** User factor table: (user_id, uf ARRAY<DOUBLE>). Small dim — broadcast. */
  def userFactors(spark: SparkSession, dir: String, k: Int = DefaultK): DataFrame =
    Tables.table(spark, dir, "customer")
      .select(col("c_custkey").cast("long").as("user_id"),
        Portable.factors(col("c_custkey"), k).as("uf"))

  /** Item factor table: (item_id, itf ARRAY<DOUBLE>). Small dim — broadcast. */
  def itemFactors(spark: SparkSession, dir: String, k: Int = DefaultK): DataFrame =
    Tables.table(spark, dir, "part")
      .select(col("p_partkey").cast("long").as("item_id"),
        Portable.factors(col("p_partkey"), k).as("itf"))

  /** DuckDB: user factor components as columns u1..uk. */
  def userFactorsSql(k: Int = DefaultK): String = {
    val comps = (1 to k).map(j => s"${Portable.factorSql("c_custkey", j)} AS u$j")
    s"SELECT c_custkey AS user_id, ${comps.mkString(", ")} FROM customer"
  }

  /** DuckDB: item factor components as columns i1..ik. */
  def itemFactorsSql(k: Int = DefaultK): String = {
    val comps = (1 to k).map(j => s"${Portable.factorSql("p_partkey", j)} AS i$j")
    s"SELECT p_partkey AS item_id, ${comps.mkString(", ")} FROM part"
  }

  /** DuckDB: left-associated dot product of u1..uk × i1..ik — bit-matches
    * VectorFunctions.dot's fold order. */
  def dotSql(k: Int = DefaultK): String =
    (1 to k).map(j => s"u$j * i$j").mkString("(", " + ", ")")
}
