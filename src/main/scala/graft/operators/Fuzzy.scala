package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.sources.Tables

/** Blocked approximate-string matching — entity resolution for the messy
  * identifiers a crawl corpus carries (near-identical titles, vendor
  * names, product labels). The reference resolves entities only by exact
  * integer id (ALSKafkaConsumer.java:78-82 keys state on `id-KIND`); a
  * curation engine also needs the fuzzy variant.
  *
  * Scale shape: never all-pairs. Candidates are generated ONLY within a
  * caller-chosen blocking key (here: a token of the name), so the join is
  * an equi-join on the block with cost Σ |block|² — bounded by the
  * largest block, not the corpus. Edit distance runs on candidates only.
  * At 100 TB the blocking key is the lever (coarser = more recall, bigger
  * blocks); a skewed block is handled like any skewed equi-join key
  * (salt, AQE). Recall is bounded by the blocking rule by design — pairs
  * in different blocks are never compared (classic blocking tradeoff;
  * the rule itself is part of the operator's contract so the oracle
  * replays it exactly).
  */
object Fuzzy {

  /** Within-block pairs of distinct `nameCol` values at Levenshtein
    * distance ≤ `maxDist`. `blockExpr` maps a name to its blocking key.
    * Emits (block, name_a, name_b, dist) with name_a < name_b. */
  def blockedLevenshtein(df: DataFrame, nameCol: String,
                         blockExpr: org.apache.spark.sql.Column,
                         maxDist: Int): DataFrame = {
    val names = df.select(col(nameCol).as("name")).distinct()
      .select(col("name"), blockExpr.as("block"))
    val l = names.select(col("block"), col("name").as("name_a"))
    val r = names.select(col("block"), col("name").as("name_b"))
    l.join(r, "block")
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
  }
}

/** Driver-contract queries for [[Fuzzy]]. */
object FuzzyPack extends QueryPack {

  val MaxDist = 3

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Entity resolution over part names: block on the last name token
    // (the product noun), pair within blocks, keep pairs within edit
    // distance 3. The blocking key is part of the operator contract, so
    // the oracle replays the identical rule.
    "q127_fuzzy_join" -> ((s, dir) => {
      val parts = Tables.table(s, dir, "part")
      Fuzzy.blockedLevenshtein(parts, "p_name",
          element_at(split(col("name"), " "), -1), MaxDist)
        .select(col("block"), col("name_a"), col("name_b"),
          col("dist").cast("long").as("dist"))
        .orderBy("block", "name_a", "name_b")
    }),
  )

  def oracles: Map[String, String] = Map(

    "q127_fuzzy_join" ->
      s"""WITH names AS (
         |  SELECT DISTINCT p_name AS name FROM part),
         |blocked AS (
         |  SELECT name, string_split(name, ' ')[-1] AS block FROM names)
         |SELECT a.block, a.name AS name_a, b.name AS name_b,
         |       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
         |FROM blocked a JOIN blocked b
         |  ON a.block = b.block AND a.name < b.name
         |WHERE levenshtein(a.name, b.name) <= $MaxDist
         |ORDER BY a.block, name_a, name_b""".stripMargin,
  )
}
