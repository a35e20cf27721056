package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic pseudo-randomness and hashing with EXACT DuckDB SQL
  * equivalents, so that fixture data (synthetic model factors, minhash
  * permutations, …) can be oracle-checked bit-for-bit.
  *
  * The reference seeds `scala.util.Random` for its synthetic models
  * (model-generator/ALSModelGenerator.scala:28-32); neither JVM Random nor
  * Spark's `rand(seed)` is reproducible inside DuckDB, so we use an LCG over
  * the row id instead — same distributional role, cross-engine deterministic.
  *
  * Every Column builder here has a paired `*Sql` string builder producing
  * the equivalent DuckDB expression.
  */
object Portable {

  /** 2^31 - 1 (Mersenne prime), the LCG / universal-hash modulus. */
  val M: Long = 2147483647L

  // ---- LCG pseudo-random in [0, M) / [0, 1) ------------------------------
  // The id is reduced mod M BEFORE the multiply: (M-1) * 1103515245 ≈ 2.4e18
  // stays inside signed 64-bit, so ids beyond ~8.4e9 (SF-100k key ranges)
  // neither wrap silently in Spark nor overflow-abort in DuckDB.

  def lcg(id: Column, j: Int): Column =
    ((id.cast("long") % lit(M)) * lit(1103515245L) + lit(12345L * j)) % lit(M)

  def lcgUnit(id: Column, j: Int): Column =
    lcg(id, j).cast("double") / lit(M.toDouble)

  def lcgSql(id: String, j: Int): String =
    s"(((CAST($id AS BIGINT) % $M) * 1103515245 + ${12345L * j}) % $M)"

  def lcgUnitSql(id: String, j: Int): String =
    s"(CAST(${lcgSql(id, j)} AS DOUBLE) / $M.0)"

  // ---- deterministic k-dim factor vector ---------------------------------

  /** k-dim vector of LCG-uniform values in [0,1) — the synthetic stand-in
    * for trained latent factors (FIXTURES.md §2). */
  def factors(id: Column, k: Int): Column =
    array((1 to k).map(j => lcgUnit(id, j)): _*)

  /** DuckDB: the j-th factor component, 1-based. */
  def factorSql(id: String, j: Int): String = lcgUnitSql(id, j)

  // ---- deterministic decimal snap ----------------------------------------

  /** 6-decimal snap with NO tie semantics: floor(x·1e6)/1e6. ROUND(x, 6)
    * diverges across engines when x·1e6 sits on a .5 boundary — Spark
    * rounds the exact decimal expansion of the double (BigDecimal
    * HALF_UP) while DuckDB rounds the ×1e6-scaled double half-away, and
    * the two see DIFFERENT ties (observed: quality 0.4284375 at sf0.1 →
    * 0.428437 vs 0.428438). floor has no tie: both engines floor the
    * SAME scaled double (identical expression tree → identical IEEE
    * multiply), so the snap agrees bit-for-bit always. Use for outputs
    * derived from dense float formulas (scores); integer-ratio outputs
    * can keep ROUND (their doubles are identical anyway). */
  def snap6(c: Column): Column =
    floor(c * lit(1e6)).cast("double") / lit(1e6)

  def snap6Sql(x: String): String =
    s"(floor(($x) * 1000000.0) / 1000000.0)"

  // ---- portable 32-bit string hash (md5 prefix) --------------------------

  /** Unsigned 32-bit hash of a string: first 8 hex chars of md5.
    * DuckDB twin: CAST('0x' || substr(md5(s),1,8) AS BIGINT). */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  def hash32Sql(s: String): String =
    s"CAST('0x' || substr(md5($s), 1, 8) AS BIGINT)"

  /** hash32 reduced mod M — safe operand for universal hashing
    * (a*h+b stays well under 2^63 for a,b < 2^31). */
  def hash32m(s: Column): Column = hash32(s) % lit(M)

  def hash32mSql(s: String): String = s"(${hash32Sql(s)} % $M)"

  /** i-th universal hash of an already-reduced hash value h in [0, M):
    * (a_i * h + b_i) mod M with odd a_i derived from i. */
  def permute(h: Column, i: Int): Column =
    (h * lit(permA(i)) + lit(permB(i))) % lit(M)

  def permuteSql(h: String, i: Int): String =
    s"(($h * ${permA(i)} + ${permB(i)}) % $M)"

  def permA(i: Int): Long = 2L * ((1103515245L * i + 12345L) % (M / 2)) + 1L
  def permB(i: Int): Long = (1103515245L * (i + 77) + 12345L) % M
}
