package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 appears as a named entry in
  * [[queries]], with a DuckDB-equivalent in [[oracleSql]] where the
  * semantics are ANSI-SQL-expressible. Column names and value rounding are
  * aligned pairwise so the driver's sorted-hash compare is stable.
  */
object SparkEntry {

  private val K = Ratings.DefaultK

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's end-to-end capability in one plan: rating fact ⋈
    * broadcast factor models → dot-product predictions → MSE. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    AlsScoring.mse(AlsScoring.predictions(
      Ratings.ratings(spark, dir),
      Ratings.userFactors(spark, dir, K),
      Ratings.itemFactors(spark, dir, K)))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J2 + A4 + P12: joins, dot product, global aggregate (MSE pipeline).
    "q01_mse" -> ((s, dir) => {
      AlsScoring.mse(AlsScoring.predictions(
        Ratings.ratings(s, dir),
        Ratings.userFactors(s, dir, K),
        Ratings.itemFactors(s, dir, K)))
        .select(round(col("mse"), 6).as("mse"), col("n"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_mse" ->
      s"""WITH r AS (${Ratings.ratingsSql}),
         |uf AS (${Ratings.userFactorsSql(K)}),
         |itf AS (${Ratings.itemFactorsSql(K)}),
         |p AS (SELECT rating, ${Ratings.dotSql(K)} AS prediction
         |      FROM r JOIN uf USING (user_id) JOIN itf USING (item_id))
         |SELECT ROUND(AVG((rating - prediction) * (rating - prediction)), 6) AS mse,
         |       CAST(COUNT(*) AS BIGINT) AS n
         |FROM p""".stripMargin
  )
}
