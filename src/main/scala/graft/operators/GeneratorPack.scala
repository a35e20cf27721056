package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.functions.Portable
import graft.sources.Tables

/** Synthetic model generators (SURVEY.md §2.2 P8/P9, model-generator
  * module) as oracle-checked queries.
  *
  * Reference: ALSModelGenerator.scala:28-53 emits `"id,U|I,f1;…"` records
  * with k uniform factors per id; SVMModelGenerator.scala:26-68 emits
  * range-bucketed `"bucket,idx:w;…"` rows where ~50% of weights are 0 and
  * the rest uniform(-10,10). Both are "for latency/throughput testing, not
  * quality" — the *distributional role* matters, not the RNG stream, so the
  * seeded JVM Random is replaced by the cross-engine-deterministic LCG
  * (graft.functions.Portable), which makes the generators bit-checkable in
  * DuckDB.
  *
  * Scale: `spark.range` is an embarrassingly parallel source with no
  * shuffle; the SVM layout adds exactly one shuffle (the bucket groupBy).
  */
object GeneratorPack extends QueryPack {

  val NumUsers = 1000
  val NumItems = 1500
  val K = 8
  val NumFeatures = 5000
  /** Bucket width of the range layout — tied to SvmPack so the generated
    * model and the trained-model export share one layout. */
  val Range: Int = SvmPack.Range

  /** P8: ALS model rows for ids 1..nU (users) ∪ 1..nI (items). */
  def alsModel(spark: SparkSession, nUsers: Int, nItems: Int, k: Int): DataFrame = {
    def side(n: Int, kind: String) =
      Tables.idRange(spark, n)
        .select(ModelCodec.encodeRecord(col("id"), lit(kind),
          Portable.factors(col("id"), k)).as("record"),
          lit(kind).as("kind"), col("id"))
    side(nUsers, "U").unionAll(side(nItems, "I"))
  }

  /** P9: SVM weights for features 1..n — exactly-50% structural zeros
    * (even LCG draw → 0) else uniform(-10,10). */
  def svmModel(spark: SparkSession, nFeatures: Int): DataFrame =
    Tables.idRange(spark, nFeatures)
      .select(col("id").as("feature_id"),
        when(Portable.lcg(col("id"), 3) % 2 === 0, 0.0)
          .otherwise(Portable.lcgUnit(col("id"), 4) * 20.0 - 10.0).as("w"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Generated ALS model: the serving loader's input records.
    "q18_als_generator" -> ((s, _) => {
      alsModel(s, NumUsers, NumItems, K)
        .select(col("record"), col("kind"), col("id"))
        .orderBy("kind", "id")
    }),

    // Generated SVM model in the range-partitioned export layout — the
    // same bucketOf/payloadExpr as the q05 layout, so the formats can't
    // drift apart.
    "q19_svm_generator" -> ((s, _) => {
      svmModel(s, NumFeatures)
        .groupBy(SvmPack.bucketOf(col("feature_id")).as("bucket"))
        .agg(
          SvmPack.payloadExpr.as("payload"),
          sum(when(col("w") === 0.0, 1).otherwise(0)).cast("long").as("n_zero"),
          count(lit(1)).as("n_features"))
        .orderBy("bucket")
    })
  )

  def oracles: Map[String, String] = {
    def recordSql(kind: String): String = {
      val parts = (1 to K).map(j => s"printf('%.6f', ${Portable.factorSql("id", j)})")
      s"concat_ws(',', id, '$kind', concat_ws(';', ${parts.mkString(", ")}))"
    }
    val wSql =
      s"""CASE WHEN ${Portable.lcgSql("id", 3)} % 2 = 0 THEN 0.0
         |ELSE ${Portable.lcgUnitSql("id", 4)} * 20.0 - 10.0 END""".stripMargin
    Map(
      "q18_als_generator" ->
        s"""WITH u AS (SELECT range AS id FROM range(1, ${NumUsers + 1})),
           |     i AS (SELECT range AS id FROM range(1, ${NumItems + 1}))
           |SELECT ${recordSql("U")} AS record, 'U' AS kind, id FROM u
           |UNION ALL
           |SELECT ${recordSql("I")} AS record, 'I' AS kind, id FROM i
           |ORDER BY kind, id""".stripMargin,

      "q19_svm_generator" ->
        s"""WITH ids AS (SELECT range AS id FROM range(1, ${NumFeatures + 1})),
           |w AS (SELECT id AS feature_id, $wSql AS w FROM ids)
           |SELECT CAST(feature_id // $Range AS BIGINT) AS bucket,
           |       string_agg(printf('%d:%.6f', CAST(feature_id AS BIGINT), w), ';' ORDER BY feature_id) AS payload,
           |       CAST(SUM(CASE WHEN w = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
           |       CAST(COUNT(*) AS BIGINT) AS n_features
           |FROM w GROUP BY 1 ORDER BY bucket""".stripMargin
    )
  }
}
