package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: flag evaluation documents whose word
  * n-grams overlap the training corpus — the benchmark-leakage check every
  * serious training-data pipeline runs before a model ships (no reference
  * analog; builder-prompt LLM-pipeline scope).
  *
  * Scale shape: the training side reduces to a DISTINCT shingle set (one
  * shuffle, shingle-keyed — never doc-keyed, so a 100 TB corpus becomes
  * its vocabulary of n-grams); the eval side (small by definition) joins
  * against it on the shingle. No pair enumeration anywhere: cost is
  * |train shingles| + |eval shingles|, and the contaminated verdict is a
  * per-eval-doc aggregation.
  */
object Decontaminate {

  /** Per-eval-doc overlap report: (id, n_sh, n_hit, overlap_frac,
    * contaminated). `n_sh` distinct n-grams in the eval doc, `n_hit` of
    * them present anywhere in train; contaminated ⇔ rounded overlap
    * fraction ≥ threshold. Eval docs too short for a single n-gram report
    * 0 / not contaminated.
    *
    * INPUT CONTRACT (inherited from [[Dedup.shingles]]): `id` must be
    * unique per `eval` row — shingle dedup is row-local, so an eval frame
    * with several rows per id would inflate n_sh/n_hit (overlap_frac
    * still divides out). The train side needs no such contract (its
    * shingles are globally `.distinct()`-ed here). */
  def overlap(train: DataFrame, eval: DataFrame, n: Int, threshold: Double,
              id: String = "doc_id", text: String = "text"): DataFrame = {
    val trainSh = Dedup.shingles(train, n, id, text).select(col("sh")).distinct()
    val evalSh = Dedup.shingles(eval, n, id, text)
    val counts = evalSh.groupBy(col(id)).agg(count(lit(1)).as("n_sh"))
    val hits = evalSh.join(trainSh, "sh")
      .groupBy(col(id)).agg(count(lit(1)).as("n_hit"))
    eval.select(col(id)).distinct()
      .join(counts, Seq(id), "left")
      .join(hits, Seq(id), "left")
      .select(col(id),
        coalesce(col("n_sh"), lit(0L)).as("n_sh"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("overlap_frac",
        round(when(col("n_sh") === 0, 0.0)
          .otherwise(col("n_hit").cast("double") / col("n_sh")), 6))
      .withColumn("contaminated", col("overlap_frac") >= threshold)
  }
}
