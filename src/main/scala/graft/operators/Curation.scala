package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{Portable, TextFunctions => T}

/** The end-to-end corpus-curation pipeline — the composition a
  * training-data run executes: language filter → quality floor → exact
  * dedup → MinHash-LSH near-dup removal.
  *
  * Scale shape: the language/quality stages are scan-stage expressions
  * (single-pass native token stats); exact dedup is ONE shuffle on the
  * content hash via `min_by` (no window sort over the corpus); near-dup is
  * the LSH pipeline (bounded by bucket collisions, not n²); the keep-list
  * anti-join broadcasts the small removal set. No stage is quadratic.
  *
  * Two faces:
  *  - [[pipeline]]: a pure-lazy DataFrame composition with NO caching —
  *    safe to hand to any caller (nothing to clean up). The exact-keep
  *    stage ends in a shuffle, so Spark's ReuseExchange computes the
  *    scan+filter+dedup work once and re-reads the shuffle files for each
  *    of the downstream consumers (LSH candidates, verify join, anti-join,
  *    stats) — the re-computation cost of skipping the cache is bounded
  *    by shuffle re-reads, not corpus re-scans.
  *  - [[curateWith]]: the library entry point for callers that will
  *    iterate on the curated corpus — persists the exact-keep stage at a
  *    caller-chosen storage level for the scope of the callback and ALWAYS
  *    unpersists before returning (CurationSpec asserts no dangling cache).
  */
object Curation {

  /** Language + quality floor over (doc_id, text, source): adds the shared
    * quality score `q` (TextFunctions.qualityScore — the same definition
    * q21 reports) and filters. */
  def qualityFilter(docs: DataFrame, stopwords: Seq[String],
                    qualityFloor: Double): DataFrame =
    docs.filter(col("source").isNotNull)
      .withColumn("q", T.qualityScore(col("text"), stopwords))
      .filter(col("q") >= qualityFloor)

  /** Exact dedup keeping the min-doc_id row per normalized content hash —
    * one `min_by` aggregation (single shuffle, no corpus-wide window
    * sort). */
  def exactKeep(scored: DataFrame): DataFrame =
    scored
      .groupBy(Dedup.contentHash(col("text")).as("_h"))
      .agg(min_by(
        struct(col("doc_id"), col("text"), col("source"), col("q")),
        col("doc_id")).as("_r"))
      .select(col("_r.doc_id").as("doc_id"), col("_r.text").as("text"),
        col("_r.source").as("source"), col("_r.q").as("q"))

  /** Near-dup removal: drop the higher id of every LSH-verified pair. */
  def dropNearDups(kept: DataFrame, shingleN: Int, numHashes: Int,
                   bands: Int, threshold: Double): DataFrame = {
    val pairs = Dedup.minhashLsh(kept, shingleN, numHashes, bands, threshold)
    val dropIds = pairs.select(col("doc_b").as("doc_id")).distinct()
    kept.join(broadcast(dropIds), Seq("doc_id"), "left_anti")
  }

  /** The full lazy pipeline: (doc_id, text, source) → curated corpus with
    * the quality score column `q`. No persist — see class doc. */
  def pipeline(docs: DataFrame, stopwords: Seq[String],
               qualityFloor: Double = 0.5, shingleN: Int = 3,
               numHashes: Int = 16, bands: Int = 4,
               jaccardThreshold: Double = 0.5): DataFrame =
    dropNearDups(
      exactKeep(qualityFilter(docs, stopwords, qualityFloor)),
      shingleN, numHashes, bands, jaccardThreshold)

  /** Loan-pattern curation for library use: the exact-keep stage — read by
    * every downstream stage and by whatever the caller does with the
    * curated corpus — is persisted for the scope of `use` and unpersisted
    * on ALL exits. The callback must materialize what it needs (count,
    * write, collect) before returning. */
  def curateWith[A](docs: DataFrame, stopwords: Seq[String],
                    qualityFloor: Double = 0.5, shingleN: Int = 3,
                    numHashes: Int = 16, bands: Int = 4,
                    jaccardThreshold: Double = 0.5,
                    level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
                   (use: DataFrame => A): A = {
    val kept = exactKeep(qualityFilter(docs, stopwords, qualityFloor))
      .persist(level)
    try use(dropNearDups(kept, shingleN, numHashes, bands, jaccardThreshold))
    finally kept.unpersist(blocking = false)
  }

  /** Per-source corpus stats of a curated corpus (the q40 reporting tail). */
  def sourceStats(curated: DataFrame): DataFrame =
    curated
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(T.tokenStats(col("text")).getField("ws_tokens"))
          .cast("long").as("total_tokens"),
        Portable.snap6(avg(col("q"))).as("avg_quality"))
      .orderBy("source")
}
