package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.CorpusOps

/** Snapshot merge on a STREAM: the new crawl arrives incrementally, the
  * previous snapshot is static. Each micro-batch is merged against the old
  * snapshot with the same [[CorpusOps.upsertSnapshot]] the batch path
  * uses, emitting insert/update/carry rows for the keys that ARRIVED —
  * `retire` is undecidable mid-stream (absence so far is not absence), so
  * it is computed at close by [[retires]] over the set of keys the ledger
  * saw. StreamingLifecycleSpec proves ledger ∪ retires equals the batch
  * merge exactly.
  *
  * Scale shape: per micro-batch one hash-equi join against the old
  * snapshot's (key, md5) projection — bodies never join; the old side is
  * a static DataFrame Spark re-plans per batch with AQE (broadcast while
  * small, shuffle when not). */
object StreamingMerge {

  /** Start the per-batch merge, handing each batch's partial ledger
    * (insert/update/carry rows only) to `sink`. */
  def ledgerQuery(old: DataFrame, stream: DataFrame,
                  keyCol: String, contentCol: String)
                 (sink: DataFrame => Unit): StreamingQuery =
    stream.writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(CorpusOps.upsertSnapshot(old, batch, keyCol, contentCol)
          .filter(col("action") =!= "retire"))
      }.start()

  /** End-of-stream retires: old keys the ledger never saw, in the same
    * (key, action, content_hash) shape as the ledger rows. */
  def retires(old: DataFrame, seenKeys: DataFrame,
              keyCol: String, contentCol: String): DataFrame =
    old.join(seenKeys.select(col(keyCol)), Seq(keyCol), "left_anti")
      .select(col(keyCol), lit("retire").as("action"),
        md5(col(contentCol)).as("content_hash"))
}
