package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._



/** Streaming exact deduplication — the online face of Dedup.exact for a
  * continuously-arriving corpus (crawl ingestion at 100 TB runs as a
  * stream, not a batch).
  *
  * `dropDuplicates` on the normalized content hash keeps the FIRST arrival
  * of each content and drops every later copy; the watermark bounds the
  * dedup state: content re-arriving later than the watermark horizon is
  * treated as new (the standard freshness/state-size trade — unbounded
  * exact streaming dedup would grow state with corpus size forever).
  */
object StreamingDedup {

  /** docs stream (doc_id, text, ts TIMESTAMP) → first-arrival survivors,
    * deduped on content within the watermark horizon. */
  def exactDedupStream(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", graft.operators.Dedup.contentHash(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicates("content_hash")
}
