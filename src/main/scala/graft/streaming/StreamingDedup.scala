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
    * deduped on content within the watermark horizon.
    *
    * `dropDuplicatesWithinWatermark`, not `dropDuplicates`: the plain
    * variant only evicts state when the event-time column is PART of the
    * dedup key, so keying on content_hash alone would grow state without
    * bound and the documented eviction semantics would be a lie. The
    * WithinWatermark variant evicts each seen hash once it is older than
    * the watermark horizon — state is bounded by the horizon's arrival
    * volume, and content re-arriving after eviction is treated as new. */
  def exactDedupStream(docs: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", graft.operators.Dedup.contentHash(col("text")))
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
}
