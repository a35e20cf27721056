package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream time-interval join: views matched to same-user purchases
  * that land inside the view's attribution window — the streaming twin of
  * the q160 batch interval join, and the one join shape where Structured
  * Streaming must buffer BOTH sides in state.
  *
  * Uses Spark's native watermarked stream-stream inner join, not a custom
  * stateful operator: with a watermark on each side AND a time-range
  * predicate between the two event times, the state store evicts a
  * buffered view once `view_ts + window + delay` passes the purchase-side
  * watermark (and symmetrically), so state stays bounded by the rate ×
  * (window + delay) — the property a hand-rolled mapGroupsWithState join
  * would have to re-derive. Output is append-mode (each matched pair
  * exactly once, emitted when the watermark proves no earlier match can
  * arrive).
  *
  * Scale shape: the join keys hash-partition both streams by user, state
  * is per-partition RocksDB-backed; at 1000 executors this is the same
  * shuffle as the batch equi-join plus eviction bookkeeping.
  */
object StreamJoin {

  /** views/purchases: streaming frames with (event_id, user_id,
    * ts TIMESTAMP). Emits (view_id, user_id, v_ts, purchase_id, p_ts)
    * for purchases in [v_ts, v_ts + windowSec). */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
                      windowSec: Long,
                      watermarkDelay: String = "10 minutes"): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("v_ts"))
      .withWatermark("v_ts", watermarkDelay)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    v.join(p,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") < col("v_ts") + expr(s"INTERVAL $windowSec SECONDS"))
      .select(col("view_id"), col("user_id"), col("v_ts"),
        col("purchase_id"), col("p_ts"))
  }
}
