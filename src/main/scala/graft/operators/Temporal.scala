package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series completion and event-time sliding aggregates.
  *
  * The reference's only notion of time is Kafka ingestion order
  * (als-ms/src/main/java/de/tub/cs/bdapro/als/ms/ALSKafkaProducer.java:29
  * attaches timestamps nobody consumes); a serving/analytics engine needs
  * real event-time operators: filling a metric series onto a regular grid
  * (dashboards, drift monitors over training-data ingestion) and trailing
  * time-window aggregates (rate limits, freshness SLOs).
  *
  * Scale shape: both operators shuffle once on the series key. The grid in
  * [[gapFill]] is built from a 1-row global bounds aggregate cross-joined
  * with the distinct key set — the explode produces |keys| × |buckets|
  * rows, which is the OUTPUT size, not an intermediate blow-up. The
  * forward-fill window partitions by key, so parallelism is the key
  * cardinality; a single series spanning years at second granularity would
  * serialize — pick the bucket unit so |buckets| stays ~1e6 per key.
  */
object Temporal {

  /** Aggregate `centsCol` (an exact fixed-point long) onto a `unit`
    * (e.g. "hour") grid per `keyCol`, one row per (key, bucket) over the
    * GLOBAL [min, max] bucket range, forward-filling each key's last
    * observed bucket sum across its gaps. Emits
    * (key, bucket, n, v_filled, is_gap); `n` is 0 on gap rows and
    * `v_filled` carries the previous bucket's sum (0 before the first
    * observation). Integer sums keep the fill value exact regardless of
    * partitioning or accumulation order. */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String,
              centsCol: Column, unit: String): DataFrame = {
    val b = events.select(col(keyCol), date_trunc(unit, col(tsCol)).as("bucket"),
      centsCol.cast("long").as("_c"))
    val agg = b.groupBy(keyCol, "bucket")
      .agg(count(lit(1)).as("n"), sum("_c").as("_v"))
    val bounds = b.agg(min("bucket").as("_b0"), max("bucket").as("_b1"))
    val grid = b.select(keyCol).distinct().crossJoin(bounds)
      .select(col(keyCol),
        explode(sequence(col("_b0"), col("_b1"), expr(s"interval 1 $unit")))
          .as("bucket"))
    val w = Window.partitionBy(keyCol).orderBy("bucket")
    grid.join(agg, Seq(keyCol, "bucket"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("v_filled",
        coalesce(last(col("_v"), ignoreNulls = true).over(w), lit(0L)))
      .withColumn("is_gap", col("n") === 0L)
      .drop("_v")
  }

  /** Trailing event-time window per row: for every event, the count and
    * exact cents-sum of all events of the same `keyCol` within the last
    * `windowSec` seconds (inclusive of the current second's peers — a
    * RANGE frame, so rows sharing a truncated second see the identical
    * window in any engine). One shuffle on the key; frames are evaluated
    * per key partition. */
  def slidingByTime(events: DataFrame, keyCol: String, tsCol: String,
                    centsCol: Column, windowSec: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("_ep"))
      .rangeBetween(-windowSec, 0)
    events
      .withColumn("_ep", unix_timestamp(col(tsCol)))
      .withColumn("_c", centsCol.cast("long"))
      .withColumn("w_n", count(lit(1)).over(w))
      .withColumn("w_cents", sum(col("_c")).over(w))
      .drop("_c")
  }
}
