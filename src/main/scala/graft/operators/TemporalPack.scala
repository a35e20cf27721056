package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.sources.Tables

/** Driver-contract queries for the time-series operators ([[Temporal]]).
  * All value arithmetic runs on integer cents (value snapped to 1e-2
  * fixed point) so windowed/filled sums are exact in both engines. */
object TemporalPack extends QueryPack {

  /** Trailing window width for q126 (seconds). */
  val SlideSec = 900L

  // Tables.events, not .table: the raw parquet ts is TIMESTAMP(NANOS),
  // which Spark surfaces as BIGINT; the helper truncates to the micros
  // TIMESTAMP DuckDB also sees.
  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)

  private def cents = round(col("value") * 100, 0).cast("long")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Hourly gap-filled metric series per event type: every hour of the
    // corpus's global time range appears for every type, with n=0 gap
    // rows carrying the previous hour's exact cents-sum forward. The hour
    // is emitted as a formatted string: both engines format the same
    // wall-clock value read from the parquet TIMESTAMP, sidestepping
    // epoch/timezone conversion differences.
    "q125_gap_fill" -> ((s, dir) => {
      Temporal.gapFill(events(s, dir), "event_type", "ts", cents, "hour")
        .select(col("event_type"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("n"), col("v_filled"), col("is_gap"))
        .orderBy("event_type", "hour")
    }),

    // Trailing 15-minute event-time window per event: per type, the
    // count and cents-sum of the type's events in the last 900 seconds
    // (RANGE frame over epoch seconds — peers in the same second share
    // the window). Output is the per-type audit summary: window extremes
    // prove the full per-row window computation ran.
    "q126_time_rolling" -> ((s, dir) => {
      Temporal.slidingByTime(events(s, dir), "event_type", "ts", cents, SlideSec)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          max("w_n").as("max_n"),
          max("w_cents").as("max_cents"),
          min("w_cents").as("min_cents"),
          sum("w_n").as("sum_n"))
        .orderBy("event_type")
    }),
  )

  def oracles: Map[String, String] = Map(

    "q125_gap_fill" ->
      """WITH b AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |agg AS (
        |  SELECT event_type, bucket, count(*) AS n, sum(c) AS v
        |  FROM b GROUP BY 1, 2),
        |grid AS (
        |  SELECT t.event_type, g.bucket
        |  FROM (SELECT DISTINCT event_type FROM b) t
        |  CROSS JOIN (
        |    SELECT unnest(generate_series(min(bucket), max(bucket),
        |                                  INTERVAL 1 HOUR)) AS bucket
        |    FROM b) g)
        |SELECT grid.event_type,
        |       strftime(grid.bucket, '%Y-%m-%d %H:%M:%S') AS hour,
        |       CAST(coalesce(agg.n, 0) AS BIGINT) AS n,
        |       CAST(coalesce(
        |         last_value(agg.v IGNORE NULLS) OVER (
        |           PARTITION BY grid.event_type ORDER BY grid.bucket),
        |         0) AS BIGINT) AS v_filled,
        |       coalesce(agg.n, 0) = 0 AS is_gap
        |FROM grid LEFT JOIN agg
        |  ON agg.event_type = grid.event_type AND agg.bucket = grid.bucket
        |ORDER BY grid.event_type, hour""".stripMargin,

    "q126_time_rolling" ->
      s"""WITH e AS (
         |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ep,
         |         CAST(round(value * 100) AS BIGINT) AS c
         |  FROM events),
         |w AS (
         |  SELECT event_type,
         |         count(*) OVER fr AS w_n,
         |         sum(c) OVER fr AS w_cents
         |  FROM e
         |  WINDOW fr AS (PARTITION BY event_type ORDER BY ep
         |                RANGE BETWEEN $SlideSec PRECEDING AND CURRENT ROW))
         |SELECT event_type, count(*) AS n, max(w_n) AS max_n,
         |       CAST(max(w_cents) AS BIGINT) AS max_cents,
         |       CAST(min(w_cents) AS BIGINT) AS min_cents,
         |       CAST(sum(w_n) AS BIGINT) AS sum_n
         |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
