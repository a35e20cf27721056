package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermark (SURVEY.md §2.9): the
  * streaming twin of q12's per-hour rollup must agree with the batch
  * computation over the same events, and the watermark must drop
  * too-late rows. */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(3600_000L * 24 + minute * 60_000L)

  test("stream-stream interval join attributes clicks to impressions within the window") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    // both sides watermarked; the interval condition bounds join state on
    // each side, so neither buffer grows without limit — the
    // stream-stream shape Spark requires for state cleanup
    val i = imps.toDF().toDF("its", "ad_id").withWatermark("its", "1 hour")
    val c = clicks.toDF().toDF("cts", "ad_id").withWatermark("cts", "1 hour")
    val joined = i.join(c,
      i("ad_id") === c("ad_id") &&
        col("cts") >= col("its") && col("cts") <= col("its") + expr("interval 10 minutes"))
      .select(i("ad_id").as("ad_id"), col("its"), col("cts"))
    val q = joined.writeStream.format("memory").queryName("attrib").start()
    try {
      imps.addData((ts(0), 1L), (ts(0), 2L), (ts(30), 3L))
      clicks.addData(
        (ts(5), 1L),   // within 10 min of ad 1 -> match
        (ts(20), 2L),  // 20 min after ad 2 -> outside window
        (ts(32), 3L),  // within -> match
        (ts(2), 9L))   // no impression for ad 9
      q.processAllAvailable()
      val got = spark.table("attrib").select("ad_id")
        .as[Long].collect().sorted.toSeq
      assert(got === Seq(1L, 3L))
    } finally q.stop()
  }

  test("streaming hourly windows equal the batch rollup") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val windowed = in.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
    val q = windowed.writeStream
      .format("memory").queryName("hourly").outputMode("complete").start()
    try {
      val events = Seq(
        (ts(5), "click", 1.5), (ts(20), "click", 2.5), (ts(30), "view", 1.0),
        (ts(65), "click", 4.0), (ts(100), "view", 0.5))
      in.addData(events)
      q.processAllAvailable()
      val streamed = spark.table("hourly")
        .select(col("w.start").as("ws"), col("event_type"), col("n"), col("total_value"))
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val batch = events.toDF("ts", "event_type", "value")
        .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming session windows split on the 30-minute gap like q37") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    val sessions = in.toDF().toDF("ts", "user_id", "value")
      .withWatermark("ts", "4 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
    val q = sessions.writeStream
      .format("memory").queryName("sessions").outputMode("complete").start()
    try {
      // user 1: events at 0,10,25 min (one session), then 90 min (new one)
      in.addData((ts(0), 1L, 1.0), (ts(10), 1L, 1.0), (ts(25), 1L, 1.0),
        (ts(90), 1L, 5.0))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select(col("user_id"), col("n_events"), col("session_value"))
        .as[(Long, Long, Double)].collect().sortBy(_._2)
      assert(rows.length === 2)
      assert(rows(0) === ((1L, 1L, 5.0)))
      assert(rows(1) === ((1L, 3L, 3.0)))
    } finally q.stop()
  }

  test("watermark in append mode drops rows later than the threshold") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val windowed = in.toDF().toDF("ts", "value")
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(sum(col("value")).as("total"))
    val q = windowed.writeStream
      .format("memory").queryName("late").outputMode("append").start()
    try {
      in.addData((ts(10), 1.0), (ts(50), 2.0))
      q.processAllAvailable()
      // advance the watermark far past hour 0 → hour-0 window finalizes
      in.addData((ts(300), 1.0))
      q.processAllAvailable()
      // this event is hours behind the watermark: must be dropped
      in.addData((ts(15), 100.0))
      q.processAllAvailable()
      in.addData((ts(400), 1.0))
      q.processAllAvailable()
      val hour0 = spark.table("late")
        .filter(col("window.start") === ts(0))
        .select("total").as[Double].collect()
      assert(hour0.toSeq === Seq(3.0), "late row must not re-open the window")
    } finally q.stop()
  }
}
