package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Temporal

/** Unit behavior of the time-series operators; cross-engine exactness is
  * covered by the TemporalPack oracles (q125/q126). */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val series = Seq(
    ("a", ts("2024-01-01 00:10:00"), 100L),
    ("a", ts("2024-01-01 00:20:00"), 50L),
    // a: hour 01 and 02 are gaps
    ("a", ts("2024-01-01 03:05:00"), 7L),
    ("b", ts("2024-01-01 02:00:00"), 9L)
  ).toDF("k", "t", "c")

  test("gapFill: grid covers the global range for every key, gaps carry last sum") {
    val out = Temporal.gapFill(series, "k", "t", col("c"), "hour")
      .select("k", "bucket", "n", "v_filled", "is_gap")
      .as[(String, Timestamp, Long, Long, Boolean)]
      .collect().sortBy(r => (r._1, r._2.getTime))

    // global range 00:00..03:00 -> 4 buckets per key, 2 keys
    assert(out.length === 8)
    val a = out.filter(_._1 == "a").map(r => (r._3, r._4, r._5)).toSeq
    assert(a === Seq((2L, 150L, false), (0L, 150L, true),
      (0L, 150L, true), (1L, 7L, false)))
    // key b: gaps BEFORE its first observation fill with 0
    val b = out.filter(_._1 == "b").map(r => (r._3, r._4, r._5)).toSeq
    assert(b === Seq((0L, 0L, true), (0L, 0L, true),
      (1L, 9L, false), (0L, 9L, true)))
  }

  test("slidingByTime: RANGE frame is inclusive and second-granular") {
    val ev = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1L),
      ("a", ts("2024-01-01 00:00:10"), 2L),
      ("a", ts("2024-01-01 00:00:10"), 4L), // peer second: shares the window
      ("a", ts("2024-01-01 00:00:31"), 8L)  // 31s after t0: t0 outside 30s
    ).toDF("k", "t", "c")
    val out = Temporal.slidingByTime(ev, "k", "t", col("c"), windowSec = 30L)
      .select("c", "w_n", "w_cents").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (1L, 1L, 1L),
      (2L, 3L, 7L),  // peers at :10 see each other regardless of row order
      (4L, 3L, 7L),
      (8L, 3L, 14L)) // 1 dropped (31 > 30), peers at :10 still in
    )
  }

  test("correlatedPairs: identical activity patterns score corr 1.0") {
    // users 1 and 2: same shape (2x scale). user 3: opposite-half
    // activity -> different SAX signature -> never compared (the
    // documented blocking tradeoff). n=4 days grid.
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-02 10:00:00"), 300L),
      (2L, ts("2024-01-01 11:00:00"), 200L),
      (2L, ts("2024-01-02 11:00:00"), 600L),
      (3L, ts("2024-01-03 10:00:00"), 500L),
      (3L, ts("2024-01-04 10:00:00"), 500L)
    ).toDF("user_id", "t", "c")
    val out = Temporal.correlatedPairs(ev, "user_id", "t", col("c"),
        segments = 2, k = 10)
      .select("ka", "kb", "corr").as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 2L, 1.0))) // the 2x-scaled ratio is exact here
  }

  test("correlatedPairs: plan is an equi-join on (signature, day), no cartesian") {
    val ev = Seq((1L, ts("2024-01-01 10:00:00"), 10L),
      (2L, ts("2024-01-02 10:00:00"), 20L)).toDF("user_id", "t", "c")
    val plan = Temporal.correlatedPairs(ev, "user_id", "t", col("c"), 2, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("gapFill: single observation yields a 1-bucket grid, no gaps") {
    val one = Seq(("x", ts("2024-02-02 10:30:00"), 5L)).toDF("k", "t", "c")
    val out = Temporal.gapFill(one, "k", "t", col("c"), "hour")
      .select("n", "v_filled", "is_gap").as[(Long, Long, Boolean)].collect()
    assert(out.toSeq === Seq((1L, 5L, false)))
  }

  test("trendFit: recovers an exact linear trend; degenerate key -> NULL") {
    // key a: y = 100 + 5x cents at hours 0..4 (x counted from the GLOBAL
    // min, which key a owns); key b: all events in one hour bucket.
    val ev = Seq(
      ("a", ts("2024-01-01 00:10:00"), 100L),
      ("a", ts("2024-01-01 01:10:00"), 105L),
      ("a", ts("2024-01-01 02:10:00"), 110L),
      ("a", ts("2024-01-01 03:10:00"), 115L),
      ("a", ts("2024-01-01 04:10:00"), 120L),
      ("b", ts("2024-01-01 02:20:00"), 9L),
      ("b", ts("2024-01-01 02:40:00"), 11L)
    ).toDF("k", "t", "c")
    val out = Temporal.trendFit(ev, "k", "t", col("c"))
      .orderBy("k").collect()
    val a = out(0)
    assert(a.getAs[Long]("n") === 5L)
    assert(a.getAs[Double]("slope") === 5.0)
    assert(a.getAs[Double]("intercept") === 100.0)
    val b = out(1)
    assert(b.isNullAt(b.fieldIndex("slope")) &&
      b.isNullAt(b.fieldIndex("intercept")))
  }
}
