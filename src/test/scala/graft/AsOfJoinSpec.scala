package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

/** Tie and edge semantics of the union-timeline as-of join. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(86400000L + m * 60000L)

  test("as-of picks the latest event at-or-before, ties by highest ord") {
    val events = Seq(
      (1L, ts(10), 100L, 1.0),
      (1L, ts(20), 200L, 2.0),
      (1L, ts(20), 201L, 2.5), // same ts: higher event_id must win
      (1L, ts(30), 300L, 3.0),
      (2L, ts(50), 500L, 5.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val probes = Seq(
      (1L, ts(20), "at-event"),      // event AT probe ts counts
      (1L, ts(25), "between"),
      (1L, ts(5), "before-any"),     // no prior event -> nulls
      (2L, ts(60), "other-key")
    ).toDF("user_id", "pts", "label")
    val out = AsOfJoin.asOf(probes, events, "user_id", "pts", "ts",
      "event_id", Seq("event_id", "value"))
      .select("label", "asof_event_id", "asof_value")
      .as[(String, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("at-event") === ((Some(201L), Some(2.5))))
    assert(out("between") === ((Some(201L), Some(2.5))))
    assert(out("before-any") === ((None, None)))
    assert(out("other-key") === ((Some(500L), Some(5.0))))
  }

  test("forward as-of picks the earliest event at-or-after") {
    val events = Seq(
      (1L, ts(10), 100L, 1.0),
      (1L, ts(20), 200L, 2.0),
      (1L, ts(20), 201L, 2.5)
    ).toDF("user_id", "ts", "event_id", "value")
    val probes = Seq(
      (1L, ts(20), "at"),    // event AT probe counts in both directions
      (1L, ts(15), "mid"),   // next event is ts(20)
      (1L, ts(25), "after-all")
    ).toDF("user_id", "pts", "label")
    val out = AsOfJoin.asOf(probes, events, "user_id", "pts", "ts",
      "event_id", Seq("event_id"), forward = true)
      .select("label", "asof_event_id")
      .as[(String, Option[Long])].collect().toMap
    assert(out("at") === Some(201L))
    assert(out("mid") === Some(201L))
    assert(out("after-all") === None)
  }

  test("tolerance nulls matches farther than the bound, in micros") {
    val events = Seq((1L, ts(10), 100L, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val probes = Seq(
      (1L, ts(11), "near"),  // 1 min = 60e6 micros away
      (1L, ts(30), "far")    // 20 min away
    ).toDF("user_id", "pts", "label")
    val out = AsOfJoin.asOf(probes, events, "user_id", "pts", "ts",
      "event_id", Seq("event_id"),
      tolerance = Some(5L * 60L * 1000000L)) // 5 minutes
      .select("label", "asof_event_id")
      .as[(String, Option[Long])].collect().toMap
    assert(out("near") === Some(100L))
    assert(out("far") === None)
  }

  test("probe pts column keeps its original type and values") {
    val events = Seq((1L, ts(1), 10L, 0.5))
      .toDF("user_id", "ts", "event_id", "value")
    val probes = Seq((1L, ts(7), "x")).toDF("user_id", "pts", "label")
    val out = AsOfJoin.asOf(probes, events, "user_id", "pts", "ts",
      "event_id", Seq("event_id"))
    assert(out.schema("pts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(out.select("pts").as[Timestamp].head() === ts(7))
  }

  test("fractional axes keep sub-integer ordering (no long truncation)") {
    // event at 1.9 is AFTER probe 1.5: a long-truncated axis would tie
    // them at 1 and wrongly match backward
    val events = Seq((1L, 1.9, 10L, 0.5), (1L, 1.0, 9L, 0.4))
      .toDF("user_id", "ts", "event_id", "value")
    val probes = Seq((1L, 1.5, "p")).toDF("user_id", "pts", "label")
    val out = AsOfJoin.asOf(probes, events, "user_id", "pts", "ts",
      "event_id", Seq("event_id"))
      .select("asof_event_id").as[Option[Long]].head()
    assert(out === Some(9L)) // only the 1.0 event precedes 1.5
  }

  test("every probe survives exactly once (left semantics)") {
    val events = Seq((1L, ts(1), 10L, 0.5)).toDF("user_id", "ts", "event_id", "value")
    val probes = (1 to 50).map(i => (1L, ts(i), i)).toDF("user_id", "pts", "pid")
    val out = AsOfJoin.asOf(probes, events, "user_id", "pts", "ts",
      "event_id", Seq("event_id"))
    assert(out.count() === 50)
    assert(out.select("pid").distinct().count() === 50)
  }
}
