package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{Heartbeat, Silence, StreamingHeartbeat}

/** Event-time timeout semantics of the silence detector: gaps are clocked
  * by the WATERMARK, so detection is deterministic under replay. */
class StreamingHeartbeatSpec extends SparkSpec {
  import spark.implicits._

  private def hb(k: Long, tMs: Long) = Heartbeat(k, new Timestamp(tMs))

  test("silence fires when the watermark passes last_ts + gap, and key re-arms") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Heartbeat]
    val beats = in.toDS().withWatermark("ts", "2 seconds")
    val q = StreamingHeartbeat.silences(beats, gapMs = 10_000L)
      .writeStream.format("memory").queryName("silences")
      .outputMode("append").start()
    try {
      // both keys beat at t=1s
      in.addData(hb(1, 1000), hb(1, 500), hb(2, 1000))
      q.processAllAvailable()
      // key 2 keeps beating; the watermark advances to 60s-2s=58s, which
      // passes key 1's 11s timeout (processAllAvailable drains the
      // follow-up no-data batch that executes pending timeouts)
      in.addData(hb(2, 60_000))
      q.processAllAvailable()
      in.addData(hb(2, 61_000))
      q.processAllAvailable()

      val out = spark.table("silences").as[Silence].collect().toSeq
      // key 1: watermark-fired timeout (both batch-1 beats counted).
      // key 2: its own 1s -> 60s gap is ALSO a silence, reported
      // retroactively the moment the 60s beat arrived.
      assert(out.filter(_.key == 1L)
        .map(s => (s.last_ts.getTime, s.n_beats)) === Seq((1000L, 2L)))
      assert(out.filter(_.key == 2L)
        .map(s => (s.last_ts.getTime, s.n_beats)) === Seq((1000L, 1L)))

      // key 1 resumes: state was removed, so the counter restarts and a
      // second silence is detectable
      in.addData(hb(1, 70_000))
      q.processAllAvailable()
      in.addData(hb(2, 200_000))
      q.processAllAvailable()
      in.addData(hb(2, 201_000))
      q.processAllAvailable()
      val again = spark.table("silences").as[Silence].collect()
        .filter(_.key == 1L).map(s => (s.last_ts.getTime, s.n_beats)).toSeq
      assert(again === Seq((1000L, 2L), (70_000L, 1L)))
    } finally q.stop()
  }

  test("a gap whose resume lands in the same batch is reported retroactively") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Heartbeat]
    val beats = in.toDS().withWatermark("ts", "1 second")
    val q = StreamingHeartbeat.silences(beats, gapMs = 10_000L)
      .writeStream.format("memory").queryName("retro")
      .outputMode("append").start()
    try {
      // both the beat, the silence-sized gap, and the resume arrive in
      // ONE batch: a timeout-only detector would never fire
      in.addData(hb(5, 1000), hb(5, 50_000), hb(5, 51_000))
      q.processAllAvailable()
      val out = spark.table("retro").as[Silence].collect().toSeq
      assert(out.map(s => (s.key, s.last_ts.getTime, s.n_beats)) ===
        Seq((5L, 1000L, 1L)))
    } finally q.stop()
  }

  test("a key that never stops beating never reports silence") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Heartbeat]
    val beats = in.toDS().withWatermark("ts", "1 second")
    val q = StreamingHeartbeat.silences(beats, gapMs = 30_000L)
      .writeStream.format("memory").queryName("steady")
      .outputMode("append").start()
    try {
      (0 to 5).foreach { i =>
        in.addData(hb(9, i * 20_000L)) // 20s cadence < 30s gap
        q.processAllAvailable()
      }
      assert(spark.table("steady").isEmpty)
    } finally q.stop()
  }
}
