package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{StreamJoin, TransitionEvent}

/** Stream/batch parity of the watermarked stream-stream interval join:
  * the native join must reproduce the batch equi-join + time-range
  * result, including matches whose two sides arrive in DIFFERENT
  * micro-batches (the case that exercises both join-state buffers). */
class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ev(u: Long, sec: Long, id: Long, typ: String) =
    TransitionEvent(u, new Timestamp(sec * 1000L), id, typ)

  test("stream-stream interval join matches the batch join across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val windowSec = 60L
    // user 1: purchase in-window (cross-batch), purchase out-of-window;
    // user 2: purchase BEFORE its view (no match both directions);
    // user 3: two views sharing one purchase (both match)
    val views = Seq(ev(1, 100, 1, "view"), ev(2, 300, 2, "view"),
      ev(3, 500, 3, "view"), ev(3, 530, 4, "view"))
    val purchases1 = Seq(ev(2, 250, 10, "purchase"))
    val purchases2 = Seq(ev(1, 130, 11, "purchase"),
      ev(1, 200, 12, "purchase"), ev(3, 540, 13, "purchase"))
    val vIn = MemoryStream[TransitionEvent]
    val pIn = MemoryStream[TransitionEvent]
    // delay must cover the fixture's cross-batch disorder: purchase 11
    // (t=130) arrives a batch after the purchase watermark reached 250,
    // so a 0s delay would drop it as late — 500 s keeps it on time while
    // the t=10000 flush events still push both watermarks past every match
    val joined = StreamJoin.attributionJoin(
      vIn.toDF(), pIn.toDF(), windowSec, watermarkDelay = "500 seconds")
    val q = joined.writeStream.format("memory").queryName("sjoin")
      .outputMode("append").start()
    try {
      vIn.addData(views); pIn.addData(purchases1)
      q.processAllAvailable()
      pIn.addData(purchases2)
      q.processAllAvailable()
      // advance both watermarks far enough to flush every buffered match
      vIn.addData(ev(9, 10000, 98, "view"))
      pIn.addData(ev(9, 10000, 99, "purchase"))
      q.processAllAvailable()
      val streamed = spark.table("sjoin")
        .select("view_id", "purchase_id").as[(Long, Long)]
        .collect().sorted.toSeq

      val vb = (views :+ ev(9, 10000, 98, "view")).toDF()
        .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("v_ts"))
      val pb = (purchases1 ++ purchases2 :+ ev(9, 10000, 99, "purchase")).toDF()
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
          col("ts").as("p_ts"))
      val batch = vb.join(pb,
          col("user_id") === col("p_user") &&
            col("p_ts") >= col("v_ts") &&
            col("p_ts") < col("v_ts") + expr(s"INTERVAL $windowSec SECONDS"))
        .select("view_id", "purchase_id").as[(Long, Long)]
        .collect().sorted.toSeq

      assert(streamed === batch)
      // the semantics the fixture encodes: u1 one in-window match,
      // u2 none, u3 both views match the shared purchase
      assert(streamed.contains((1L, 11L)) && !streamed.contains((1L, 12L)))
      assert(!streamed.exists(_._1 == 2L))
      assert(streamed.count(_._2 == 13L) === 2)
    } finally q.stop()
  }
}
