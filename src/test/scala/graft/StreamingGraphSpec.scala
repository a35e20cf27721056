package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.{StreamingFunnel, StreamingTransitions, TransitionEvent}

/** Streaming/batch parity of the q103 transition miner: the stateful
  * stream (one LastEvent per user, pairs chained ACROSS micro-batches)
  * must reproduce the batch lag-window pair multiset exactly. */
class StreamingGraphSpec extends SparkSpec {
  import spark.implicits._

  private def ev(u: Long, t: Long, id: Long, typ: String) =
    TransitionEvent(u, new Timestamp(t), id, typ)

  test("stateful stream reproduces the batch lag transitions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // two users, interleaved; batch boundary cuts BOTH users mid-sequence,
    // so cross-batch chaining through state is actually exercised
    val batch1 = Seq(ev(1, 10, 1, "view"), ev(1, 20, 2, "click"),
      ev(2, 15, 3, "view"))
    val batch2 = Seq(ev(1, 30, 4, "purchase"),
      ev(2, 25, 5, "click"), ev(2, 35, 6, "error"))
    val in = MemoryStream[TransitionEvent]
    val q = StreamingTransitions.transitions(in.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode("append").start()
    try {
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      val streamed = spark.table("trans")
        .as[(Long, String, String)].collect().sorted.toSeq

      val all = (batch1 ++ batch2).toDS()
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val batch = all.withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("user_id"), col("prev"), col("event_type"))
        .as[(Long, String, String)].collect().sorted.toSeq

      assert(streamed === batch)
      assert(streamed.size === 4) // 2 transitions per user
    } finally q.stop()
  }

  test("streaming funnel advances across micro-batches and matches batch stage logic") {
    implicit val sqlCtx = spark.sqlContext
    // user 1 completes the funnel but the click+purchase arrive in batch 2;
    // user 2's purchase PRECEDES its click, so it must stall at stage 2;
    // user 3 has a click before any view — ignored, stage ends at 1
    val batch1 = Seq(ev(1, 10, 1, "view"),
      ev(2, 10, 2, "view"), ev(2, 30, 3, "purchase"),
      ev(3, 5, 4, "click"))
    val batch2 = Seq(ev(1, 20, 5, "click"), ev(1, 30, 6, "purchase"),
      ev(2, 40, 7, "click"),
      ev(3, 10, 8, "view"))
    val in = MemoryStream[TransitionEvent]
    val q = StreamingFunnel.progress(in.toDS())
      .writeStream.format("memory").queryName("funnel")
      .outputMode("update").start()
    try {
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      // latest emission per user wins (update semantics)
      val stages = spark.table("funnel")
        .groupBy("user_id").agg(max("stage").as("stage"))
        .as[(Long, Int)].collect().toMap
      assert(stages === Map(1L -> 3, 2L -> 2, 3L -> 1))
    } finally q.stop()
  }

  test("single-event users emit nothing; state carries them to the next batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TransitionEvent]
    val q = StreamingTransitions.transitions(in.toDS())
      .writeStream.format("memory").queryName("trans1")
      .outputMode("append").start()
    try {
      in.addData(Seq(ev(9, 10, 1, "signup"))); q.processAllAvailable()
      assert(spark.table("trans1").count() === 0)
      in.addData(Seq(ev(9, 20, 2, "view"))); q.processAllAvailable()
      val got = spark.table("trans1").as[(Long, String, String)].collect().toSeq
      assert(got === Seq((9L, "signup", "view")))
    } finally q.stop()
  }
}
