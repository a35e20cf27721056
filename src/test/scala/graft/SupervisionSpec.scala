package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Supervision

/** The reference's fixed-delay restart strategy
  * (ALSKafkaConsumer.java:48-51, 3 attempts / 10 s): a poisoned micro-batch
  * kills the query, the supervisor restarts it from the same checkpoint,
  * the failed batch replays, and delivery resumes — state intact because
  * offsets only commit after a successful batch. */
class SupervisionSpec extends SparkSpec {
  import spark.implicits._

  private def awaitTrue(what: String, timeoutMs: Long = 30000)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(cond, s"timed out waiting for: $what")
  }

  test("a poisoned query restarts from checkpoint once and delivery resumes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Int]
    val ckpt = Files.createTempDirectory("sup-ckpt").toFile.getAbsolutePath
    val processed = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val poisonArmed = new AtomicBoolean(true)

    def factory() = input.toDF().as[Int].writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: Dataset[Int], _: Long) =>
        val vals = df.collect()
        // fail exactly once, BEFORE any side effect — the uncommitted
        // batch must replay wholesale after the restart
        if (vals.contains(666) && poisonArmed.getAndSet(false))
          throw new RuntimeException("poison record")
        vals.foreach(v => processed.add(v))
      }.start()

    val h = Supervision.supervise("spec", maxRetries = 3, delayMs = 250)(factory)
    try {
      input.addData(1, 2)
      awaitTrue("pre-poison batch")(processed.contains(1) && processed.contains(2))
      assert(h.restarts === 0)

      input.addData(666, 5)
      awaitTrue("poisoned batch replayed after restart")(
        processed.contains(666) && processed.contains(5))
      assert(h.restarts === 1, "exactly one retry consumed")

      input.addData(7)
      awaitTrue("delivery continues after restart")(processed.contains(7))
      assert(h.lastFailure.isEmpty)
    } finally {
      h.stop()
      assert(h.awaitStopped(15000), "supervisor loop should exit on stop()")
    }
  }

  test("the retry budget is total: a permanently failing query surfaces its failure") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Int]
    val ckpt = Files.createTempDirectory("sup-doom").toFile.getAbsolutePath
    def factory() = input.toDF().as[Int].writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (_: Dataset[Int], _: Long) =>
        throw new RuntimeException("always fails")
      }.start()

    val h = Supervision.supervise("doom", maxRetries = 2, delayMs = 100)(factory)
    input.addData(1)
    assert(h.awaitStopped(60000), "supervisor should exhaust its budget and exit")
    assert(h.lastFailure.exists(_.getMessage.contains("always fails")))
  }
}
