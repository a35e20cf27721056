package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{ModelConsumer, ServingStore}

/** Fault-tolerance envelope of the serve loop (SURVEY.md §2.9): state
  * backend selection (reference: ALSKafkaConsumer.java:54-65 memory/fs/
  * rocksdb flag) and restart-with-checkpoint recovery (reference:
  * checkpoint every 60s + fixed-delay restart, ALSKafkaConsumer.java:44-51).
  */
class StateBackendSpec extends SparkSpec {
  import spark.implicits._

  private def rec(id: Long, kind: String, fs: Double*): String =
    s"$id,$kind,${fs.map(f => f"$f%.6f").mkString(";")}"

  test("consumer state survives under the RocksDB state store provider") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[String]
      val store = ServingStore.factorStore()
      val q = ModelConsumer.serveTo(spark, in.toDF(), store)
      try {
        in.addData(rec(1, "U", 0.1), rec(2, "U", 0.2))
        q.processAllAvailable()
        in.addData(rec(1, "U", 0.9))
        q.processAllAvailable()
        assert(store.get("1-U").get.toSeq === Seq(0.9))
        assert(store.size === 2)
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("restart from checkpoint preserves latest-per-key state") {
    val ckpt = Files.createTempDirectory("ckpt").toFile.getAbsolutePath
    val dir = Files.createTempDirectory("recov").toFile.getAbsolutePath
    val store = ServingStore.factorStore()

    // first incarnation: ingest one file, then "fail" (stop)
    val q1 = ModelConsumer.serveTo(spark,
      graft.sources.Tables.textStream(spark, dir), store, Some(ckpt))
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.txt"),
      rec(1, "U", 0.1) + "\n" + rec(2, "U", 0.2) + "\n")
    q1.processAllAvailable()
    q1.stop()
    assert(store.get("1-U").get.toSeq === Seq(0.1))

    // second incarnation, same checkpoint: only the new file is replayed,
    // and state carried in the checkpoint still wins on stale seq
    Files.writeString(java.nio.file.Paths.get(s"$dir/b.txt"),
      rec(1, "U", 0.7) + "\n" + rec(3, "I", 0.3) + "\n")
    val q2 = ModelConsumer.serveTo(spark,
      graft.sources.Tables.textStream(spark, dir), store, Some(ckpt))
    try {
      q2.processAllAvailable()
      assert(store.get("1-U").get.toSeq === Seq(0.7))
      assert(store.get("2-U").get.toSeq === Seq(0.2))
      assert(store.get("3-I").get.toSeq === Seq(0.3))
    } finally q2.stop()
  }
}
