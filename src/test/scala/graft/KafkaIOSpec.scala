package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.streaming.{KafkaIO, ServingStore}

/** Analyzer-level coverage of the Kafka edges (SURVEY.md §2.1 S8/S9).
  *
  * The `spark-sql-kafka-0-10` connector jar does not exist in this
  * container or its offline dependency cache, so the live source/sink
  * cannot execute here. These tests pin everything the jar does NOT own:
  * the wire→record projection against the connector's exact output schema,
  * the record→wire encoding, the public option spellings, the end-to-end
  * serve chain on a wire-schema twin stream, and the precise analyzer
  * error proving absence of the connector is the ONLY missing piece. */
class KafkaIOSpec extends SparkSpec {
  import spark.implicits._

  /** One wire-schema row as the connector would emit it. */
  private def wireRow(value: String, partition: Int, offset: Long): Row =
    Row("k".getBytes(UTF_8), value.getBytes(UTF_8), "models", partition,
      offset, new Timestamp(1700000000000L), 0)

  test("projectRecords: wire schema → (value STRING, offset LONG, partition INT)") {
    val raw = spark.createDataFrame(
      java.util.List.of(wireRow("7,U,0.5;0.25", 0, 42L)), KafkaIO.wireSchema)
    val rec = KafkaIO.projectRecords(raw)
    assert(rec.schema.map(f => (f.name, f.dataType)) ===
      Seq(("value", StringType), ("offset", LongType),
        ("partition", IntegerType)))
    val r = rec.collect().head
    assert(r.getString(0) === "7,U,0.5;0.25")
    assert(r.getLong(1) === 42L)
    assert(r.getInt(2) === 0)
  }

  test("option spellings match the connector's public contract") {
    assert(KafkaIO.sourceOptions("b:9092", "models", "earliest") === Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "subscribe" -> "models",
      "startingOffsets" -> "earliest"))
    assert(KafkaIO.sinkOptions("b:9092", "models", "/tmp/ck") === Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "topic" -> "models",
      "checkpointLocation" -> "/tmp/ck"))
  }

  test("encodeForSink: single value STRING column from record rows") {
    val out = KafkaIO.encodeForSink(Seq("1,U,0.5").toDF("record"))
    assert(out.schema.map(f => (f.name, f.dataType)) ===
      Seq(("value", StringType)))
    assert(out.collect().head.getString(0) === "1,U,0.5")
  }

  test("serve chain runs end-to-end on a wire-schema twin stream") {
    // the connector-independent tail of serveFromKafka, driven by a
    // MemoryStream carrying the SAME projected record shape, offsets used
    // as per-key seq: replay of an older offset must lose
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long,
      Timestamp, Int)]
    val raw = in.toDF().toDF("key", "value", "topic", "partition", "offset",
      "timestamp", "timestampType")
    assert(raw.isStreaming)
    val store = ServingStore.factorStore()
    val dir = java.nio.file.Files.createTempDirectory("kafka-twin").toString
    val q = KafkaIO.serveFromLines(spark, KafkaIO.projectRecords(raw),
      store, dir)
    try {
      def rec(s: String, off: Long) = ("k".getBytes(UTF_8), s.getBytes(UTF_8),
        "models", 0, off, new Timestamp(1700000000000L), 0)
      in.addData(rec("7,U,0.5;0.25", 10L))
      q.processAllAvailable()
      assert(store.get("7-U").get.toSeq === Seq(0.5, 0.25))
      // an older offset (at-least-once replay) must not clobber newer state
      in.addData(rec("7,U,0.9;0.9", 5L))
      q.processAllAvailable()
      assert(store.get("7-U").get.toSeq === Seq(0.5, 0.25))
    } finally q.stop()
  }

  test("live source fails ONLY for the missing connector artifact") {
    val e = intercept[Throwable] {
      KafkaIO.readRecords(spark, "localhost:9092", "models")
    }
    val msg = Option(e.getMessage).getOrElse("") + e.getClass.getName
    assert(msg.toLowerCase.contains("kafka"),
      s"expected the missing-connector analyzer error, got: $e")
  }
}
