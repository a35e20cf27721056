package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Kafka edges of the serve loop (SURVEY.md §2.1 S8/S9).
  *
  * Reference: ALSKafkaConsumer.java:67-70 consumes a topic as a string
  * stream; ALSKafkaProducer.java:29-37 / SGD.java:73-81 publish with
  * `setFlushOnCheckpoint(true)` — at-least-once. Spark's Kafka source/sink
  * give the same guarantee (at-least-once on the sink; exactly-once
  * downstream via the ServingStore's idempotent upsert).
  *
  * NOTE: requires the `spark-sql-kafka-0-10` connector on the classpath;
  * this container ships without it, so these builders are compile-covered
  * but exercised only through their MemoryStream twins
  * (StreamingServeSpec) — the consumer/updater take any lines DataFrame,
  * so the wiring is identical either way.
  */
object KafkaIO {

  /** S8: subscribe to a topic as (value STRING, offset LONG, partition
    * INT).
    *
    * ORDERING CONTRACT: the offset is monotonic only WITHIN a partition, so
    * using it as the per-key seq (ModelConsumer.parse(seqCol)) is correct
    * only when the producer keys records by state key — every record of a
    * key then lands in one partition (the standard layout for a compacted
    * model topic, and the same per-partition-FIFO guarantee the reference
    * consumer relies on). With an unkeyed producer a key's records span
    * partitions with incomparable offsets — pass seqCol=None and accept
    * batch-order semantics instead. */
  def readRecords(spark: SparkSession, bootstrap: String, topic: String,
                  startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(col("value").cast("string").as("value"),
        col("offset").cast("long").as("offset"),
        col("partition").cast("int").as("partition"))

  /** S9: publish encoded records to a topic, at-least-once, checkpointed —
    * the Spark face of writeToKafkaWithTimestamps + flush-on-checkpoint. */
  def writeRecords(records: DataFrame, bootstrap: String, topic: String,
                   checkpointDir: String): StreamingQuery =
    records.select(col("record").cast("string").as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
      .start()

  /** End-to-end serve wiring: topic → latest-per-key state → store.
    * The Kafka offset is the seq, so replayed batches upsert idempotently. */
  def serveFromKafka(spark: SparkSession, bootstrap: String, topic: String,
                     store: ServingStore.FactorStore,
                     checkpointDir: String): StreamingQuery = {
    val lines = readRecords(spark, bootstrap, topic)
    val keyed = ModelConsumer.latestPerKey(spark,
      ModelConsumer.parse(lines, seqCol = Some("offset")))
    keyed.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[ModelConsumer.KeyedRecord], _: Long) =>
        ServingStore.upsertBatch(store, batch.toDF())
      }
      .start()
  }
}
