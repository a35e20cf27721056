package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingMerge

/** Streaming/batch parity of the snapshot merge: an incrementally-arriving
  * new snapshot, merged per micro-batch against the static old one, must
  * end at exactly the batch upsertSnapshot ledger once close-time retires
  * are added. */
class StreamingLifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("per-batch merge + close-time retires equals the batch merge ledger") {
    implicit val sqlCtx = spark.sqlContext
    val old = Seq((1L, "same"), (2L, "before"), (4L, "gone")).toDF("id", "body")
    val newDocs = Seq((1L, "same"), (2L, "after"), (3L, "fresh"))

    val in = MemoryStream[(Long, String)]
    val ledger = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    val q = StreamingMerge.ledgerQuery(old, in.toDF().toDF("id", "body"),
      "id", "body") { part =>
      ledger ++= part.as[(Long, String, String)].collect()
    }
    try {
      // the new snapshot arrives in two batches, cut mid-corpus
      in.addData(newDocs.take(1)); q.processAllAvailable()
      in.addData(newDocs.drop(1)); q.processAllAvailable()
    } finally q.stop()

    val seen = ledger.map(_._1).toSeq.toDF("id")
    val retires = StreamingMerge.retires(old, seen, "id", "body")
      .as[(Long, String, String)].collect()
    val streamed = (ledger ++ retires).sortBy(_._1).toSeq

    val batch = graft.operators.CorpusOps
      .upsertSnapshot(old, newDocs.toDF("id", "body"), "id", "body")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(streamed === batch)
    assert(streamed.map(_._2).count(_ == "retire") === 1)
  }
}
