package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.PreferenceStream

/** Batch≡stream parity for the preference-pair layer: after all arrivals
  * are processed — in any batch split — the latest emitted pair per
  * (source, lang) equals the batch q195 aggregation over the same rows,
  * and intermediate emissions only ever appear when the pair changed. */
class StreamingPreferenceSpec extends SparkSpec {
  import spark.implicits._

  private val arrivals = Seq(
    // group (s1, en): best 0.9/id 11, worst 0.2/id 13 — arrives scattered
    ("s1", "en", 10L, 0.5), ("s1", "en", 11L, 0.9), ("s1", "en", 13L, 0.2),
    // tie on quality: chosen must take the SMALLER id (21), rejected the
    // smaller id among the minima (23 vs 24 -> 23)
    ("s2", "en", 22L, 0.7), ("s2", "en", 21L, 0.7),
    ("s2", "en", 23L, 0.1), ("s2", "en", 24L, 0.1),
    // single-doc group: never valid, never emitted
    ("s3", "de", 30L, 0.4),
    // zero-margin group: never valid
    ("s4", "fr", 40L, 0.6), ("s4", "fr", 41L, 0.6))

  // the ACTUAL batch operator (q195's aggregation), not a re-typed copy
  private def batchPairs = graft.operators.Selection.preferencePairs(
      arrivals.toDF("source", "lang", "doc_id", "qual"),
      Seq("source", "lang"), "doc_id", "qual")
    .select(col("source"), col("lang"),
      col("chosen_id"), col("rejected_id"),
      (col("q_max") - col("q_min")).as("margin"))
    .as[(String, String, Long, Long, Double)]
    .collect().sortBy(r => (r._1, r._2)).toSeq

  test("stream frontier equals the batch q195 aggregation, any batch split") {
    for (cut <- Seq(1, 4, arrivals.length)) {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, String, Long, Double)]
      val out = PreferenceStream.pairs(
        in.toDF().toDF("source", "lang", "doc_id", "qual"))
      // emission order captured EXPLICITLY via the foreachBatch batch id
      // (monotonically_increasing_id on a memory sink encodes partition
      // index, not emission order — it only coincidentally matched)
      val emitted = scala.collection.mutable.ArrayBuffer
        .empty[(Long, (String, String, Long, Long, Double))]
      val q = out.writeStream.outputMode("append")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[
             graft.streaming.PreferenceStream.PairOut], id: Long) =>
          val rows = b.toDF()
            .select(col("source"), col("lang"), col("chosen_id"),
              col("rejected_id"), col("margin"))
            .as[(String, String, Long, Long, Double)]
            .collect()
          emitted.synchronized { rows.foreach(r => emitted += ((id, r))) }
        }
        .start()
      try {
        in.addData(arrivals.take(cut))
        q.processAllAvailable()
        in.addData(arrivals.drop(cut))
        q.processAllAvailable()
        // frontier = per group, the row from the LATEST batch that
        // emitted for it (delta semantics: at most one row per group per
        // batch, so the batch id is a total per-group order)
        val frontier = emitted.synchronized {
          emitted.groupBy { case (_, r) => (r._1, r._2) }
            .map { case (_, rs) => rs.maxBy(_._1)._2 }
            .toSeq.sortBy(r => (r._1, r._2))
        }
        assert(frontier === batchPairs, s"cut=$cut")
      } finally q.stop()
    }
  }

  test("delta emit: an arrival that changes nothing emits nothing") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String, Long, Double)]
    val out = PreferenceStream.pairs(
      in.toDF().toDF("source", "lang", "doc_id", "qual"))
    val q = out.writeStream.format("memory").outputMode("append")
      .queryName("prefs_delta").start()
    try {
      in.addData(("s1", "en", 1L, 0.9), ("s1", "en", 2L, 0.1))
      q.processAllAvailable()
      val afterFirst = spark.table("prefs_delta").count()
      assert(afterFirst === 1L, "valid pair emits once")
      // mid-range arrival: changes neither extreme -> no emission
      in.addData(("s1", "en", 3L, 0.5))
      q.processAllAvailable()
      assert(spark.table("prefs_delta").count() === afterFirst)
      // new best -> exactly one more emission
      in.addData(("s1", "en", 4L, 0.95))
      q.processAllAvailable()
      assert(spark.table("prefs_delta").count() === afterFirst + 1)
    } finally q.stop()
  }
}
