package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.{Portable, TextFunctions}
import graft.operators.TextPack
import graft.streaming.StreamingGroupStats

/** Batch≡stream parity for the group-reward sufficient statistics: under
  * any micro-batch split the per-group frontier (n, Σr, Σr²) equals the
  * batch aggregation, and advantages computed from the streamed state
  * reproduce the q216 contract values. */
class StreamingGroupStatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rewards = graft.sources.Tables
    .table(spark, sf0, "documents")
    .select(col("source"), col("lang"), col("doc_id"),
      round(Portable.snap6(TextFunctions.qualityScore(
        col("text"), TextPack.stopwords)) * lit(1e6), 0)
        .cast("long").as("rm"))
    .as[(String, String, Long, Long)].collect().toSeq

  private lazy val batchStats = rewards.groupBy(r => (r._1, r._2))
    .map { case (k, rs) =>
      k -> (rs.size.toLong, rs.map(_._4).sum, rs.map(r => r._4 * r._4).sum)
    }

  test("streamed frontier equals the batch sufficient statistics, any split") {
    for (cut <- Seq(1, rewards.length / 3, rewards.length)) {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, String, Long, Long)]
      val out = StreamingGroupStats.stats(spark,
        in.toDF().toDF("source", "lang", "doc_id", "rm"))
      val name = s"gs_$cut"
      val q = out.writeStream.format("memory").outputMode("update")
        .queryName(name).start()
      try {
        in.addData(rewards.take(cut))
        q.processAllAvailable()
        in.addData(rewards.drop(cut))
        q.processAllAvailable()
        // frontier: per group the row with the LARGEST n (stats only grow)
        val frontier = spark.table(name)
          .groupBy("source", "lang")
          .agg(max(struct(col("n"), col("s1"), col("s2"))).as("m"))
          .select(col("source"), col("lang"), col("m.n"), col("m.s1"),
            col("m.s2"))
          .as[(String, String, Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
        assert(frontier === batchStats, s"cut=$cut")
      } finally q.stop()
    }
  }

  test("advantages from streamed state reproduce the q216 contract") {
    val contract = SparkEntry.queries("q216_grpo_advantage")(spark, sf0)
      .select("source", "lang", "doc_id", "advantage")
      .as[(String, String, Long, Double)].collect()
    assert(contract.nonEmpty)
    val byDoc = rewards.map(r => r._3 -> r).toMap
    contract.foreach { case (src, lang, id, adv) =>
      val (n, s1, s2) = batchStats((src, lang))
      val mine = StreamingGroupStats.advantage(byDoc(id)._4, n, s1, s2)
      val snapped = math.floor(mine * 1e6) / 1e6
      assert(math.abs(snapped - adv) < 1e-9, s"doc $id: $snapped vs $adv")
    }
  }
}
