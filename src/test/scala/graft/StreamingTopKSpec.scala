package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingTopK

/** Space-saving guarantees for the streaming heavy-hitter summary: the
  * contract of an approximate sketch is its BOUNDS, which must hold
  * under any micro-batch split — presence of every true heavy hitter,
  * count sandwich true ≤ count ≤ true + err, and bounded state. */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  private val Shards = 4
  private val Capacity = 32

  // the token stream: natural Zipf-ish skew from the documents table
  private lazy val terms: Seq[String] = Tables
    .table(spark, sf0, "documents")
    .select(explode(graft.functions.TextFunctions.tokens(col("text")))
      .as("term"))
    .as[String].collect().toSeq

  private def Tables = graft.sources.Tables

  // true per-(shard, term) counts using the engine's own hash expression
  private lazy val truth: Map[(Int, String), Long] = {
    val df = terms.toDF("term")
      .select((abs(hash(col("term"))) % Shards).cast("int").as("shard"),
        col("term"))
      .groupBy("shard", "term").agg(count(lit(1)).as("n"))
      .as[(Int, String, Long)].collect()
    df.map(r => (r._1, r._2) -> r._3).toMap
  }

  test("guarantees hold at the frontier under any micro-batch split") {
    val perShardN = truth.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    for (cut <- Seq(terms.length / 4, terms.length)) {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[String]
      val out = StreamingTopK.topK(spark, in.toDF().toDF("term"),
        Shards, Capacity)
      val name = s"topk_$cut"
      val q = out.writeStream.format("memory").outputMode("update")
        .queryName(name).start()
      try {
        in.addData(terms.take(cut))
        q.processAllAvailable()
        in.addData(terms.drop(cut))
        q.processAllAvailable()
        val frontier = spark.table(name)
          .groupBy("shard").agg(max(struct(col("n_seen"), col("entries")))
            .as("m"))
          .select(col("shard"), col("m.n_seen"), col("m.entries"))
          .as[(Int, Long, Seq[(String, Long, Long)])].collect()
        assert(frontier.map(_._1).sorted.toSeq === (0 until Shards))
        frontier.foreach { case (shard, nSeen, entries) =>
          assert(nSeen === perShardN(shard), s"shard $shard stream length")
          assert(entries.length <= Capacity, s"shard $shard state bound")
          // count sandwich for every tracked term
          entries.foreach { case (t, c, e) =>
            val tru = truth.getOrElse((shard, t), 0L)
            assert(tru <= c, s"$t: count $c below true $tru")
            assert(c <= tru + e, s"$t: count $c exceeds true+err ${tru + e}")
          }
          // presence of every guaranteed heavy hitter (freq > N/capacity)
          val tracked = entries.map(_._1).toSet
          truth.collect {
            case ((sh, t), n) if sh == shard && n > nSeen / Capacity =>
              assert(tracked(t),
                s"shard $shard lost heavy hitter $t (n=$n > ${nSeen}/$Capacity)")
          }
        }
      } finally q.stop()
    }
  }

  test("the exact per-shard top term is always tracked with a tight count") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val out = StreamingTopK.topK(spark, in.toDF().toDF("term"),
      Shards, Capacity)
    val q = out.writeStream.format("memory").outputMode("update")
      .queryName("topk_top1").start()
    try {
      in.addData(terms)
      q.processAllAvailable()
      val frontier = spark.table("topk_top1")
        .groupBy("shard").agg(max(struct(col("n_seen"), col("entries")))
          .as("m"))
        .select(col("shard"), col("m.entries"))
        .as[(Int, Seq[(String, Long, Long)])].collect().toMap
      truth.groupBy(_._1._1).foreach { case (shard, g) =>
        val (topTerm, topN) = g.toSeq.map { case ((_, t), n) => t -> n }
          .maxBy(_._2)
        val entries = frontier(shard)
        val hit = entries.find(_._1 == topTerm)
        assert(hit.isDefined, s"shard $shard: top term $topTerm untracked")
        // a term tracked since early on has small err → near-exact count
        assert(hit.get._2 >= topN, s"shard $shard top-term count lower bound")
      }
    } finally q.stop()
  }
}
