package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, DedupPack}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup clusters identical normalized texts") {
    val docs = Seq(
      (1L, "Hello   world"), (2L, "hello world"), (3L, "something else")
    ).toDF("doc_id", "text")
    val out = Dedup.exact(docs).collect()
    assert(out.length === 2)
    val cluster = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(cluster.getAs[Long]("keeper") === 1L)
  }

  test("minhash LSH finds every injected exact copy") {
    val docs = DedupPack.withCopies(spark, sf0, mod = 2)
    val nDocs = docs.count() / 2
    val pairs = Dedup.minhashLsh(docs, shingleN = 3, numHashes = 16,
      bands = 4, threshold = 0.99)
    // every (d, d+offset) pair must be found with jaccard 1.0
    val copies = pairs
      .filter(col("doc_b") === col("doc_a") + DedupPack.CopyOffset)
      .count()
    assert(copies === nDocs, s"expected $nDocs copy pairs, found $copies")
  }

  test("simhash of identical docs is identical, hamming 0") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z q w e"))
      .toDF("doc_id", "text")
    val sh = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(2L))
    val d = Seq((sh(1L), sh(3L))).toDF("a", "b")
      .select(Dedup.hamming(col("a"), col("b"))).head().getInt(0)
    assert(d >= 0)
  }

  test("jaccard is exact on a hand-checked pair") {
    val docs = Seq(
      (1L, "a b c d"),   // shingles: "a b c", "b c d"
      (2L, "a b c e")    // shingles: "a b c", "b c e"
    ).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, 3)
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val j = Dedup.jaccard(pairs, sh).head().getAs[Double]("jaccard")
    assert(math.abs(j - 1.0 / 3.0) < 1e-12) // 1 shared of 3 distinct
  }
}
