package graft

import org.apache.spark.sql.functions._

import graft.operators.Search

/** Unit behavior of BM25/hybrid retrieval and the audit queries added
  * alongside them; cross-engine exactness is covered by the pack oracles. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: term frequency raises the score, document length damps it") {
    val docs = Seq(
      (1L, "hash join"),            // tf(hash)=1, short
      (2L, "hash hash join"),       // tf(hash)=2
      (3L, "hash join a a a a a a a a a a a a")) // tf=1, long
      .toDF("doc_id", "text")
    val sc = Search.bm25(docs, "doc_id", "text", Seq("hash"))
      .as[(Long, Double)].collect().toMap
    assert(sc(2L) > sc(1L)) // more occurrences, higher score
    assert(sc(1L) > sc(3L)) // same tf, longer doc scores lower
  }

  test("bm25: rarer terms out-weigh common ones at equal tf") {
    val docs = Seq(
      (1L, "common rare"), (2L, "common x"), (3L, "common y"), (4L, "common z"))
      .toDF("doc_id", "text")
    val sc = Search.bm25(docs, "doc_id", "text", Seq("common", "rare"))
      .as[(Long, Double)].collect().toMap
    // doc 1 holds both terms; its margin over the common-only docs must
    // exceed the common-term weight alone (idf(rare) > idf(common))
    val commonOnly = sc(2L)
    assert(sc(1L) - commonOnly > commonOnly)
  }

  test("bm25 scores are partitioning-invariant (micro-unit sums)") {
    val docs = graft.sources.Tables.table(spark, sf1, "documents")
      .select("doc_id", "text")
    val one = Search.bm25(docs.repartition(1), "doc_id", "text",
      graft.operators.SearchPack.Terms).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val many = Search.bm25(docs.repartition(13), "doc_id", "text",
      graft.operators.SearchPack.Terms).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(one === many) // bit-exact, not approx: integer sums are associative
  }

  test("q114 hybrid: ranks are a permutation and rrf is consistent with the parts") {
    val rows = SparkEntry.queries("q114_hybrid_rrf")(spark, sf0).collect()
    assert(rows.map(_.getAs[Int]("rank")).toSeq === (1 to rows.length))
    rows.foreach { r =>
      val expect =
        (Option(r.getAs[java.lang.Double]("lex_rank")).map(x => 1.0 / (60 + x))
          .getOrElse(0.0)) +
          (Option(r.getAs[java.lang.Double]("dense_rank")).map(x => 1.0 / (60 + x))
            .getOrElse(0.0))
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-6)
    }
    // descending fusion order
    val rrfs = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("rrf"))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
  }

  test("q115 entropy is bounded by ln(n_types), ttr in (0, 1]") {
    SparkEntry.queries("q115_source_entropy")(spark, sf0).collect().foreach { r =>
      val h = r.getAs[Double]("entropy")
      assert(h >= 0.0 && h <= math.log(r.getAs[Long]("n_types").toDouble) + 1e-9)
      val ttr = r.getAs[Double]("ttr")
      assert(ttr > 0.0 && ttr <= 1.0)
    }
  }

  test("q116: verified-LSH pairs are a subset of exact pairs; recall positive") {
    val r = SparkEntry.queries("q116_dedup_recall_audit")(spark, sf0).head()
    assert(r.getAs[Long]("n_both") === r.getAs[Long]("n_lsh"))
    assert(r.getAs[Long]("n_exact") >= r.getAs[Long]("n_lsh"))
    assert(r.getAs[Double]("recall") > 0.0 && r.getAs[Double]("recall") <= 1.0)
    assert(r.getAs[Long]("n_cand") >= r.getAs[Long]("n_lsh"))
  }
}
