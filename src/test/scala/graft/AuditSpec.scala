package graft

import org.apache.spark.sql.functions._

/** Unit behavior of the audit/lifecycle queries (AuditPack, LifecyclePack)
  * and the upsertSnapshot operator; cross-engine exactness is covered by
  * the pack oracles. */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("q101 pivot matches the equivalent filtered aggregation") {
    val piv = SparkEntry.queries("q101_pivot_events")(spark, sf0)
    val manual = graft.sources.Tables.table(spark, sf0, "events")
      .filter(col("event_type") === "click")
      .groupBy((col("user_id") % 10).as("segment"))
      .agg(round(sum(col("value")), 6).as("click"))
    val j = piv.select("segment", "click").join(manual, Seq("segment"), "full_outer")
    assert(j.count() === 10)
    assert(j.filter(!(piv("click") <=> manual("click"))).count() === 0)
  }

  test("q102 cube: exactly one grand-total row and consistent partial sums") {
    val cube = SparkEntry.queries("q102_cube_docs")(spark, sf0).cache()
    try {
      val grand = cube.filter(col("gid") === 3).collect()
      assert(grand.length === 1)
      val total = grand.head.getAs[Long]("n_docs")
      // each single-axis rollup partitions the same 500 docs
      assert(cube.filter(col("gid") === 1).agg(sum("n_docs")).as[Long].head === total)
      assert(cube.filter(col("gid") === 2).agg(sum("n_docs")).as[Long].head === total)
      assert(cube.filter(col("gid") === 0).agg(sum("n_docs")).as[Long].head === total)
    } finally cube.unpersist()
  }

  test("q104 profiler invariants: ndv bounds and min<=avg<=max, one row per column") {
    val p = SparkEntry.queries("q104_profile")(spark, sf0).collect()
    assert(p.map(_.getAs[String]("col_name")).toSeq.sorted ===
      graft.operators.AuditPack.ProfileCols.sorted)
    p.foreach { r =>
      assert(r.getAs[Long]("ndv") <= r.getAs[Long]("n_nonnull"))
      assert(r.getAs[Double]("min_v") <= r.getAs[Double]("avg_v") + 1e-6)
      assert(r.getAs[Double]("avg_v") <= r.getAs[Double]("max_v") + 1e-6)
    }
  }

  test("q107 MAD outliers: nonnegative spread, outliers are a strict minority") {
    SparkEntry.queries("q107_mad_outliers")(spark, sf0).collect().foreach { r =>
      assert(r.getAs[Double]("mad") >= 0.0)
      assert(r.getAs[Long]("n_outliers") < r.getAs[Long]("n") / 2)
    }
  }

  test("upsertSnapshot labels all four action classes correctly") {
    val old = Seq((1L, "same"), (2L, "before"), (4L, "gone")).toDF("id", "body")
    val neu = Seq((1L, "same"), (2L, "after"), (3L, "fresh")).toDF("id", "body")
    val out = graft.operators.CorpusOps.upsertSnapshot(old, neu, "id", "body")
      .orderBy("id").as[(Long, String, String)].collect().toSeq
    assert(out.map(r => r._1 -> r._2) ===
      Seq(1L -> "carry", 2L -> "update", 3L -> "insert", 4L -> "retire"))
    // surviving hash is the new side except for retires
    assert(out(1)._3 === out.find(_._1 == 2L).get._3)
  }

  test("q117 overlap matrix: containment-normalized and bounded") {
    SparkEntry.queries("q117_source_overlap")(spark, sf0).collect().foreach { r =>
      val shared = r.getAs[Long]("n_shared")
      assert(shared <= math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
      val ov = r.getAs[Double]("overlap")
      assert(ov > 0.0 && ov <= 1.0)
    }
  }

  test("q118 budget curve: full partition, monotone tokens, non-increasing quality") {
    val rows = SparkEntry.queries("q118_budget_curve")(spark, sf0)
      .orderBy("decile").collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq === (0L to 9L))
    assert(rows.map(_.getAs[Long]("n_docs")).sum === 500L)
    val cums = rows.map(_.getAs[Long]("cum_tokens"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b > a })
    assert(cums.last === rows.map(_.getAs[Long]("n_tokens")).sum)
    val qs = rows.map(_.getAs[Double]("avg_q"))
    assert(qs.zip(qs.tail).forall { case (a, b) => a >= b })
  }

  test("q110 interleave: pos is a permutation and respects per-source order") {
    val rows = SparkEntry.queries("q110_interleave")(spark, sf0)
      .select("pos", "source", "doc_id")
      .as[(Long, String, Long)].collect().toSeq
    assert(rows.map(_._1).sorted === (1L to rows.length).toSeq)
    // within each source, increasing pos must present increasing doc_id
    rows.groupBy(_._2).values.foreach { g =>
      val byPos = g.sortBy(_._1).map(_._3)
      assert(byPos === byPos.sorted)
    }
    // round-robin: the first |sources| positions hit distinct sources
    val nSrc = rows.map(_._2).distinct.size
    assert(rows.sortBy(_._1).take(nSrc).map(_._2).distinct.size === nSrc)
  }

  test("kAnonymity: ladder levels, anonymity sets, l-diversity, NULL stratum") {
    import graft.operators.Governance
    // (coarse, fine, sensitive): en/web is 3-deep (level 0, 2 distinct
    // sensitive values); en/app is 1-deep but en totals 4 (level 1);
    // fr/web is 1-deep and fr totals 1 -> only the corpus of 5 hides it
    // (level 2); the NULL coarse value must be its own stratum, not lost.
    val docs = Seq(
      (Option("en"), "web", 10L), (Option("en"), "web", 10L),
      (Option("en"), "web", 20L), (Option("en"), "app", 30L),
      (Option.empty[String], "web", 40L)
    ).toDF("lang", "source", "sens")
    val out = Governance.kAnonymity(docs, "lang", "source", col("sens"), k = 3)
      .orderBy("qi_coarse", "qi_fine")
      .as[(String, String, Long, Long, Int, Long)].collect().toSeq
    assert(out === Seq(
      ("", "web", 1L, 1L, 2, 5L),
      ("en", "app", 1L, 1L, 1, 4L),
      ("en", "web", 3L, 2L, 0, 3L)))
  }
}
