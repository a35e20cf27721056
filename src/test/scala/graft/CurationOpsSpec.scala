package graft

import org.apache.spark.sql.functions._

import graft.operators.{Augment, Dedup, Similarity}
import graft.sources.Tables

/** Semantic invariants for the q192–q200 round-5 operators — properties
  * the DuckDB hash compare can't certify: run-merge arithmetic against a
  * driver-side replay, kappa bounds, DP noise calibration, fair-queue
  * interleave ratios, hard-negative label exclusion, and span-plan
  * coverage bounds. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0)

  test("q192: dup runs match a driver-side island replay on a crafted corpus") {
    // two docs share a verbatim 12-token quote (positions 2..13 of a) and
    // an isolated 8-token window elsewhere; W=8
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val win = (1 to 8).map(i => s"w$i").mkString(" ")
    val a = s"a1 a2 $quote a3 a4 $win a5"
    val b = s"b1 $quote b2 b3 b4 b5 b6 b7 $win"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val out = Dedup.dupRuns(docs, w = 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_runs"), r.getAs[Long]("max_run"),
          r.getAs[Long]("max_span_toks"))).toMap
    // the 12-token quote yields a run of 12-8+1 = 5 consecutive starts in
    // both docs; the isolated window yields a run of 1
    assert(out(1L) === (2L, 5L, 12L))
    assert(out(2L) === (2L, 5L, 12L))
  }

  test("q192: contract query spans cover at least the full planted copies") {
    val rows = run("q192_dup_runs").collect()
    assert(rows.nonEmpty)
    // every %6 doc is fully copied, so its longest run must cover the
    // whole doc: max_span_toks == its window count + 7
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    val copied = byId.keys.filter(id => id < 100000L && id % 6 == 0)
    assert(copied.nonEmpty)
    copied.foreach { id =>
      val r = byId(id)
      assert(r.getAs[Long]("max_span_toks") >=
        r.getAs[Long]("n_shared_windows") / r.getAs[Long]("n_runs") + 7 - 1)
      val twin = byId(id + 100000L)
      assert(twin.getAs[Long]("max_span_toks") === r.getAs[Long]("max_span_toks"),
        "a verbatim copy must mirror the original's longest span")
    }
  }

  test("q193: kappa is bounded, consistent with its own confusion counts") {
    val r = run("q193_cohen_kappa").collect().head
    val (n, n11, n10, n01, n00) = (r.getAs[Long]("n"), r.getAs[Long]("n11"),
      r.getAs[Long]("n10"), r.getAs[Long]("n01"), r.getAs[Long]("n00"))
    assert(n === n11 + n10 + n01 + n00)
    val kappa = r.getAs[Double]("kappa")
    assert(kappa >= -1.0 && kappa <= 1.0)
    // both raters are monotone in length, so agreement must beat chance
    assert(kappa > 0.0)
    assert(r.getAs[Double]("po") >= 0.0 && r.getAs[Double]("po") <= 1.0)
  }

  test("q194: planted mutations are detected, clean column is quiet") {
    val rows = run("q194_schema_drift").collect()
      .map(r => r.getAs[String]("cname") -> r).toMap
    assert(rows.keySet === Set("lang", "source", "n_chars"))
    // lang: every 7th B-side doc nulled -> null_drift must fire
    assert(rows("lang").getAs[Boolean]("null_drift"))
    assert(rows("lang").getAs[Long]("null_b") > 0)
    // n_chars: every 5th B-side doc padded +40 -> the numeric MEAN signal
    // must fire (null/distinct alone cannot see this mutation)
    assert(rows("n_chars").getAs[Boolean]("mean_drift"))
    assert(!rows("n_chars").getAs[Boolean]("null_drift"))
    // non-numeric columns never fire the mean signal
    assert(!rows("lang").getAs[Boolean]("mean_drift"))
    assert(!rows("source").getAs[Boolean]("mean_drift"))
    // source is untouched: no drift on either categorical signal
    assert(!rows("source").getAs[Boolean]("null_drift"))
    assert(!rows("source").getAs[Boolean]("distinct_drift"))
    assert(rows("source").getAs[Long]("null_a") === 0L)
  }

  test("q195: chosen strictly outranks rejected within every group") {
    val rows = run("q195_dpo_pairs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2)
      assert(r.getAs[Double]("margin") > 0.0)
      assert(r.getAs[Long]("chosen_id") !== r.getAs[Long]("rejected_id"))
    }
  }

  test("q196: percent ranks are calibrated within [0,1] and gap is |diff|") {
    val rows = run("q196_quantile_norm").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, g) = (r.getAs[Double]("pr_source"), r.getAs[Double]("pr_global"))
      assert(s >= 0.0 && s <= 1.0)
      assert(g >= 0.0 && g <= 1.0)
      assert(math.abs(r.getAs[Double]("rank_gap") - math.abs(s - g)) < 2e-6)
    }
  }

  test("q197: hard negatives never share the query's label, ranks dense") {
    val lbl = Tables.table(spark, sf0, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = run("q197_hard_negatives").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to rs.length),
        "ranks must be dense from 1")
      rs.foreach { r =>
        assert(lbl(r.getAs[Long]("neg_id")) !== lbl(qid),
          s"negative for $qid shares its label")
      }
      // sims are non-increasing with rank
      val sims = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q203: IVF hard negatives exclude the label and recall the exact miner") {
    val lbl = Tables.table(spark, sf0, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ivf = run("q203_ivf_hard_negatives").collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      assert(lbl(r.getAs[Long]("neg_id")) !== lbl(r.getAs[Long]("qid")))
    }
    val exact = run("q197_hard_negatives").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neg_id"))).toSet
    val hits = ivf.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neg_id")))
      .count(exact.contains)
    assert(hits > 0, "bucketed mining must recall part of the exact top-k")
  }

  test("q197: operator agrees with brute force when labels never collide") {
    // give every vector a unique label: label-exclusion filters only the
    // self-pair, so hardNegatives must equal bruteForceTopK
    val e = Tables.table(spark, sf0, "embeddings").limit(200)
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("vec_id").cast("int").as("label"))
    val q = e.filter(col("id") % 50 === 0)
      .select(col("id").as("qid"), col("vec").as("qvec"),
        col("label").as("qlabel"))
    val hard = Similarity.hardNegatives(e, q, k = 3)
      .select("qid", "rank", "id").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(
        e.select("id", "vec"), q.select("qid", "qvec"), k = 3)
      .select("qid", "rank", "id").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(hard === brute)
  }

  test("q198: span plan spends ~15% budget, coverage bounded by plan size") {
    val rows = run("q198_span_mask").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, spans, masked) = (r.getAs[Long]("n_toks"),
        r.getAs[Int]("n_spans"), r.getAs[Long]("n_masked"))
      assert(spans === math.floor(n * 0.15 / 4).toInt)
      assert(masked <= spans.toLong * 4, "overlaps can only shrink coverage")
      if (spans > 0) assert(masked >= 4, "at least one whole span covered")
      assert(masked <= n)
    }
  }

  test("q198: operator is deterministic across repartitionings") {
    val d = Tables.table(spark, sf0, "documents")
    val once = Augment.spanMaskPlan(d, "doc_id", "text", 0.15, 4)
      .select("doc_id", "span_hash").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val again = Augment.spanMaskPlan(d.repartition(7), "doc_id", "text", 0.15, 4)
      .select("doc_id", "span_hash").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(once === again)
  }

  test("q199: DP mean stays within the Laplace tail bound of the clipped truth") {
    val rows = run("q199_group_dp_mean").collect()
    assert(rows.length === 20)
    val truth = Tables.table(spark, sf0, "documents")
      .groupBy(col("source"))
      .agg(avg(least(greatest(col("n_chars").cast("double"), lit(0.0)),
        lit(2000.0))).as("m"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (m, n) = truth(r.getAs[String]("source"))
      // noisy_sum err <= b_s * ln(1/2e-6), noisy_n err likewise: with
      // b_s=4000, b_n=2 and n=25-ish groups the mean can move a lot —
      // assert only the release is finite and the audit column is exact
      assert(r.getAs[Long]("n_true") === n)
      assert(!r.getAs[Double]("dp_mean").isNaN)
      assert(math.abs(r.getAs[Double]("dp_mean") - m) <=
        (4000.0 * 14 + 2.0 * 14 * m) / math.max(n - 2.0 * 14, 1.0),
        "DP mean outside the 1e-6-tail Laplace envelope")
    }
  }

  test("q202: segment fold matches a driver-side replay over the real sample") {
    import graft.operators.MultimodalPack.{VadWindow, VadThreshold}
    val rows = run("q202_vad_segments").collect()
    assert(rows.nonEmpty)
    val texts = Tables.table(spark, sf0, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val t = texts(r.getAs[Long]("doc_id"))
      val flags = t.getBytes("UTF-8").grouped(VadWindow).toSeq
        .filter(_.length == VadWindow)
        .map(_.map(_.toInt).sum >= VadThreshold)
      var (cur, best, segs) = (0, 0, 0)
      flags.foreach { f =>
        if (f) { if (cur == 0) segs += 1; cur += 1; best = math.max(best, cur) }
        else cur = 0
      }
      assert(r.getAs[Int]("n_windows") === flags.length)
      assert(r.getAs[Int]("n_active") === flags.count(identity))
      assert(r.getAs[Int]("n_segments") === segs)
      assert(r.getAs[Int]("longest_run") === best)
    }
  }

  test("q212: PSI matches an exact driver-side replay of the binned divergence") {
    val r = run("q212_psi_drift").collect().head
    assert(r.getAs[Double]("psi") >= 0.0, "PSI is a non-negative divergence")
    // literal replay: same mutation, same bins, same smoothing
    val bins = Tables.table(spark, sf0, "documents")
      .select(col("doc_id"), col("n_chars")).collect().map { row =>
        val (id, nc) = (row.getLong(0), row.getLong(1))
        val a = id % 2 == 0
        val v = if (!a && id % 5 == 0) nc + 40 else nc
        (a, v / 25)
      }
    val per = bins.groupBy(_._2).view.mapValues(xs =>
      (xs.count(_._1), xs.count(!_._1))).toMap
    val (na, nb, k) = (per.values.map(_._1).sum, per.values.map(_._2).sum,
      per.size)
    val psi = per.values.map { case (ca, cb) =>
      val pa = (ca + 1.0) / (na + k); val pb = (cb + 1.0) / (nb + k)
      // snap6 is a FLOOR at 1e-6 (Portable.snap6), not a round
      math.floor((pa - pb) * math.log(pa / pb) * 1e6) / 1e6
    }.sum
    assert(r.getAs[Long]("n_bins") === k.toLong)
    assert(math.abs(r.getAs[Double]("psi") - psi) < 2e-6,
      s"query PSI ${r.getAs[Double]("psi")} vs replay $psi")
    assert(r.getAs[Boolean]("drifting") === (r.getAs[Double]("psi") >= 0.1))
  }

  test("q211: labels replay driver-side with strict window edges") {
    val rows = run("q211_churn_labels").collect()
    assert(rows.nonEmpty)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    val ev = Tables.table(spark, sf0, "events")
      .filter(col("user_id").isNotNull && col("user_id") % 5 === 0)
      .select(col("user_id"), col("ts"), col("event_type"))
      .collect().map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime]("ts"), r.getString(2)))
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val cut = java.time.LocalDateTime.parse(r.getAs[String]("cutoff"), fmt)
      val (lo, hi) = (cut.minusDays(7), cut.plusDays(7))
      val mine = ev.filter(_._1 == u)
      val obs = mine.filter(e => e._2.isAfter(lo) && !e._2.isAfter(cut))
      val out = mine.exists(e => e._2.isAfter(cut) && !e._2.isAfter(hi))
      assert(r.getAs[Long]("n_events_obs") === obs.length.toLong)
      assert(r.getAs[Long]("n_purchases_obs") ===
        obs.count(_._3 == "purchase").toLong)
      assert(r.getAs[Long]("label_active") === (if (out) 1L else 0L))
      assert(obs.nonEmpty, "emitted rows must have observed features")
    }
    // both label classes must appear or the dataset is degenerate
    assert(rows.exists(_.getAs[Long]("label_active") == 1L))
  }

  test("q210: template dedup separates byte copies from digit-template families") {
    val rows = run("q210_template_dedup").collect()
    assert(rows.nonEmpty)
    // the %7 digit-mutated plants (on docs that contain digits) are
    // template-only families; the %9 byte copies are not
    assert(rows.exists(_.getAs[Boolean]("template_only")),
      "digit-mutated plants must group as template families")
    assert(rows.exists(!_.getAs[Boolean]("template_only")),
      "byte-identical plants must remain raw-dup groups")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct_raw") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_docs") > 1)
    }
  }

  test("q208: out-of-fold encoding never includes the fold's own target") {
    val rows = run("q208_target_encoding").collect()
    assert(rows.nonEmpty)
    // replay: raw per-(cat,fold) sums from the events table
    val raw = Tables.table(spark, sf0, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("cat"),
        (coalesce(col("user_id"), lit(-1L)) % 5).cast("int").as("fold"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy("cat", "fold")
      .agg(count(lit(1)).as("n"), sum("cents").as("s"))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val byCat = raw.groupBy(_._1._1).view
      .mapValues(m => (m.values.map(_._1).sum, m.values.map(_._2).sum)).toMap
    rows.foreach { r =>
      val (cat, fold) = (r.getAs[String]("cat"), r.getAs[Int]("fold"))
      val (nc, sc) = byCat(cat)
      val (nf, sf) = raw((cat, fold))
      assert(r.getAs[Long]("n_fold") === nf)
      if (nc != nf) {
        val expected = (sc - sf).toDouble / (nc - nf) / 100.0
        assert(math.abs(r.getAs[Double]("oof_mean_value") - expected) < 1e-6)
      } else assert(r.isNullAt(r.fieldIndex("oof_mean_value")))
    }
  }

  test("q209: negatives are never positives and draws are deterministic") {
    val pos = graft.operators.Ratings.ratings(spark, sf0)
      .select("user_id", "item_id").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = run("q209_negative_sampling").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!pos.contains((r.getAs[Long]("user_id"), r.getAs[Long]("item_id"))),
        "a sampled negative collides with a real interaction")
    }
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("neg_rank")).sorted.toSeq === (1 to rs.length))
      assert(rs.length <= 3)
      val items = rs.map(_.getAs[Long]("item_id"))
      assert(items.distinct.length === items.length,
        "a user's negatives must be distinct items even when draws collide")
    }
    // determinism: a second run yields the identical set
    val again = run("q209_negative_sampling").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again === rows.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
  }

  test("q206: exclusive failures are bounded by total failures per rule") {
    val r = run("q206_filter_attribution").collect().head
    for (rule <- Seq("len", "avglen", "alpha", "stop")) {
      val fail = r.getAs[Long](s"fail_$rule")
      val excl = r.getAs[Long](s"excl_$rule")
      assert(excl <= fail, s"rule $rule: exclusive ($excl) > total ($fail)")
    }
    // kept + (docs failing at least one rule) = all docs; the failing
    // count is NOT the sum of per-rule fails (joint failures overlap),
    // but it is at least the max single-rule fail
    val failing = r.getAs[Long]("n_docs") - r.getAs[Long]("n_kept")
    val maxFail = Seq("len", "avglen", "alpha", "stop")
      .map(x => r.getAs[Long](s"fail_$x")).max
    assert(failing >= maxFail)
  }

  test("q207: planted dups split into within- and cross-source pairs exactly") {
    val r = run("q207_dup_locality").collect().head
    assert(r.getAs[Long]("n_pairs") ===
      r.getAs[Long]("n_within") + r.getAs[Long]("n_cross"))
    // every 6th doc planted within its source, every 10th across -> both
    // locality classes are populated
    assert(r.getAs[Long]("n_within") > 0)
    assert(r.getAs[Long]("n_cross") > 0)
    val fc = r.getAs[Double]("frac_cross")
    assert(fc > 0.0 && fc < 1.0)
  }

  test("q204: embargo split partitions exhaustively and the gap proof holds") {
    val r = run("q204_embargo_split").collect().head
    val total = Tables.table(spark, sf0, "events").count()
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") +
      r.getAs[Long]("n_purged") === total)
    assert(r.getAs[Long]("n_train") > 0 && r.getAs[Long]("n_test") > 0)
    assert(r.getAs[Long]("n_purged") > 0, "the embargo window must purge rows")
    // by construction every cross-split user's gap spans the purged window
    assert(r.getAs[Boolean]("embargo_ok"))
    assert(r.getAs[Long]("min_gap_s") >= 259200L)
  }

  test("q205: novelty is 1 for first arrivals and cumulative over arrival order") {
    val rows = run("q205_ngram_novelty").collect()
    assert(rows.nonEmpty)
    val byId = rows.sortBy(_.getAs[Long]("doc_id"))
    // the earliest doc contains only first-seen grams
    assert(byId.head.getAs[Double]("novelty") === 1.0)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_grams"))
      val nov = r.getAs[Double]("novelty")
      assert(nov >= 0.0 && nov <= 1.0)
    }
    // novelty must actually discriminate: some docs below 1.0
    assert(rows.exists(_.getAs[Double]("novelty") < 1.0))
  }

  test("q201: capstone drops every re-crawl id and orders shards by margin") {
    val rows = run("q201_preference_capstone").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the rejected tie-break is MAX id, so a failed dedup would surface
      // a 500k-offset re-crawl id here — none may appear
      assert(r.getAs[Long]("chosen_id") < 500000L)
      assert(r.getAs[Long]("rejected_id") < 500000L)
      assert(r.getAs[Double]("margin") > 0.0)
    }
    rows.groupBy(_.getAs[Int]("shard")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Int]("rn"))
      val margins = ordered.map(_.getAs[Double]("margin"))
      assert(margins.zip(margins.tail).forall { case (a, b) => a >= b },
        "curriculum order within a shard must be margin-descending")
      assert(ordered.map(_.getAs[Int]("rn")).toSeq === (1 to rs.length))
    }
  }

  test("plan shapes: q195 aggregates without a rank window; q198 operator is shuffle-free") {
    val dpo = SparkEntry.queries("q195_dpo_pairs")(spark, sf0)
    val dpoPlan = dpo.queryExecution.executedPlan.toString
    assert(!dpoPlan.contains("Window"),
      "q195 must realize chosen/rejected via max_by/min_by aggregation, not a rank window")
    // the span plan itself (before the contract orderBy) must not shuffle:
    // pure scan-stage higher-order-function arithmetic
    val span = Augment.spanMaskPlan(
      Tables.table(spark, sf0, "documents"), "doc_id", "text", 0.15, 4)
    val spanPlan = span.queryExecution.executedPlan.toString
    assert(!spanPlan.contains("Exchange"),
      "spanMaskPlan must stay scan-stage (no Exchange in the physical plan)")
  }

  test("q200: interleave realizes the per-source weights fairly") {
    val rows = run("q200_interleave_schedule").collect()
    assert(rows.length === 60)
    // virtual times are non-decreasing in schedule order (rows arrive
    // already ordered by the contract orderBy)
    val vts = rows.map(_.getAs[Double]("vt"))
    assert(vts.zip(vts.tail).forall { case (a, b) => a <= b })
    // within each source the rn sequence is dense from 1: no skips
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val rns = rs.map(_.getAs[Int]("rn")).sorted.toSeq
      assert(rns === (1 to rns.length))
    }
    // a source with weight w reaches vt <= T about w*T times: the heaviest
    // source must land at least as many schedule slots as the lightest.
    // Weights replayed driver-side from the operator's own hash rule.
    def weightOf(source: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(source.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(8)
      1L + (java.lang.Long.parseLong(hex, 16) %
        graft.functions.Portable.M) % 4
    }
    val counts = rows.groupBy(_.getAs[String]("source")).view
      .mapValues(_.length).toMap
    val byWeight = counts.keys.groupBy(weightOf)
    if (byWeight.size >= 2) {
      val heaviest = byWeight(byWeight.keys.max).map(counts).max
      val lightest = byWeight(byWeight.keys.min).map(counts).min
      assert(heaviest >= lightest,
        s"weight-${byWeight.keys.max} source scheduled less than " +
          s"weight-${byWeight.keys.min} source")
    }
  }
}
