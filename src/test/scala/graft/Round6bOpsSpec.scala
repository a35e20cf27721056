package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Independent plain-Scala re-derivations of the q225–q228 contract
  * queries on sf0.001 (the Round6OpsSpec discipline: a THIRD code path
  * besides the Spark plan and its DuckDB twin, so a shared formula bug
  * still gets caught). */
class Round6bOpsSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0)

  // ---- shared local kernels (mirror the engine's exact arithmetic) ------

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** pairSim twin: cosine rounded HALF_UP to 4 decimals, null→None on
    * zero norms (never fires on this corpus). */
  private def sim4(a: Array[Double], b: Array[Double]): Double = {
    val den = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
    BigDecimal(dot(a, b) / den)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Portable.hash32 twin: first 8 md5 hex chars as unsigned long. */
  private def hash32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  private def snap6(x: Double): Double = math.floor(x * 1e6) / 1e6

  private def loadEmb(): Map[Long, Array[Double]] =
    Tables.table(spark, sf0, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap

  test("q225: MRR/hit-rate equals a full local replay of truth + IVF") {
    val emb = loadEmb()
    val qids = emb.keys.filter(_ % 50 == 0).toSeq.sorted
    val cents = emb.keys.filter(_ < graft.operators.SimilarityPack.NumCentroids)
      .toSeq.sorted
    // exact top-1 per query: (sim desc, id asc)
    val truth = qids.map { q =>
      q -> emb.keys.filter(_ != q).toSeq
        .map(id => (id, sim4(emb(id), emb(q))))
        .minBy { case (id, s) => (-s, id) }._1
    }.toMap
    // IVF: every vector in its argmax-centroid bucket (sim desc, cid asc)
    val bucket = emb.keys.map { id =>
      id -> cents.map(c => (c, sim4(emb(id), emb(c))))
        .minBy { case (c, s) => (-s, c) }._1
    }.toMap
    val ranks = qids.map { q =>
      val cand = emb.keys
        .filter(id => id != q && bucket(id) == bucket(q)).toSeq
        .map(id => (id, sim4(emb(id), emb(q))))
        .sortBy { case (id, s) => (-s, id) }
        .take(graft.operators.SimilarityPack.MrrK).map(_._1)
      val i = cand.indexOf(truth(q))
      if (i < 0) 0L else i + 1L
    }
    val n = ranks.length.toLong
    val out = run("q225_mrr_hit_rate")
      .select("n_queries", "hit1", "hit3", "hit10", "mrr")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(out._1 === n)
    assert(out._2 === snap6(ranks.count(_ == 1L).toDouble / n))
    assert(out._3 === snap6(ranks.count(r => r >= 1 && r <= 3).toDouble / n))
    assert(out._4 === snap6(ranks.count(_ >= 1L).toDouble / n))
    val rrE6 = ranks.filter(_ >= 1L).map(1000000L / _).sum
    assert(out._5 === snap6(rrE6.toDouble / 1e6 / n))
    // the metric chain is internally consistent: hit1 <= hit3 <= hit10,
    // and mrr is bounded by them (hit1 <= mrr <= hit10)
    assert(out._2 <= out._3 && out._3 <= out._4)
    assert(out._2 - 1e-9 <= out._5 && out._5 <= out._4 + 1e-9)
  }

  test("q226: clipped n-gram overlap equals a direct local recount") {
    val docs = Tables.table(spark, sf0, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).toSeq
    def grams(t: String, n: Int) = toks(t).sliding(n).filter(_.length == n)
      .map(_.mkString(" ")).toSeq
    val byId = docs.map(d => d._1 -> d._3).toMap
    val pairs = docs.groupBy(_._2).values.flatMap { g =>
      val ids = g.map(_._1).sorted
      ids.zip(ids.drop(1))
    }.toSeq
    assert(pairs.nonEmpty)
    val out = run("q226_rouge_overlap")
      .select("n", "cand_id", "ref_id", "n_cand", "n_ref", "overlap", "rouge_f")
      .as[(Int, Long, Long, Long, Long, Long, Option[Double])].collect()
    assert(out.length === pairs.size * 2)
    val outMap = out.map(r => (r._1, r._2, r._3) -> r).toMap
    for (n <- Seq(1, 2); (cand, ref) <- pairs) {
      val cc = grams(byId(cand), n).groupBy(identity).view.mapValues(_.size)
      val rc = grams(byId(ref), n).groupBy(identity).view.mapValues(_.size)
      val overlap = cc.keys.toSeq.map(g => math.min(cc(g), rc.getOrElse(g, 0)))
        .sum.toLong
      val (nc, nr) = (cc.values.sum.toLong, rc.values.sum.toLong)
      val row = outMap((n, cand, ref))
      assert(row._4 === nc, s"n=$n pair=($cand,$ref) n_cand")
      assert(row._5 === nr, s"n=$n pair=($cand,$ref) n_ref")
      assert(row._6 === overlap, s"n=$n pair=($cand,$ref) overlap")
      val f = if (nc + nr == 0) None
        else Some(snap6(2.0 * overlap / (nc + nr)))
      assert(row._7 === f, s"n=$n pair=($cand,$ref) f1")
    }
  }

  test("q232: ROUGE-L equals a local DP; graft_lcs exact on FULL texts too") {
    val K = graft.operators.TextPack.RougeLMaxToks
    def lcs(a: Seq[String], b: Seq[String]): Long = {
      val prev = Array.fill(b.length + 1)(0)
      for (x <- a) {
        val cur = Array.fill(b.length + 1)(0)
        for (j <- 1 to b.length)
          cur(j) = math.max(math.max(prev(j), cur(j - 1)),
            if (b(j - 1) == x) prev(j - 1) + 1 else 0)
        Array.copy(cur, 0, prev, 0, b.length + 1)
      }
      prev(b.length).toLong
    }
    val docs = Tables.table(spark, sf0, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    def toks(t: String) = t.split("\\s+").filter(_.nonEmpty).toSeq
    val byId = docs.map(d => d._1 -> toks(d._3)).toMap
    val pairs = docs.groupBy(_._2).values.flatMap { g =>
      val ids = g.map(_._1).sorted; ids.zip(ids.drop(1))
    }.toSeq
    val out = run("q232_rouge_l")
      .select("cand_id", "ref_id", "len_cand", "len_ref", "lcs")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length === pairs.size)
    out.foreach { case (c, r, lc, lr, l) =>
      val (a, b) = (byId(c).take(K), byId(r).take(K))
      assert(lc === a.length.toLong && lr === b.length.toLong, s"($c,$r) lens")
      assert(l === lcs(a, b), s"($c,$r) lcs")
      assert(l <= math.min(lc, lr), s"($c,$r) bound")
    }
    // the native expression is exact WITHOUT truncation as well: full-text
    // LCS on a sample of pairs vs the reference DP
    val sample = pairs.take(10).toDF("ca", "re")
    val full = sample
      .join(Tables.table(spark, sf0, "documents")
        .select(col("doc_id").as("ca"),
          graft.functions.TextFunctions.tokens(col("text")).as("a")), "ca")
      .join(Tables.table(spark, sf0, "documents")
        .select(col("doc_id").as("re"),
          graft.functions.TextFunctions.tokens(col("text")).as("b")), "re")
      .select(col("ca"), col("re"),
        graft.functions.TextFunctions.lcsLen(col("a"), col("b")).as("l"))
      .as[(Long, Long, Int)].collect()
    full.foreach { case (c, r, l) =>
      assert(l.toLong === lcs(byId(c), byId(r)), s"full ($c,$r)")
    }
  }

  test("q227: per-source conformal threshold + coverage, recomputed") {
    val docs = Tables.table(spark, sf0, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)].collect()
    val P = graft.operators.AuditPack
    val bySrc = docs.groupBy(_._2)
    val out = run("q227_conformal_threshold")
      .select("source", "n_cal", "k_rank", "qhat", "n_test", "n_covered",
        "coverage")
      .as[(String, Long, Long, Option[Double], Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out.nonEmpty)
    bySrc.foreach { case (src, rows) =>
      val (cal, tst) = rows.partition(r => hash32(s"cf:${r._1}") % 2 == 0)
      if (cal.isEmpty) assert(!out.contains(src))
      else {
        val n = cal.length.toLong
        val mean = cal.map(_._3).sum.toDouble / n
        def score(r: (Long, String, Long)): Long =
          math.floor(math.abs(r._3.toDouble - mean) * 1e6).toLong
        val k = ((n + 1) * P.ConfCovNum + (P.ConfCovDen - 1)) / P.ConfCovDen
        val sorted = cal.map(r => (score(r), r._1)).sorted
        val qv = if (k <= n) Some(sorted(k.toInt - 1)._1) else None
        val nCov = tst.count(r => qv.forall(score(r) <= _)).toLong
        val row = out(src)
        assert(row._2 === n, s"$src n_cal")
        assert(row._3 === k, s"$src k_rank")
        assert(row._4 === qv.map(_.toDouble / 1e6), s"$src qhat")
        assert(row._5 === tst.length.toLong, s"$src n_test")
        assert(row._6 === nCov, s"$src n_covered")
        val covExp = if (tst.isEmpty) None
          else Some(snap6(nCov.toDouble / tst.length))
        assert(row._7 === covExp, s"$src coverage")
      }
    }
  }

  test("conformal: k > n_cal yields q̂ = ∞ (null) and trivially-full coverage") {
    // a group so small its calibration half can't reach rank k, next to a
    // normal-sized group — the two conformal regimes side by side
    val ids = (0L until 40L) :+ 1000L :+ 1001L :+ 1002L
    val df = ids.toDF("id")
      .withColumn("grp", when(col("id") >= 1000L, "tiny").otherwise("big"))
      .withColumn("x", col("id") % 17 * 10 + 100)
    val out = graft.operators.Governance
      .conformalThreshold(df, "id", "grp", "x",
        graft.operators.AuditPack.ConfCovNum,
        graft.operators.AuditPack.ConfCovDen,
        graft.operators.AuditPack.ConfBins)
      .select("grp", "n_cal", "k_rank", "qhat", "n_test", "n_covered",
        "coverage")
      .as[(String, Long, Long, Option[Double], Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val tiny = out("tiny")
    assert(tiny._3 > tiny._2, "fixture must hit the k > n_cal regime")
    assert(tiny._4.isEmpty, "q̂ must be null (= +∞)")
    assert(tiny._6 === tiny._5, "infinite threshold covers every test row")
    val big = out("big")
    assert(big._3 <= big._2)
    assert(big._4.nonEmpty, "the big group has a finite threshold")
    assert(big._6 <= big._5)
  }

  test("q229: per-lang fertility equals a direct local recount") {
    val docs = Tables.table(spark, sf0, "documents")
      .select(col("lang"), col("text")).as[(String, String)].collect()
    val bpeRe = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]".r
    val expect = docs.groupBy(d => Option(d._1).getOrElse("")).map {
      case (lang, g) =>
        val bytes = g.map(_._2.getBytes("UTF-8").length.toLong).sum
        val ws = g.map(_._2.split("\\s+").count(_.nonEmpty).toLong).sum
        val bpe = g.map(d => bpeRe.findAllIn(d._2).length.toLong).sum
        lang -> ((g.length.toLong, bytes, ws, bpe))
    }
    val out = run("q229_tokenizer_fertility")
      .select("lang", "n_docs", "n_bytes", "ws_tokens", "bpe_tokens",
        "fertility", "bytes_per_token")
      .as[(String, Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect()
    assert(out.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap === expect)
    out.foreach { r =>
      assert(r._6 === Some(snap6(r._5.toDouble / r._4)), s"${r._1} fertility")
      assert(r._7 === Some(snap6(r._3.toDouble / r._5)), s"${r._1} bytes/tok")
      // a subword segmentation never yields fewer pieces than words
      assert(r._6.get >= 1.0, s"${r._1}: fertility below 1 is impossible")
    }
  }

  test("q230: secret screen equals a local token-rule recount") {
    val P = graft.operators.TextPack
    val docs = Tables.table(spark, sf0, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val runRe = "^[A-Za-z0-9_\\-]+$".r
    val expect = docs.flatMap { case (id, text) =>
      val planted = if (id % P.SecretPlantMod == 0)
        s"$text token sk_${md5hex(id.toString)}" else text
      val hits = planted.split("\\s+").filter(_.nonEmpty).filter { tok =>
        tok.length >= P.SecretMinLen &&
          runRe.findFirstIn(tok).isDefined &&
          tok.exists(_.isDigit) && tok.exists(_.isLetter) &&
          tok.distinct.length >= P.SecretMinDistinct
      }
      if (hits.isEmpty) None
      else Some(id -> ((hits.length.toLong, hits.map(_.length).max.toLong)))
    }.toMap
    val out = run("q230_secret_scan")
      .select("doc_id", "n_secrets", "max_len")
      .as[(Long, Long, Long)].collect()
    assert(out.map(r => r._1 -> ((r._2, r._3))).toMap === expect)
    // every planted credential is caught
    docs.map(_._1).filter(_ % P.SecretPlantMod == 0)
      .foreach(id => assert(expect.contains(id), s"planted doc $id missed"))
  }

  test("q231: DoReMi step equals a local replay; hard domains gain weight") {
    val M = graft.operators.MiningPack
    val docs = Tables.table(spark, sf0, "documents")
      .select(col("source"), col("text")).as[(String, String)].collect()
    val toks = docs.flatMap { case (src, t) =>
      t.split("\\s+").filter(_.nonEmpty).map(src -> _)
    }
    val vocab = toks.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (tok, cnt) => (-cnt, tok) }.take(M.VocabK)
      .map(_._1).toSet
    val bySrc = toks.groupBy(_._1)
    val nTotal = docs.length.toDouble
    val rows = bySrc.toSeq.map { case (src, ts) =>
      val nTok = ts.length.toLong
      val loss = snap6(ts.count(t => !vocab(t._2)).toDouble / nTok)
      val w0 = docs.count(_._1 == src) / nTotal
      val t = math.floor(w0 * math.exp(M.DoremiEta * loss) * M.DoremiScale)
        .toLong
      (src, nTok, loss, w0, t)
    }
    val tSum = rows.map(_._5).sum
    val expect = rows.map { case (src, nTok, loss, w0, t) =>
      src -> ((nTok, loss, snap6(w0), snap6(t.toDouble / tSum)))
    }.toMap
    val out = run("q231_doremi_step")
      .select("source", "n_tok", "loss", "w0", "w_new")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(out.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap === expect)
    // the EG step direction: sort by loss — relative weight w_new/w0 must
    // be non-decreasing in loss (harder domains gain, easier lose)
    val ratios = out.sortBy(_._3).map(r => r._5 / r._4)
    ratios.sliding(2).foreach { case Array(a, b) => assert(a <= b + 1e-9) }
    assert(math.abs(out.map(_._5).sum - 1.0) < 1e-4, "weights re-normalize")
  }

  test("q233: threshold sweep equals an all-pairs local recount") {
    val P = graft.operators.SimilarityPack
    val emb = loadEmb()
    val graded: Map[Long, Array[Double]] = emb ++ emb.collect {
      case (id, v) if id % 5 == 0 =>
        val d = P.SweepDeltas(((id / 5) % 3).toInt)
        val w = v.clone(); w(0) += d
        (id + P.PerturbOffset) -> w
    }
    val ids = graded.keys.toSeq.sorted
    val sims = for {
      ai <- ids.indices.iterator; bi <- (ai + 1 until ids.length).iterator
      s = sim4(graded(ids(ai)), graded(ids(bi)))
      if s >= P.SweepThresholds.min
    } yield (ids(ai), ids(bi), s)
    val qual = sims.toSeq
    val out = run("q233_neardup_sweep")
      .select("threshold", "n_pairs", "n_ids")
      .as[(Double, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === P.SweepThresholds)
    P.SweepThresholds.zip(out).foreach { case (t, (_, np, ni)) =>
      val hit = qual.filter(_._3 >= t)
      assert(np === hit.length.toLong, s"t=$t pairs")
      assert(ni === hit.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong,
        s"t=$t ids")
    }
    // the sweep must actually have a curve: strictly fewer pairs at the
    // tightest threshold than at the loosest (graded plants guarantee it)
    assert(out.head._2 > out.last._2,
      "graded fixture lost its intermediate-similarity plants")
  }

  test("q234: incremental dedup equals the batch run restricted to delta") {
    val off = graft.operators.DedupPack.CopyOffset
    def isDelta(id: Long) = id >= off || id % 10 == 0
    val batch = run("q31_minhash_lsh")
      .select("doc_a", "doc_b", "jaccard")
      .as[(Long, Long, Double)].collect()
      .filter(p => isDelta(p._1) || isDelta(p._2))
      .map(p => (p._1, p._2) -> p._3).toMap
    val inc = run("q234_delta_dedup")
      .select("doc_a", "doc_b", "jaccard", "pair_kind")
      .as[(Long, Long, Double, String)].collect()
    assert(inc.map(p => (p._1, p._2) -> p._3).toMap === batch,
      "incremental pairs must equal the batch run's delta-touching pairs")
    // no base×base pair can appear, and both routing kinds must occur
    inc.foreach { case (a, b, _, kind) =>
      assert(isDelta(a) || isDelta(b), s"base-base pair ($a,$b) leaked")
      val expect = if (isDelta(a) && isDelta(b)) "delta-delta" else "delta-base"
      assert(kind === expect, s"($a,$b) kind")
    }
    assert(inc.exists(_._4 == "delta-base") && inc.exists(_._4 == "delta-delta"),
      "fixture must exercise both pair kinds")
  }

  test("q235: FPS coreset equals the greedy local replay; radii shrink") {
    val P = graft.operators.SimilarityPack
    val emb = loadEmb()
    val ids = emb.keys.toSeq.sorted
    var centers = Vector(ids.head)
    var radii = Vector.empty[Double]
    while (centers.length < P.CoresetK) {
      val (nid, smax) = ids
        .map(id => id -> centers.map(c => sim4(emb(id), emb(c))).max)
        .minBy { case (id, s) => (s, id) }
      centers :+= nid
      radii :+= 1.0 - smax
    }
    val out = run("q235_fps_coreset")
      .select("step", "center_id", "radius")
      .as[(Int, Long, Option[Double])].collect().sortBy(_._1)
    assert(out.map(_._2).toVector === centers)
    assert(out.head._3.isEmpty)
    val gotRadii = out.tail.map(_._3.get).toVector
    gotRadii.zip(radii).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-12, s"radius $g vs $e")
    }
    // FPS invariant: the covering radius never grows as centers are added
    gotRadii.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-12, "radii must be non-increasing")
      case _ =>
    }
    // and the selected centers are genuinely spread: all pairwise sims of
    // chosen centers stay below the first radius complement
    for (a <- centers; b <- centers if a < b)
      assert(sim4(emb(a), emb(b)) <= 1.0 - gotRadii.last + 1e-12,
        s"centers $a,$b too close for a valid FPS run")
  }

  test("q236: epoch-value plan equals a local replay; decay caps value") {
    val L = graft.operators.LifecyclePack
    val docs = Tables.table(spark, sf0, "documents")
      .select(col("source"), col("text")).as[(String, String)].collect()
    val bySrc = docs.groupBy(_._1)
    def nToks(t: String) = t.split("\\s+").count(_.nonEmpty).toLong
    val per = bySrc.map { case (src, g) =>
      val uniq = g.map(_._2).distinct // no exact dups expected, but mirror
      src -> ((g.length.toLong, uniq.length.toLong, uniq.map(nToks).sum))
    }
    val totalU = per.values.map(_._3).sum
    val totalDocs = per.values.map(_._1).sum
    val out = run("q236_epoch_value_plan")
      .select("source", "n_docs", "n_uniq_docs", "u_toks", "alloc_toks",
        "epochs", "eff_toks", "utilization")
      .as[(String, Long, Long, Long, Long, Double, Long, Option[Double])]
      .collect()
    assert(out.length === per.size)
    out.foreach { case (src, nd, nu, u, alloc, epochs, eff, util) =>
      val (eNd, eNu, eU) = per(src)
      assert(nd === eNd && nu === eNu && u === eU, s"$src counts")
      assert(alloc === L.EpochBudgetX * totalU * eNd / totalDocs, s"$src alloc")
      val er = alloc.toDouble / u
      assert(epochs === snap6(er), s"$src epochs")
      val f = math.min(math.floor(er).toLong, L.EpochCap)
      val frac = if (f >= L.EpochCap) 0.0 else er - f
      val expectEff = u * ((1.0 - math.pow(L.EpochDecay, f.toDouble))
        / (1.0 - L.EpochDecay) + frac * math.pow(L.EpochDecay, f.toDouble))
      assert(eff === math.floor(expectEff).toLong, s"$src eff")
      // diminishing returns: effective never exceeds the geometric ceiling
      // 2u, and utilization of a multi-epoch source is strictly below 1
      assert(eff <= 2 * u, s"$src exceeds the δ=0.5 value ceiling")
      if (er > 1.0) assert(util.exists(_ < 1.0), s"$src utilization")
    }
  }

  test("q237: planted-relevance retrieval eval equals a local BM25 replay") {
    val S = graft.operators.SearchPack
    val docs = Tables.table(spark, sf0, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    case class Chunk(cid: Long, doc: Long, idx: Long, toks: Seq[String])
    val chunks = docs.flatMap { case (id, text) =>
      val toks = text.split(" ").toSeq
      (0 until toks.length by S.RagStride).zipWithIndex.map { case (st, i) =>
        Chunk(id * 1000 + i, id, i, toks.slice(st, st + S.RagWindow))
      }
    }
    val spanEnd = S.RagSpanStart + S.RagSpanLen - 1
    val queries = chunks.filter(c => c.doc % S.RagQMod == 0 && c.idx == 1 &&
      c.toks.length >= spanEnd)
      .map(c => c.cid -> c.toks.slice(S.RagSpanStart - 1, spanEnd).distinct)
    val allTerms = queries.flatMap(_._2).toSet
    val tf = chunks.flatMap(c => c.toks.filter(allTerms)
      .groupBy(identity).map { case (t, g) => (c.cid, t, g.size.toLong) })
    val df = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val dl = chunks.map(c => c.cid -> c.toks.length.toLong).toMap
    val n = chunks.length.toLong
    val sumDl = dl.values.sum
    def wt(tfv: Long, dfv: Long, dlv: Long): Double =
      math.log(1.0 + (n.toDouble - dfv + 0.5) / (dfv + 0.5)) *
        (tfv * (graft.operators.Search.K1 + 1.0)) /
        (tfv + graft.operators.Search.K1 * (1.0 - graft.operators.Search.B +
          graft.operators.Search.B * dlv / (sumDl.toDouble / n)))
    val ranks = queries.map { case (qid, terms) =>
      val scores = tf.filter(p => terms.contains(p._2))
        .groupBy(_._1).view.mapValues(g =>
          g.map(p => math.round(wt(p._3, df(p._2), dl(p._1)) * 1e6)).sum)
      val top = scores.toSeq.sortBy { case (cid, s) => (-s, cid) }
        .take(S.RagTopK).map(_._1)
      val i = top.indexOf(qid)
      if (i < 0) 0L else i + 1L
    }
    val out = run("q237_retrieval_eval")
      .select("n_queries", "hit1", "hit5", "mrr")
      .as[(Long, Double, Double, Double)].head()
    assert(out._1 === ranks.length.toLong)
    assert(out._2 === snap6(ranks.count(_ == 1L).toDouble / ranks.length))
    assert(out._3 === snap6(
      ranks.count(r => r >= 1 && r <= 5).toDouble / ranks.length))
    val rrE6 = ranks.filter(_ >= 1L).map(1000000L / _).sum
    assert(out._4 === snap6(rrE6.toDouble / 1e6 / ranks.length))
    // the planted span must be findable at all: a majority of queries
    // retrieve their source chunk inside the top 10
    assert(ranks.count(_ >= 1).toDouble / ranks.length > 0.5)
  }

  test("q228: confident-learning matrix equals the local re-derivation") {
    val rows = Tables.table(spark, sf0, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
      .as[(Long, Int, Array[Double])].collect()
    val dim = rows.head._3.length
    // fixed-point component-sum centroids (q166 trick)
    val cent: Map[Int, Array[Double]] = rows.groupBy(_._2).map { case (l, g) =>
      val cv = Array.tabulate(dim) { i =>
        g.map(r => math.floor(r._3(i) * 1e6).toLong).sum.toDouble
      }
      l -> cv
    }
    def simE4(v: Array[Double], cv: Array[Double]): Long = {
      val den = math.sqrt(dot(v, v)) * math.sqrt(dot(cv, cv))
      math.floor(dot(v, cv) / den * 1e4).toLong
    }
    val scored = for (r <- rows; (j, cv) <- cent.toSeq)
      yield (r._1, r._2, j, simE4(r._3, cv))
    val thr = scored.filter(s => s._2 == s._3).groupBy(_._3).map {
      case (j, g) => j -> (g.length.toLong, g.map(_._4).sum)
    }
    val pred = scored
      .filter(s => thr.get(s._3).exists { case (nj, sj) => s._4 * nj >= sj })
      .groupBy(s => (s._1, s._2)).toSeq.map { case ((_, noisy), g) =>
        val best = g.minBy(s => (-s._4, s._3))._3
        (noisy, best)
      }
    val expect = pred.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = run("q228_label_noise")
      .select("noisy_label", "pred_label", "n")
      .as[(Int, Int, Long)].collect()
    assert(out.map(r => (r._1, r._2) -> r._3).toMap === expect)
    // every labeled row that is confident in >= 1 class appears exactly once
    assert(out.map(_._3).sum === pred.size.toLong)
  }
}
