package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextPack

/** Independent re-derivations of the round-6 contract queries on sf0.001:
  * each test recomputes the expected values from raw data with plain Scala
  * (a DIFFERENT code path from both the Spark plan and its DuckDB twin, so
  * a formula bug shared by query and oracle still gets caught). */
class Round6OpsSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0)

  test("q213: FIM part lengths partition the doc; deterministic re-run") {
    val rows = run("q213_fim_split")
      .select("doc_id", "n_chars", "p_len", "m_len", "s_len", "psm_hash")
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, p, m, s, _) =>
      assert(p + m + s === n, s"doc $id")
      assert(p >= 0 && m >= 0 && s >= 0, s"doc $id")
    }
    val again = run("q213_fim_split")
      .select("doc_id", "psm_hash").as[(Long, String)].collect().toMap
    rows.foreach { case (id, _, _, _, _, h) => assert(again(id) === h) }
    // the PSM reassembly must hash the actual text parts: check one doc
    // by hand against the raw table
    val (id, _, p, m, _, h) = rows.head
    val text = graft.sources.Tables.table(spark, sf0, "documents")
      .filter(col("doc_id") === id).select("text").as[String].head()
    val (lo, hi) = (p.toInt, (p + m).toInt)
    val psm = "<PRE>" + text.substring(0, lo) + "<SUF>" + text.substring(hi) +
      "<MID>" + text.substring(lo, hi)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(psm.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md.take(8) === h)
  }

  test("q214: closed-form diversity equals brute-force pairwise mean") {
    val vecs = graft.sources.Tables.table(spark, sf0, "embeddings")
      .select(col("label"), col("embedding").cast("array<double>"))
      .as[(Int, Array[Double])].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val out = run("q214_semantic_diversity")
      .select("label", "n", "diversity").as[(Int, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (label, n, div) =>
      val xs = vecs(label)
      assert(xs.length.toLong === n)
      // brute force: mean over ALL ordered pairs (i != j) of ||x - y||^2
      var sum = 0.0
      for (a <- xs; b <- xs)
        sum += a.zip(b).map { case (u, v) => (u - v) * (u - v) }.sum
      val brute = sum / (xs.length.toDouble * xs.length)
      // closed form divides by n^2 (includes the zero self-pairs), same
      // as the ordered-pair brute force above
      assert(math.abs(div - brute) < 1e-4, s"label $label: $div vs $brute")
    }
  }

  test("q215: hit rate equals distinct-prefix accounting, recomputed") {
    val toks = graft.sources.Tables.table(spark, sf0, "documents")
      .select(TextFunctions.tokens(col("text"))).as[Seq[String]].collect()
    val out = run("q215_prefix_blocks")
      .select("block_len", "n_docs", "n_blocks", "n_shared_docs", "hit_rate")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.length === graft.operators.DedupPack.PrefixBlockSizes.length)
    out.foreach { case (b, nDocs, nBlocks, nShared, hit) =>
      val prefixes = toks.filter(_.length >= b).map(_.take(b.toInt).mkString(" "))
      assert(prefixes.length.toLong === nDocs, s"B=$b")
      assert(prefixes.distinct.length.toLong === nBlocks, s"B=$b")
      val counts = prefixes.groupBy(identity).values.map(_.size)
      assert(counts.filter(_ >= 2).sum.toLong === nShared, s"B=$b")
      val expect = (nDocs - nBlocks).toDouble / nDocs
      assert(math.abs(hit - expect) < 1e-6, s"B=$b")
    }
  }

  test("q216: advantages are the group z-scores of the rewards") {
    val rewards = graft.sources.Tables.table(spark, sf0, "documents")
      .select(col("source"), col("lang"), col("doc_id"),
        graft.functions.Portable.snap6(
          TextFunctions.qualityScore(col("text"), TextPack.stopwords))
          .as("r"))
      .as[(String, String, Long, Double)].collect()
    val byGroup = rewards.groupBy(t => (t._1, t._2))
    val out = run("q216_grpo_advantage")
      .select("source", "lang", "doc_id", "reward", "advantage")
      .as[(String, String, Long, Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (src, lang, id, r, adv) =>
      assert(id % 13 === 0)
      val grp = byGroup((src, lang)).map(_._4)
      val mean = grp.sum / grp.length
      val varP = grp.map(x => (x - mean) * (x - mean)).sum / grp.length
      val expect =
        if (grp.distinct.length <= 1) 0.0
        else (r - mean) / math.sqrt(varP)
      assert(math.abs(adv - expect) < 1e-4,
        s"($src,$lang,$id): $adv vs $expect")
    }
  }

  test("q217: ECE re-derived from per-doc confidence and outcome") {
    val perDoc = graft.sources.Tables.table(spark, sf0, "documents")
      .select(
        round(graft.operators.Selection.qualityLogit(
          col("text"), TextPack.stopwords), 6).as("conf"),
        (size(TextFunctions.tokens(col("text"))) >=
          graft.operators.AuditPack.EceMinToks).as("y"))
      .as[(Double, Boolean)].collect()
    val bins = perDoc.groupBy { case (c, _) => math.min(9, (c * 10).toInt) }
    val n = perDoc.length.toDouble
    val expectEce = bins.values.map { rows =>
      val conf = rows.map(_._1).sum / rows.length
      val acc = rows.count(_._2).toDouble / rows.length
      rows.length / n * math.abs(acc - conf)
    }.sum
    val out = run("q217_calibration_ece")
      .select("bin", "n", "acc", "ece").as[(Int, Long, Double, Double)]
      .collect()
    assert(out.map(_._2).sum === perDoc.length.toLong)
    out.foreach { case (bin, nb, acc, ece) =>
      val rows = bins(bin)
      assert(rows.length.toLong === nb, s"bin $bin")
      assert(math.abs(acc - rows.count(_._2).toDouble / rows.length) < 1e-6)
      assert(math.abs(ece - expectEce) < 1e-4)
    }
  }

  test("q219: distinct-n ratios re-derived from raw tokens") {
    val toks = graft.sources.Tables.table(spark, sf0, "documents")
      .select(TextFunctions.tokens(col("text"))).as[Seq[String]].collect()
    val out = run("q219_distinct_ngrams")
      .select("n", "n_grams", "n_distinct").as[(Int, Long, Long)].collect()
    assert(out.map(_._1).sorted.toSeq === TextPack.DiversityNs)
    out.foreach { case (n, total, distinct) =>
      val grams = toks.flatMap(_.sliding(n).filter(_.length == n)
        .map(_.mkString(" ")))
      assert(grams.length.toLong === total, s"n=$n total")
      assert(grams.distinct.length.toLong === distinct, s"n=$n distinct")
    }
  }

  test("q220: Kneser-Ney cross-entropy re-derived from bigram counts") {
    val toks = graft.sources.Tables.table(spark, sf0, "documents")
      .select(TextFunctions.tokens(col("text"))).as[Seq[String]].collect()
    val bigrams = toks.flatMap(_.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1))))
    val c2 = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1f = c2.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1b = c2.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val types = c2.size.toDouble
    val d = TextPack.KnD
    val xent = c2.map { case ((v, w), c) =>
      val p = (math.max(c - d, 0.0) + d * n1f(v) * n1b(w) / types) / c1(v)
      c * (-math.log(p) / math.log(2.0))
    }.sum / bigrams.length
    val out = run("q220_kn_bigram")
      .select("n_bigrams", "n_types", "xent_bits")
      .as[(Long, Long, Double)].head()
    assert(out._1 === bigrams.length.toLong)
    assert(out._2 === c2.size.toLong)
    assert(math.abs(out._3 - xent) < 1e-3, s"${out._3} vs $xent")
    // KN must beat (or match) the add-one q87 LM on corpus average —
    // the reason to have it: sanity that smoothing isn't degenerate
    assert(out._3 > 0.0 && out._3 < math.log(types) / math.log(2.0) + 8)
  }

  test("q221: systematic resample draws exactly k copies, replayed") {
    val weights = graft.sources.Tables.table(spark, sf0, "documents")
      .select(col("doc_id"),
        round((graft.functions.Portable.snap6(TextFunctions.qualityScore(
          col("text"), TextPack.stopwords) + lit(0.01))) * 1e6, 0)
          .cast("long").as("wm"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val out = run("q221_sir_resample")
      .select("doc_id", "copies").as[(Long, Long)].collect().toMap
    val k = graft.operators.SelectionPack.SirK
    assert(out.values.sum === k.toLong)
    // replay: walk the cumulative axis with the u_j = (j-1/2)W/k grid
    val tw = weights.map(_._2).sum
    var cum = 0L
    weights.foreach { case (id, wm) =>
      val hi = (2L * k * (cum + wm) + tw) / (2L * tw)
      val lo = (2L * k * cum + tw) / (2L * tw)
      val copies = hi - lo
      assert(out.getOrElse(id, 0L) === copies, s"doc $id")
      cum += wm
    }
  }

  test("q222: MI/entropies re-derived from the contingency table") {
    val rows = graft.sources.Tables.table(spark, sf0, "documents")
      .select(col("source"),
        least(lit(9), floor(round(graft.operators.Selection.qualityLogit(
          col("text"), TextPack.stopwords), 6) * 10)).cast("int").as("b"))
      .as[(String, Int)].collect()
    val n = rows.length.toDouble
    val cells = rows.groupBy(identity).view.mapValues(_.size).toMap
    val ms = rows.groupBy(_._1).view.mapValues(_.size).toMap
    val mb = rows.groupBy(_._2).view.mapValues(_.size).toMap
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val mi = cells.map { case ((s, b), c) =>
      c / n * lg2(c * n / (ms(s).toDouble * mb(b))) }.sum
    val hs = ms.values.map(c => -(c / n) * lg2(c / n)).sum
    val hb = mb.values.map(c => -(c / n) * lg2(c / n)).sum
    val out = run("q222_mutual_info")
      .select("n_cells", "mi_bits", "h_source_bits", "h_bucket_bits", "nmi")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(out._1 === cells.size.toLong)
    assert(math.abs(out._2 - mi) < 1e-4)
    assert(math.abs(out._3 - hs) < 1e-4)
    assert(math.abs(out._4 - hb) < 1e-4)
    assert(math.abs(out._5 - mi / math.min(hs, hb)) < 1e-3)
    // information inequalities the aggregate must respect
    assert(out._2 >= 0.0 && out._2 <= math.min(out._3, out._4) + 1e-6)
  }

  test("q223: nprobe=1 equals ivfTopK; recall is monotone; max probes ⊇ fewer") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.table(spark, sf0, "embeddings")
    val corpus = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val qs = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "id").as[(Long, Long)].collect().toSet
    val single = ids(Similarity.ivfTopK(corpus, qs, cents, 5))
    val probe1 = ids(Similarity.ivfTopKMultiProbe(corpus, qs, cents, 5, 1))
    assert(probe1 === single)
    val out = run("q223_ivf_nprobe_sweep")
      .select("nprobe", "recall").as[(Long, Double)].collect()
      .sortBy(_._1).map(_._2).toSeq
    assert(out === out.sorted, s"recall must be monotone in nprobe: $out")
    // probing every bucket = exact search (8 centroids, nprobe=8)
    val all = ids(Similarity.ivfTopKMultiProbe(corpus, qs, cents, 5, 8))
    val exact = ids(Similarity.bruteForceTopK(corpus, qs, 5))
    assert(all === exact)
  }

  test("q224: every planted duplicate resolves to one golden record") {
    import graft.operators.FuzzyPack._
    val cust = graft.sources.Tables.table(spark, sf0, "customer")
    val planted = cust.filter(col("c_custkey") % GoldenMod === 0)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    val out = run("q224_golden_record")
      .select("component", "n_members", "golden_name", "segment",
        "min_id", "max_id")
      .as[(Long, Long, String, String, Long, Long)].collect().sortBy(_._1)
    // at sf0.001 no organic (same-cents, name-distance-1) pair exists, so
    // the components are EXACTLY the planted (original, typo-copy) pairs
    assert(out.length === planted.length)
    out.zip(planted).foreach { case ((comp, n, name, seg, lo, hi),
                                     (id, cname, cseg)) =>
      assert(comp === id)
      assert(n === 2L)
      assert(name === cname, "survivorship: the shortest (original) name")
      assert(seg === cseg, "survivorship: segment recovered from original")
      assert(lo === id && hi === id + GoldenOffset)
    }
  }

  test("q218: per-dimension mean/std match a direct computation") {
    val vecs = graft.sources.Tables.table(spark, sf0, "embeddings")
      .select(col("embedding").cast("array<double>"))
      .as[Array[Double]].collect()
    val out = run("q218_embed_standardize")
      .select("dim", "n", "mean", "std").as[(Long, Long, Double, Double)]
      .collect()
    assert(out.length === 64)
    out.foreach { case (dim, n, mean, std) =>
      val xs = vecs.map(_(dim.toInt - 1))
      assert(xs.length.toLong === n)
      val m = xs.sum / xs.length
      val s = math.sqrt(xs.map(x => (x - m) * (x - m)).sum / xs.length)
      assert(math.abs(mean - m) < 1e-5, s"dim $dim")
      assert(math.abs(std - s) < 1e-5, s"dim $dim")
    }
  }
}
