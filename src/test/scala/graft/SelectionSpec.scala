package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.{CorpusOps, Selection}

/** Unit behavior of the data-selection operators (Selection +
  * CorpusOps.paragraphDedup/packSequences); cross-engine exactness is
  * covered by the SelectionPack oracles. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("paragraphDedup: first occurrence wins corpus-wide, docs reconstruct in order") {
    // doc 1 and 2 share paragraph "a b"; doc 2 repeats its own "c d"
    val docs = Seq(
      (1L, "a b x y"),
      (2L, "a b c d c d"),
      (3L, "z z")).toDF("doc_id", "text")
    val out = CorpusOps.paragraphDedup(docs, "doc_id", "text", paraTokens = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 2L, "a b x y"),  // both paragraphs are first occurrences
      (2L, 3L, 1L, "c d"),      // "a b" lost to doc 1; "c d" kept once
      (3L, 1L, 1L, "z z")))
  }

  test("paragraphDedup: within-doc repeats collapse too (first index wins)") {
    val docs = Seq((7L, "p q p q")).toDF("doc_id", "text")
    val out = CorpusOps.paragraphDedup(docs, "doc_id", "text", paraTokens = 2)
      .as[(Long, Long, Long, String)].head()
    assert(out === ((7L, 2L, 1L, "p q")))
  }

  test("packSequences matches the naive global cumulative sum") {
    val docs = (0L until 300L).map(i => (i * 3, s"t ${"w " * (i % 17).toInt}".trim))
      .toDF("doc_id", "text")
    val fast = CorpusOps.packSequences(docs, "doc_id", "text",
        budget = 50, blockSize = 64)
      .orderBy("id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    // naive: one global window (the scale-killer shape, fine for a test)
    val w = org.apache.spark.sql.expressions.Window.orderBy("id")
      .rowsBetween(Long.MinValue, 0)
    val naive = docs.select(col("doc_id").as("id"),
        TextFunctions.tokenStats(col("text")).getField("ws_tokens")
          .cast("long").as("n_toks"))
      .withColumn("cum_before", sum("n_toks").over(w) - col("n_toks"))
      .withColumn("seq_id", floor(col("cum_before") / 50).cast("long"))
      .withColumn("seq_offset", col("cum_before") % 50)
      .orderBy("id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(fast === naive)
  }

  test("domainCap keeps exactly cap best rows per domain; plan uses WindowGroupLimit") {
    val df = (1 to 100).map(i => (i.toLong, s"d${i % 4}", (i % 10).toDouble))
      .toDF("id", "dom", "score")
    val capped = Selection.domainCap(df, "dom",
      Seq(col("score").desc, col("id")), cap = 5)
    assert(capped.count() === 20)
    val perDom = capped.groupBy("dom").agg(count(lit(1)).as("n"),
      min("score").as("worst")).as[(String, Long, Double)].collect()
    perDom.foreach { case (_, n, worst) =>
      assert(n === 5L)
      assert(worst >= 8.0, s"cap must keep the best scores, worst kept = $worst")
    }
    // the rank-limit must push a partial top-k below the exchange
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("crossDedup drops content present in the reference, ignoring layout/whitespace") {
    val ref = Seq((1L, "Hello  World"), (2L, "unique ref")).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "hello world"),      // normalized dup of ref 1
      (11L, "brand new doc"),
      (12L, "HELLO   WORLD ")    // also a normalized dup
    ).toDF("doc_id", "text")
    val kept = Selection.crossDedup(fresh, ref).select("doc_id")
      .as[Long].collect().toSeq
    assert(kept === Seq(11L))
  }

  test("ngramRepetition flags repetitive docs and clean docs correctly") {
    val docs = Seq(
      (1L, "spam spam spam spam"),       // one token dominates; all bigrams dup
      (2L, "a b c d e f")                // no repetition at all
    ).toDF("doc_id", "text")
    val out = Selection.ngramRepetition(docs, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Double, Double, Double)].collect()
    val (_, n1, top1, d2a, d3a) = out(0)
    assert(n1 === 4L && top1 === 1.0 && d2a === 1.0 && d3a === 1.0)
    val (_, n2, top2, d2b, d3b) = out(1)
    assert(n2 === 6L && top2 === round6(1.0 / 6) && d2b === 0.0 && d3b === 0.0)
  }

  test("dsirWeights: target-like docs score above off-target docs; layout-stable") {
    val target = (1L to 40L).map(i => (i, "alpha beta gamma", true))
    val other = (41L to 80L).map(i => (i, "delta epsilon zeta", true))
    val docs = (target ++ other).map { case (i, t, _) => (i, t) }
      .toDF("doc_id", "text")
    val scored = Selection.dsirWeights(docs, "doc_id", "text", col("doc_id") <= 40)
    val byDoc = scored.as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(byDoc(1L)._1 > byDoc(41L)._1,
      "docs made of target-domain tokens must outscore off-target docs")
    assert(byDoc(1L)._2 && !byDoc(41L)._2)
    // layout independence (DECIMAL sum of rounded per-token ratios)
    val again = Selection.dsirWeights(docs.repartition(7), "doc_id", "text",
      col("doc_id") <= 40).as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(byDoc.map { case (k, v) => k -> v._1 } === again)
  }

  test("postingLists: sorted postings, df band enforced, per-doc dups collapse") {
    val docs = Seq(
      (3L, "x x common"),     // "x" twice in one doc -> df counts the doc once
      (1L, "common x"),
      (2L, "common rare")).toDF("doc_id", "text")
    val out = Selection.postingLists(docs, "doc_id",
        TextFunctions.tokens(col("text")), minDf = 2, maxDf = 3)
      .orderBy("term")
      .as[(String, Long, Seq[Long])].collect().toSeq
    assert(out === Seq(
      ("common", 3L, Seq(1L, 2L, 3L)),
      ("x", 2L, Seq(1L, 3L))))
  }

  test("qualityLogit: bounded in (0,1), 0 for empty, monotone in stopword signal") {
    val sw = Seq("the", "a", "of")
    val rows = Seq(
      ("empty", ""),
      ("stopless", "xyzzy qwerty asdf ghjk"),
      ("stoppy", "the cat of a hat the end of a tale"))
      .toDF("k", "text")
      .select(col("k"), Selection.qualityLogit(col("text"), sw).as("s"))
      .as[(String, Double)].collect().toMap
    assert(rows("empty") === 0.0)
    assert(rows("stopless") > 0.0 && rows("stopless") < 1.0)
    assert(rows("stoppy") > rows("stopless"),
      "stopword-bearing natural text must outscore keyboard mash")
  }

  test("budgetSelect keeps the best-score prefix that fits whole, matches naive") {
    val docs = (1L to 200L).map(i => (i, ("w " * (5 + (i % 11)).toInt).trim))
      .toDF("doc_id", "text")
    // score descending in id for a known order: score = 1 - id/1000
    val score = lit(1.0) - col("doc_id") / 1000.0
    val kept = operators.Selection.budgetSelect(docs, "doc_id", "text",
        score, budget = 300, scoreBlocks = 64)
      .orderBy("id").as[(Long, Double, Long, Long)].collect().toSeq
    // naive check: ids ascending are score-descending; accumulate
    var cum = 0L
    val expect = (1L to 200L).flatMap { i =>
      val n = 5 + (i % 11)
      val keep = cum + n <= 300
      val row = if (keep) Some((i, 1.0 - i / 1000.0, n, cum)) else None
      if (keep) cum += n
      row
    }
    assert(kept.map(r => (r._1, r._3, r._4)) === expect.map(r => (r._1, r._3, r._4)))
    assert(kept.map(_._2) === expect.map(_._2))
    // every kept doc fits wholly inside the budget
    kept.foreach { case (_, _, n, cb) => assert(cb + n <= 300) }
  }

  test("bestOfGroup picks the highest score, smallest id on ties") {
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "comp")
    val scored = Seq((1L, 0.2), (2L, 0.9), (3L, 0.9), (10L, 0.5), (11L, 0.5))
      .toDF("doc_id", "q")
    val out = operators.Selection.bestOfGroup(comps, scored, "doc_id", "q")
      .orderBy("component").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 3L, 2L, 0.9),    // 2 and 3 tie on 0.9 -> smaller id wins
      (10L, 2L, 10L, 0.5)))
  }

  test("allPairsContainment: a planted excerpt has containment 1.0 vs its source") {
    val src = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, src),
      (2L, "alpha beta gamma delta epsilon"),  // prefix excerpt of 1
      (3L, "totally unrelated words here now")).toDF("doc_id", "text")
    val sh = operators.Dedup.shingles(docs, n = 3)
    val pairs = operators.Dedup.allPairsContainment(sh)
      .select("doc_a", "doc_b", "containment_a", "containment_b")
      .as[(Long, Long, Double, Double)]
    val row = pairs.filter(r => r._1 == 1L && r._2 == 2L).head()
    assert(row._4 === 1.0, "excerpt-side containment must be exactly 1.0")
    assert(row._3 < 0.5, "source-side containment stays low")
    assert(pairs.filter(r => r._2 == 3L || r._1 == 3L).isEmpty,
      "no shared shingle -> pair absent")
  }

  test("blockedPrefixSum: the only unpartitioned window runs over block totals, not rows") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val docs = (0L until 500L).map(i => (i, "w w w")).toDF("doc_id", "text")
    val out = CorpusOps.packSequences(docs, "doc_id", "text",
      budget = 10, blockSize = 64)
    // sparkPlan, not executedPlan: AQE's adaptive wrapper hides the tree
    // from collect() until execution
    val wins = out.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty, "expected window operators in the plan")
    val global = wins.filter(_.partitionSpec.isEmpty)
    assert(global.nonEmpty, "expected the block-offset global window")
    global.foreach { g =>
      assert(g.collectLeaves().nonEmpty)
      val aggBelow = g.collect { case a: BaseAggregateExec => a }
      assert(aggBelow.nonEmpty,
        "the single-partition window must consume AGGREGATED block totals — " +
          "an unpartitioned window over raw rows is the scale-killer this " +
          "operator exists to avoid")
    }
    // and the per-row cumulative window is partitioned (parallel)
    assert(wins.exists(_.partitionSpec.nonEmpty))
  }

  test("blockedPrefixSum: rows tied on the order key still form a valid exclusive prefix chain") {
    // With the default RANGE frame both tied rows would absorb each other's
    // value (cum_before 7 and 5 — no total order produces that); the ROWS
    // frame guarantees a prefix chain consistent with SOME linear order.
    val df = Seq((1L, 0.5, 5L), (2L, 0.5, 7L), (3L, 0.9, 2L))
      .toDF("id", "score", "n")
    val out = CorpusOps.blockedPrefixSum(df, lit(0L),
        Seq(col("score").desc), col("n"))
      .select(col("id"), col("n"), col("cum_before"))
      .as[(Long, Long, Long)].collect().toSeq
    var running = 0L
    out.sortBy(_._3).foreach { case (_, n, cb) =>
      assert(cb === running, s"cum_before chain broken at $out")
      running += n
    }
    assert(running === 14L)
  }

  test("simhashNearDup: identical docs pair at Hamming 0; distinct-vocab docs don't pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // identical -> hamming 0
      (3L, "qq ww ee rr tt yy uu ii oo pp")        // disjoint vocabulary
    ).toDF("doc_id", "text")
    val pairs = operators.Dedup.simhashNearDup(docs, maxHamming = 3,
        bands = 4, bits = 32)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.contains((1L, 2L, 0)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "a disjoint-vocabulary doc must not pair within Hamming 3")
    // guardrail: recall guarantee requires maxHamming <= bands - 1
    intercept[IllegalArgumentException] {
      operators.Dedup.simhashNearDup(docs, maxHamming = 4, bands = 4)
    }
  }

  test("mixKept (q100 capstone): dedup keeper, per-source cap, and token budget all hold on the kept set") {
    import graft.operators.SelectionPack
    val d = graft.sources.Tables.table(spark, sf0, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    // same re-crawl frame as q100: every 9th doc has an identical copy
    val frame = d.unionAll(d.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + SelectionPack.MixCopyOffset).as("doc_id"),
        col("source"), col("text")))
    val kept = SelectionPack.mixKept(frame)
    val ids = kept.select("id").as[Long].collect().toSeq
    assert(ids.nonEmpty)
    // 1. exact dedup keeps the min-id member: a re-crawl copy is identical
    //    to its original, so no copy id may survive
    assert(!ids.exists(_ >= SelectionPack.MixCopyOffset),
      "an identical re-crawl copy survived dedup over its min-id original")
    // 2. no duplicate content among keepers (corpus-wide, not just copies)
    val hashes = frame.join(kept.select(col("id").as("doc_id")), "doc_id")
      .select(graft.operators.Dedup.contentHash(col("text")))
      .as[String].collect().toSeq
    assert(hashes.distinct.size === hashes.size, "duplicate content kept")
    // 3. per-source cap binds: no source exceeds CapPerSource keepers
    val bySource = frame.join(kept.select(col("id").as("doc_id")), "doc_id")
      .groupBy("source").count().as[(String, Long)].collect()
    assert(bySource.forall(_._2 <= SelectionPack.CapPerSource),
      s"source over cap: ${bySource.filter(_._2 > SelectionPack.CapPerSource).toSeq}")
    // 4. the token budget is a hard ceiling AND binds (some doc was cut)
    val total = kept.agg(sum(col("n_toks"))).as[Long].head()
    assert(total <= SelectionPack.MixBudget)
    assert(ids.size < frame.select("doc_id").distinct().count(),
      "budget/cap cut nothing — the capstone knobs no longer bind at sf0.001")
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
