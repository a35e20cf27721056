package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Augment

/** Unit semantics of the training-example construction operators and the
  * Unicode fold kernel; cross-engine exactness is covered by the
  * AugmentPack oracles (q130/q131). */
class AugmentSpec extends SparkSpec {
  import spark.implicits._

  // ---- BPE ----------------------------------------------------------------

  test("bpeLearn: classic merge sequence on a crafted corpus") {
    // vocab: aaab ×2 -> [a,a,a,b,</w>], ab ×1 -> [a,b,</w>]
    // round 1: (a,a) freq 4   round 2: (a,b) freq 3 beats (b,</w>) on tie
    // round 3: (ab,</w>) freq 3
    val docs = Seq("aaab aaab ab").toDF("text")
    val m = Augment.bpeLearn(docs, "text", rounds = 3)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(m === Seq(
      (1, "a", "a", "aa", 4L),
      (2, "a", "b", "ab", 3L),
      (3, "ab", "</w>", "ab</w>", 3L)))
  }

  test("bpeLearn: greedy merge is non-overlapping left-to-right") {
    // [a,a,a,</w>] carries TWO (a,a) pair occurrences (freq counts
    // overlaps: 2 words × 2 = 4) but the merge rewrites each word
    // greedily left-to-right to [aa,a,</w>] — NOT [aa,aa,</w>]. Round 2
    // then sees (aa,a) and (a,</w>) tied at 2; the lexicographic
    // tie-break picks (a,</w>) ("a" < "aa"). An overlapping merge would
    // surface (aa,aa)/(aa,</w>) here instead.
    val docs = Seq("aaa aaa").toDF("text")
    val m = Augment.bpeLearn(docs, "text", rounds = 2)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(m.head === ((1, "a", "a", "aa", 4L)))
    assert(m(1) === ((2, "a", "</w>", "a</w>", 2L)))
  }

  test("bpeLearn: local and distributed paths return identical rules") {
    val docs = Seq("low lower lowest low low newest new")
      .toDF("text")
    val local = Augment.bpeLearn(docs, "text", rounds = 6)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    val dist = Augment.bpeLearn(docs, "text", rounds = 6, maxLocalBytes = 0L)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(local === dist)
    assert(local.size === 6)
  }

  test("bpeLearn: local-path budget is bytes and the boundary is exact") {
    // 5 distinct words, 24 chars total — the footprint estimator is the
    // single decision input, so a budget of exactly the footprint stays
    // local and one byte less falls back to the distributed loop; both
    // must return identical rules (path choice is invisible in results)
    val docs = Seq("low lower lowest new newest").toDF("text")
    val fp = Augment.bpeFootprintBytes(5L, 24L)
    assert(fp === 56L * (24L + 5L) + 112L * 5L)
    val atBudget = Augment.bpeLearn(docs, "text", rounds = 4,
      maxLocalBytes = fp)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    val underBudget = Augment.bpeLearn(docs, "text", rounds = 4,
      maxLocalBytes = fp - 1)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(atBudget === underBudget)
    assert(atBudget.size === 4)
    // longer words grow the estimate even at equal word count: the
    // failure mode a count bound cannot see
    assert(Augment.bpeFootprintBytes(5L, 240L) >
      Augment.bpeFootprintBytes(5L, 24L))
  }

  test("bpeLearn: stops early when no pairs remain") {
    // single char + marker: one pair each round until fully merged
    val docs = Seq("x").toDF("text")
    val m = Augment.bpeLearn(docs, "text", rounds = 10)
      .as[(Int, String, String, String, Long)].collect()
    assert(m.length === 1) // (x,</w>) merges; merged word has no pairs left
    assert(m.head._4 === "x</w>")
  }

  test("bpeEncode: learn-then-encode reproduces the learner's segmentation") {
    val corpus = Seq("aaab aaab ab").toDF("text")
    val merges = Augment.bpeLearn(corpus, "text", rounds = 3)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
      .map(m => (m._2, m._3)).toSeq // rank order: (a,a), (a,b), (ab,</w>)
    val out = Augment.bpeEncode(corpus, "text", merges)
      .select("n_words", "n_subwords").as[(Long, Long)].head()
    // aaab -> [aa, ab</w>] (2), ab -> [ab</w>] (1): 2+2+1 = 5 subwords
    assert(out === ((3L, 5L)))
    // no merges: every char + the word marker survives
    val raw = Augment.bpeEncode(corpus, "text", Seq.empty)
      .select("n_subwords").as[Long].head()
    assert(raw === (4 + 1) + (4 + 1) + (2 + 1))
  }

  test("bpeEncode: tokenizes like the learner — no phantom empty words") {
    // double space + tab: split-on-single-space would manufacture ""
    // words the vocabulary never saw
    val messy = Seq("ab  ab\tab").toDF("text")
    val out = Augment.bpeEncode(messy, "text", Seq(("a", "b")))
      .select("n_words", "n_subwords").as[(Long, Long)].head()
    assert(out === ((3L, 6L))) // 3 words x [ab, </w>]
  }

  test("bpeLearn: local path splits supplementary-plane chars as code points") {
    // U+1F600 is two UTF-16 units; surrogate halves would be 2 symbols
    val docs = Seq("a😀").toDF("text")
    val m = Augment.bpeLearn(docs, "text", rounds = 1)
      .as[(Int, String, String, String, Long)].collect()
    // first merge pairs 'a' with the INTACT emoji, not a surrogate half
    assert(m.head._2 === "a")
    assert(m.head._3 === "😀")
  }

  // ---- MLM masking --------------------------------------------------------

  test("mlmMask: deterministic, bounded, and reassembles the token stream") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("id", "text")
    val out = Augment.mlmMask(docs, "id", "text", frac = 0.5)
      .select("id", "n_toks", "n_masked", "masked_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)

    out.foreach { case (_, nToks, nMasked, masked) =>
      assert(masked.split(" ").length.toLong === nToks)
      assert(masked.split(" ").count(_ == "<MASK>").toLong === nMasked)
      assert(nMasked <= nToks)
    }
    // deterministic: a second run produces the identical masked corpus
    val again = Augment.mlmMask(docs, "id", "text", frac = 0.5)
      .select("id", "n_toks", "n_masked", "masked_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq === again.toSeq)
  }

  test("mlmMask: frac 0 masks nothing, frac 1 masks everything") {
    val docs = Seq((7L, "a b c")).toDF("id", "text")
    val none = Augment.mlmMask(docs, "id", "text", frac = 0.0)
      .select("n_masked").as[Long].head()
    val all = Augment.mlmMask(docs, "id", "text", frac = 1.0)
      .select("masked_text").as[String].head()
    assert(none === 0L)
    assert(all === "<MASK> <MASK> <MASK>")
  }

  // ---- FoldAccents --------------------------------------------------------

  test("foldAccents: composed and decomposed forms fold to the same ASCII") {
    val df = Seq("Café", "Café", "über", "niño", "plain")
      .toDF("s")
    val out = df.select(TextFunctions.foldAccents(col("s")).as("f"))
      .as[String].collect().toSeq
    assert(out === Seq("Cafe", "Cafe", "uber", "nino", "plain"))
  }

  test("foldAccents: available from SQL and null-safe") {
    GraftExtensions.prepareSession(spark)
    val r = spark.sql(
      "SELECT graft_fold_accents('áéõ'), graft_fold_accents(NULL)")
      .collect().head
    assert(r.getString(0) === "aeo")
    assert(r.isNullAt(1))
  }
}
