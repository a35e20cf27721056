package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.CorpusOps.{hashHex4, hexThreshold}

/** Training-example construction: deterministic MLM-style token masking
  * and BPE merge-rule learning. The reference stops at serving trained
  * models; a training-data engine also has to MANUFACTURE the examples —
  * masked-token objectives and subword vocabularies are the two most
  * common preprocessing artifacts.
  *
  * Scale shape: masking is a pure per-row expression chain (scan-stage,
  * codegen, no shuffle). BPE learning aggregates the corpus ONCE into a
  * (word, count) vocabulary — all subsequent rounds run on the vocabulary
  * table, whose size is the distinct-word count, not the corpus; each
  * round is one small shuffle on the candidate pair plus a 1-row argmax
  * collect (the merge RULE is a learned artifact, inherently sequential —
  * at 100 TB you learn rules on a capped/sampled vocabulary and apply
  * them corpus-wide, exactly as tokenizer training does in practice).
  */
object Augment {

  /** Mask ~`frac` of whitespace tokens with `maskTok`, decided per
    * position by the layout-independent md5-bucket rule (same family as
    * hashSplit/stratifiedSample, so the choice reproduces in any engine
    * and under any partitioning). Emits the original columns plus
    * (n_toks, n_masked, masked_text). The hash is computed once per
    * token: flags drive both the replacement and the count. */
  def mlmMask(df: DataFrame, idCol: String, textCol: String, frac: Double,
              maskTok: String = "<MASK>", salt: String = "mlm"): DataFrame = {
    val thr = hexThreshold(frac)
    // shared \s+ tokenizer (empties dropped) — the same token universe
    // MaskFrac budgeting and the BPE learner count over, so a run of
    // spaces cannot manufacture phantom empty tokens that inflate n_toks
    val toks = TextFunctions.tokens(col(textCol))
    df
      .withColumn("_toks", toks)
      .withColumn("_flags", transform(col("_toks"), (t, i) =>
        hashHex4(salt, concat_ws(":", col(idCol).cast("string"),
          i.cast("string"), t)) < lit(thr)))
      .withColumn("n_toks", size(col("_toks")).cast("long"))
      .withColumn("n_masked",
        size(filter(col("_flags"), f => f)).cast("long"))
      .withColumn("masked_text",
        array_join(zip_with(col("_toks"), col("_flags"),
          (t, f) => when(f, lit(maskTok)).otherwise(t)), " "))
      .drop("_toks", "_flags")
  }

  /** T5-style span-corruption PLAN: instead of masking independent tokens
    * (mlmMask), corrupt ~`frac` of each document as contiguous `spanW`-token
    * spans — n_spans = floor(n·frac/spanW) span starts drawn
    * deterministically from the hash family (seeded by (id, k), layout-
    * independent), overlaps collapsed when counting coverage. Emits per
    * row: n_toks, n_spans, n_masked (distinct covered positions) and
    * span_hash (md5 of the sorted distinct starts — the exact plan,
    * compact). Entirely scan-stage higher-order-function arithmetic: no
    * explode, no shuffle, codegen-friendly — the plan for a 100 TB corpus
    * is one pass. */
  def spanMaskPlan(df: DataFrame, idCol: String, textCol: String,
                   frac: Double, spanW: Int, salt: String = "span"): DataFrame = {
    // frac <= 1 makes n_spans > 0 imply n_toks >= spanW/frac >= spanW, so
    // the start modulo (n_toks - spanW + 1) is always positive; a larger
    // frac would hit modulo-by-zero/negative on short docs
    require(frac > 0.0 && frac <= 1.0, "frac must be in (0, 1]")
    require(spanW >= 1, "spanW must be >= 1")
    // same \s+ tokenizer as mlmMask/bpeLearn (see mlmMask note)
    val n = size(TextFunctions.tokens(col(textCol)))
    val nSpans = when(n >= spanW, floor(n * lit(frac) / lit(spanW)))
      .otherwise(lit(0L)).cast("int")
    val starts = when(col("n_spans") > 0,
      transform(sequence(lit(1), col("n_spans")), k =>
        graft.functions.Portable.hash32(
          concat(lit(salt + ":"), col(idCol).cast("string"), lit(":"),
            k.cast("string"))) % (col("n_toks") - lit(spanW - 1))))
      .otherwise(array().cast("array<long>"))
    df
      .withColumn("n_toks", n.cast("long"))
      .withColumn("n_spans", nSpans)
      .withColumn("_starts", starts)
      .withColumn("n_masked",
        size(array_distinct(flatten(transform(col("_starts"), st =>
          sequence(st, st + lit(spanW - 1)))))).cast("long"))
      .withColumn("span_hash",
        substring(md5(array_join(
          transform(array_sort(array_distinct(col("_starts"))),
            x => x.cast("string")), ",")), 1, 8))
      .drop("_starts")
  }

  /** Estimated driver-heap bytes for the local loop's representation of a
    * collected vocabulary: each word becomes an Array[String] of ~chars+1
    * one-char Strings (~40 B each: object header + backing char payload)
    * plus array slots (8 B/ref + 16 B header) and the (tuple, Long count)
    * wrapper — conservatively 56 B per symbol plus 112 B per word.
    * Deliberately pessimistic: over-estimating only pushes borderline
    * vocabularies onto the distributed path, which is always safe. */
  def bpeFootprintBytes(nWords: Long, sumChars: Long): Long =
    56L * (sumChars + nWords) + 112L * nWords

  /** Symbol split shared by learn and encode: CODE POINTS (matching
    * Spark's substr/length character semantics — Java's toCharArray
    * would split supplementary-plane characters into surrogate halves)
    * plus the end-of-word marker. */
  private def charsCol(w: Column): Column =
    concat(transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
      array(lit("</w>")))

  private def charsLocal(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp))) :+
      "</w>"

  /** Greedy non-overlapping left-to-right (a,b)→a+b rewrite — the ONE
    * definition of the merge semantics, shared by the learner's rounds
    * and the encoder. */
  private def mergeFold(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** UTF-8 binary order (what Spark's asc() compares), NOT Java's UTF-16
    * compareTo — they disagree when one symbol is in [U+E000, U+FFFF] and
    * the other is supplementary-plane. */
  private def utf8Lt(x: String, y: String): Boolean = {
    val ax = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val ay = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(ax.length, ay.length)
    while (i < n) {
      val c = (ax(i) & 0xff) - (ay(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    ax.length < ay.length
  }

  /** Learn `rounds` BPE merge rules from the corpus: the classic loop —
    * split every distinct word into characters (plus the `</w>`
    * end-of-word marker), repeatedly take the adjacent symbol pair with
    * the highest count-weighted frequency (ties broken lexicographically,
    * so the rule list is deterministic), merge it everywhere, repeat.
    * Returns (rank, left, right, merged, freq) with rank 1 = first merge.
    *
    * The corpus is touched exactly once (tokenize + groupBy word — the
    * only stage that sees 100 TB). The merge loop then runs on the
    * (word, count) VOCABULARY, which is bounded by distinct-word count,
    * not corpus size: when its estimated driver-heap footprint fits
    * `maxLocalBytes` the loop runs in memory — exactly how production
    * tokenizer trainers work (distributed count, local merge learning),
    * and ~rounds× fewer scheduled jobs. The budget is in BYTES, not a
    * word count: a long-tail vocabulary of long words is what blows a
    * driver, and a count bound can't see word length — the estimate is
    * [[bpeFootprintBytes]] over (n_words, sum of word chars), both read
    * from the single `counted` aggregate that materializes the cache.
    * An oversized vocabulary falls back to the distributed loop: one
    * small shuffle + 1-row argmax collect per round. Both paths
    * implement the identical greedy non-overlapping left-to-right merge
    * and tie-break, so they return the same rules. */
  def bpeLearn(docs: DataFrame, textCol: String, rounds: Int,
               maxLocalBytes: Long = 1L << 30): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(rounds >= 1 && rounds <= 64, "rounds must be in [1, 64]")

    val counted = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val stats = counted.cache()
      .agg(count(lit(1)), coalesce(sum(length(col("w"))), lit(0L)))
      .as[(Long, Long)].head()
    if (bpeFootprintBytes(stats._1, stats._2) <= maxLocalBytes) {
      val words = counted.as[(String, Long)].collect()
        .map { case (w, c) => (charsLocal(w), c) }
      counted.unpersist()
      return bpeLocal(spark, words, rounds)
    }

    var vocab = counted
      .select(charsCol(col("w")).as("syms"), col("cnt"))
      .cache()
    counted.unpersist()
    // one job per round: the argmax collect ALSO materializes the round's
    // vocabulary cache (built from the previous round's still-live cache),
    // after which the previous cache can drop
    var prev: DataFrame = null
    def retire(): Unit = {
      if (prev != null) prev.unpersist()
      prev = vocab
    }

    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    try {
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        val top = vocab
          .select(explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"), col("cnt"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum("cnt").as("freq"))
          .orderBy(desc("freq"), asc("a"), asc("b"))
          .limit(1)
          .as[(String, String, Long)]
          .collect()
        retire()
        if (top.isEmpty) exhausted = true
        else {
          val (a, b, freq) = top.head
          val m = a + b
          merges += ((r, a, b, m, freq))
          vocab = vocab
            .select(mergeFold(col("syms"), a, b).as("syms"), col("cnt"))
            .cache()
          r += 1
        }
      }
    } finally {
      if (prev != null) prev.unpersist()
      vocab.unpersist()
    }

    merges.result().toDF("rank", "left", "right", "merged", "freq")
  }

  /** Apply learned BPE merge rules to the corpus — the ENCODE step that
    * pairs with [[bpeLearn]]: every word splits to characters + `</w>`
    * and each rule rewrites greedily left-to-right in rank order, the
    * same semantics the learner used, so learn-then-encode of the
    * training corpus reproduces the learner's final segmentation. Emits
    * the input columns plus (n_words, n_subwords): the compression the
    * vocabulary bought. Pure expression chain (one nested fold per
    * rule) — scan-stage, no shuffle, no UDF; rule lists are small
    * (30k-100k in practice), applied from the plan like any literal. */
  def bpeEncode(docs: DataFrame, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    def encodeWord(w: Column): Column = merges.foldLeft(charsCol(w)) {
      case (syms, (a, b)) => mergeFold(syms, a, b)
    }
    // tokenize EXACTLY like the learner (\s+, empties dropped): a stray
    // double space must not manufacture phantom empty-string words the
    // vocabulary never saw
    val toks = TextFunctions.tokens(col(textCol))
    docs
      .withColumn("n_words", size(toks).cast("long"))
      .withColumn("n_subwords",
        aggregate(
          transform(toks, w => size(encodeWord(w))),
          lit(0L), (s, x) => s + x.cast("long")))
  }

  /** Driver-side merge loop over a collected (syms, count) vocabulary —
    * same semantics as the distributed rounds (overlap-counted pair
    * frequencies, greedy non-overlapping left-to-right merge,
    * (freq desc, left, right) tie-break). */
  private def bpeLocal(spark: org.apache.spark.sql.SparkSession,
                       vocab: Array[(Array[String], Long)],
                       rounds: Int): DataFrame = {
    import spark.implicits._
    var words = vocab
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(
          v => Some(v.getOrElse(0L) + c))
      if (counts.isEmpty) exhausted = true
      else {
        // argmax by (freq desc, a, b) under UTF-8 binary order — the
        // same total order the distributed orderBy(asc) uses
        val ((a, b), freq) = counts.reduce { (p, q) =>
          val ((pa, pb), pf) = p
          val ((qa, qb), qf) = q
          val pWins =
            if (pf != qf) pf > qf
            else if (pa != qa) utf8Lt(pa, qa)
            else utf8Lt(pb, qb) || pb == qb
          if (pWins) p else q
        }
        val m = a + b
        merges += ((r, a, b, m, freq))
        words = words.map { case (syms, c) =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += m; i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), c)
        }
        r += 1
      }
    }
    merges.result().toDF("rank", "left", "right", "merged", "freq")
  }
}
