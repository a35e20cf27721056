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
    val toks = split(col(textCol), " ")
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

  /** Learn `rounds` BPE merge rules from the corpus: the classic loop —
    * split every distinct word into characters (plus the `</w>`
    * end-of-word marker), repeatedly take the adjacent symbol pair with
    * the highest count-weighted frequency (ties broken lexicographically,
    * so the rule list is deterministic), merge it everywhere, repeat.
    * Returns (rank, left, right, merged, freq) with rank 1 = first merge.
    *
    * The corpus is touched exactly once (tokenize + groupBy word); each
    * round shuffles only the vocabulary table. The per-round 1-row
    * collect is the argmax of the round — a learned scalar, not data
    * movement. */
  def bpeLearn(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(rounds >= 1 && rounds <= 64, "rounds must be in [1, 64]")

    val chars = (w: Column) =>
      concat(transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
        array(lit("</w>")))
    var vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(chars(col("w")).as("syms"), col("cnt"))
      .cache()
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
          // greedy non-overlapping left-to-right merge of (a, b) -> m
          val mergedSyms = aggregate(col("syms"),
            array().cast("array<string>"),
            (acc, x) =>
              when(size(acc) > 0 &&
                element_at(acc, -1) === lit(a) && x === lit(b),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(m))))
                .otherwise(concat(acc, array(x))))
          vocab = vocab.select(mergedSyms.as("syms"), col("cnt")).cache()
          r += 1
        }
      }
    } finally {
      if (prev != null) prev.unpersist()
      vocab.unpersist()
    }

    merges.result().toDF("rank", "left", "right", "merged", "freq")
  }
}
