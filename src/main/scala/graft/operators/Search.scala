package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Lexical retrieval: BM25 scoring over whitespace tokens (the sparse
  * half of a hybrid sparse+dense search cascade — the dense half is
  * Similarity/PQ).
  *
  * Uses Lucene's non-negative idf variant, ln(1 + (N - df + 0.5) /
  * (df + 0.5)), so common terms (df > N/2) degrade to ~0 weight instead
  * of going negative.
  *
  * Cross-engine determinism: every factor is either integer-derived (tf,
  * dl, df, N — exact in both engines) or an IEEE expression over literal
  * constants written with the SAME association on both sides — including
  * keeping `k1 + 1` as an expression rather than a Scala-precomputed
  * constant (1.2 is binary-inexact; folding it differently than the SQL
  * twin would shear the last ulp).
  *
  * Scale shape: the term filter (`isInCollection`) runs in the scan
  * stage, so only postings of the QUERY terms survive the explode; the
  * per-term df table and the one-row corpus stats are broadcast (both are
  * O(|query|), not O(vocabulary) — by contrast with the q45 TF-IDF rule
  * that corpus vocabularies must NEVER be broadcast). One shuffle on
  * (doc, term), one on doc. */
object Search {

  val K1 = 1.2
  val B = 0.75

  /** Per-document BM25 scores for `terms`: (id, score), score rounded to
    * 6 decimals, only documents containing at least one term appear. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = K1, b: Double = B): DataFrame = {
    require(terms.nonEmpty)
    val toks = docs.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val dl = toks.select(col("id"), size(col("toks")).cast("long").as("dl"))
    val stats = broadcast(
      dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")))
    val tf = toks.select(col("id"), explode(col("toks")).as("term"))
      .filter(col("term").isInCollection(terms))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfT = broadcast(tf.groupBy("term").agg(count(lit(1)).as("df")))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf: Column = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5))
    val w = idf * (col("tf") * (lit(k1) + lit(1.0))) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / avgdl))
    // per-term weight → micro-long → integer Σ: round-to-integer of the
    // identical scaled double agrees across engines, and the long sum is
    // associative — the per-doc score is deterministic under any grouping
    // order (a raw float Σ would be last-ulp order-sensitive)
    tf.join(dl, "id").crossJoin(stats).join(dfT, "term")
      .withColumn("w_micro", round(w * lit(1e6), 0).cast("long"))
      .groupBy("id")
      .agg((sum(col("w_micro")).cast("double") / lit(1e6)).as("score"))
  }
}
