package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for large-scale corpus processing, as pure
  * Catalyst expressions (codegen'd, no UDFs): tokenization, n-grams /
  * shingles, stopword profiling, normalization, fingerprinting.
  *
  * All of these have exact DuckDB twins (list_transform / list_filter /
  * regexp_split_to_array) used by the TextPack/DedupPack oracles.
  */
object TextFunctions {

  /** Whitespace tokenization (non-empty tokens). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Word n-grams: sliding windows of `n` tokens joined by a space.
    * (Guarded: Spark's sequence(1, 0) counts DOWN, so short inputs must
    * short-circuit to an empty array.) */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Character n-gram shingles of the raw string. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Collapse runs of whitespace + trim + lowercase — the canonical form
    * used for exact-dup hashing. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Number of tokens that appear in `words` (stopword-count style). */
  def vocabHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /** 32-bit content fingerprint of the normalized text (portable md5
    * prefix; see Portable.hash32). */
  def fingerprint(text: Column): Column =
    Portable.hash32(normalize(text))
}
