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

  /** Word n-grams: sliding windows of `n` tokens joined by a space — the
    * native graft_ngrams expression (one compiled loop; the composed
    * transform/slice/concat_ws form evaluates interpreted HOFs per window
    * and dominated the shingle pipelines). */
  def wordNgrams(toks: Column, n: Int): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.GraftExtensions.register)
    // null input -> [] preserves this API's original composed-form behavior
    coalesce(call_function("graft_ngrams", toks, lit(n)),
      array().cast("array<string>"))
  }

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

  /** Average token length; null for token-less docs (the zero-token guard
    * matters: ANSI mode turns the division into a runtime error). */
  def avgTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(null).cast("double"))
      .otherwise(length(regexp_replace(text, "\\s+", "")).cast("double") / size(toks))
  }

  /** Stopword ratio; null for token-less docs. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(null).cast("double"))
      .otherwise(vocabHits(toks, stopwords).cast("double") / size(toks))
  }

  /** The quality score (length/stopword/token-shape linear blend) shared by
    * the quality query and the curation pipeline — ONE definition so the
    * two can't silently drift. Token-less docs score 0.0. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      least(size(toks) / 100.0, lit(1.0)) * 0.5
        + stopwordRatio(text, stopwords) * 0.3
        + least(avgTokenLength(text) / 10.0, lit(1.0)) * 0.2)
  }

  /** DuckDB twin of [[qualityScore]] over a `toks` list column + `text`. */
  def qualityScoreSql(stopwords: Seq[String]): String = {
    val hits = s"len(list_filter(toks, t -> t IN (${stopwords.map(w => s"'$w'").mkString(", ")})))"
    s"""CASE WHEN len(toks) = 0 THEN 0.0 ELSE
       |least(len(toks) / 100.0, 1.0) * 0.5
       |  + (CAST($hits AS DOUBLE) / len(toks)) * 0.3
       |  + least((CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / len(toks)) / 10.0, 1.0) * 0.2
       |END""".stripMargin
  }
}
