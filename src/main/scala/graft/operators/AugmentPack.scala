package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.functions.TextFunctions
import graft.sources.Tables

/** Driver-contract queries for the training-example construction
  * operators ([[Augment]]) and the Unicode fold expression. */
object AugmentPack extends QueryPack {

  /** MLM mask fraction (q130). */
  val MaskFrac = 0.15

  /** Learned BPE merge-rule count (q132). */
  val BpeRounds = 12

  /** Span width (tokens) for the q198 span-corruption plan. */
  val SpanW = 4

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Deterministic MLM masking at 15%: every (doc, position, token)
    // triple hashes independently, so the masked corpus is reproducible
    // across runs, engines, and partitionings. The masked text itself is
    // verified by an md5 fingerprint — exact content, compact output.
    "q130_mlm_mask" -> ((s, dir) => {
      Augment.mlmMask(docs(s, dir), "doc_id", "text", MaskFrac)
        .select(col("doc_id"), col("n_toks"), col("n_masked"),
          substring(md5(col("masked_text")), 1, 8).as("masked_hash"))
        .orderBy("doc_id")
    }),

    // Unicode canonicalization round-trip: part names are accent-injected
    // (translate aeo -> áéõ) identically in both engines, then the native
    // graft_fold_accents expression must fold them back to the original
    // ASCII — proving NFC + mark-strip semantics match DuckDB's
    // strip_accents(nfc_normalize(…)) byte-for-byte.
    "q131_normalize_text" -> ((s, dir) => {
      Tables.table(s, dir, "part")
        .select(col("p_name")).distinct()
        .withColumn("accented", translate(col("p_name"), "aeo", "áéõ"))
        .withColumn("folded", TextFunctions.foldAccents(col("accented")))
        .withColumn("roundtrip", col("folded") === col("p_name"))
        .orderBy("p_name")
    }),

    // T5-style span-corruption plan: the same 15% budget as q130 but
    // spent as contiguous 4-token spans (what seq2seq denoising actually
    // trains on) — deterministic span starts from the hash family,
    // overlap-collapsed coverage, and an md5 fingerprint of the sorted
    // start set as the exact, compact plan artifact. Pure scan-stage
    // higher-order-function arithmetic — no explode, no shuffle.
    "q198_span_mask" -> ((s, dir) => {
      Augment.spanMaskPlan(docs(s, dir), "doc_id", "text", MaskFrac, SpanW)
        .select(col("doc_id"), col("n_toks"), col("n_spans"),
          col("n_masked"), col("span_hash"))
        .orderBy("doc_id")
    }),

    // BPE merge-rule learning (no SQL oracle: the argmax-per-round loop
    // is not ANSI-expressible — driver records the rows-only check; exact
    // merge semantics are pinned by AugmentSpec on a crafted corpus).
    // Deterministic: ties break lexicographically.
    "q132_bpe_vocab" -> ((s, dir) =>
      Augment.bpeLearn(docs(s, dir), "text", BpeRounds)
        .orderBy("rank")),
  )

  def oracles: Map[String, String] = Map(

    "q130_mlm_mask" -> {
      val thr = CorpusOps.hexThreshold(MaskFrac)
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |f AS (
         |  SELECT doc_id, toks,
         |         list_transform(generate_series(1, len(toks)), i ->
         |           substr(md5('mlm:' || CAST(doc_id AS VARCHAR) || ':' ||
         |                      CAST(i - 1 AS VARCHAR) || ':' || toks[i]),
         |                  1, 4) < '$thr') AS flags
         |  FROM t)
         |SELECT doc_id,
         |       CAST(len(toks) AS BIGINT) AS n_toks,
         |       CAST(len(list_filter(flags, x -> x)) AS BIGINT) AS n_masked,
         |       substr(md5(list_aggregate(
         |         list_transform(generate_series(1, len(toks)), i ->
         |           CASE WHEN flags[i] THEN '<MASK>' ELSE toks[i] END),
         |         'string_agg', ' ')), 1, 8) AS masked_hash
         |FROM f ORDER BY doc_id""".stripMargin
    },

    "q198_span_mask" ->
      s"""WITH t AS (
         |  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
         |b AS (SELECT doc_id, n,
         |        CAST(floor((n * $MaskFrac) / $SpanW) AS INTEGER) AS n_spans
         |      FROM t),
         |st AS (SELECT doc_id, n, n_spans,
         |         CASE WHEN n_spans > 0 THEN
         |           list_transform(generate_series(1, n_spans), k ->
         |             ${graft.functions.Portable.hash32Sql(
                         "'span:' || CAST(doc_id AS VARCHAR) || ':' || CAST(k AS VARCHAR)")}
         |               % (n - ${SpanW - 1}))
         |         ELSE CAST([] AS BIGINT[]) END AS starts
         |       FROM b)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_toks, n_spans,
         |       CAST(len(list_distinct(flatten(list_transform(starts,
         |         s -> generate_series(s, s + ${SpanW - 1}))))) AS BIGINT)
         |         AS n_masked,
         |       substr(md5(coalesce(array_to_string(
         |         list_sort(list_distinct(starts)), ','), '')), 1, 8)
         |         AS span_hash
         |FROM st ORDER BY doc_id""".stripMargin,

    "q131_normalize_text" ->
      """SELECT p_name,
        |       translate(p_name, 'aeo', 'áéõ') AS accented,
        |       strip_accents(nfc_normalize(
        |         translate(p_name, 'aeo', 'áéõ'))) AS folded,
        |       strip_accents(nfc_normalize(
        |         translate(p_name, 'aeo', 'áéõ'))) = p_name AS roundtrip
        |FROM (SELECT DISTINCT p_name FROM part)
        |ORDER BY p_name""".stripMargin,
  )
}
