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

    // BPE merge-rule learning, pinned to the DuckDB oracle as a
    // SQL-expressible PREFIX plus hash-gated invariants: round 1 of the
    // merge loop is a plain pair-count argmax the oracle replays exactly
    // (same \s+ tokens, code-point split, </w> marker, overlap-counted
    // pairs, (freq DESC, a, b) binary-collation tie-break), and the
    // remaining rounds — not ANSI-expressible — are pinned through gate
    // rows whose expected values are constants: rule count, merged =
    // left||right, merge frequency monotone non-increasing (a new pair
    // created by a merge can never exceed the merged pair's own count),
    // contiguous 1..n ranks, all frequencies positive. A gate violation
    // flips a 'true' to 'false' and fails the hash compare, so all 12
    // rounds are correctness-gated even though only round 1 is replayed.
    // Exact multi-round merge semantics are additionally pinned by
    // AugmentSpec on crafted corpora.
    "q132_bpe_vocab" -> ((s, dir) => {
      val rules = Augment.bpeLearn(docs(s, dir), "text", BpeRounds)
      bpeContract(rules)
    }),

    // Fill-in-the-middle split plan (code-model preprocessing): two
    // deterministic character cuts from the hash family carve each doc
    // into prefix/middle/suffix, reassembled in PSM order
    // (<PRE>prefix<SUF>suffix<MID>middle) — the transform FIM training
    // actually applies. Pure scan-stage substring arithmetic; the exact
    // reassembled example is pinned by an md5 fingerprint. Cuts are
    // uniform over [0, n_chars] including both edges, so empty
    // prefix/middle/suffix cases are exercised, not special-cased.
    "q213_fim_split" -> ((s, dir) => {
      val P = graft.functions.Portable
      val n = length(col("text"))
      docs(s, dir)
        .withColumn("n_chars2", n.cast("long"))
        .withColumn("c1",
          P.hash32(concat(lit("fim1:"), col("doc_id").cast("string")))
            % (col("n_chars2") + 1))
        .withColumn("c2",
          P.hash32(concat(lit("fim2:"), col("doc_id").cast("string")))
            % (col("n_chars2") + 1))
        .withColumn("lo", least(col("c1"), col("c2")))
        .withColumn("hi", greatest(col("c1"), col("c2")))
        .select(col("doc_id"), col("n_chars2").as("n_chars"),
          col("lo").as("p_len"), (col("hi") - col("lo")).as("m_len"),
          (col("n_chars2") - col("hi")).as("s_len"),
          substring(md5(concat(
            lit("<PRE>"), expr("substr(text, 1, CAST(lo AS INT))"),
            lit("<SUF>"), expr("substr(text, CAST(hi + 1 AS INT))"),
            lit("<MID>"),
            expr("substr(text, CAST(lo + 1 AS INT), CAST(hi - lo AS INT))"))),
            1, 8).as("psm_hash"))
        .orderBy("doc_id")
    }),
  )

  /** (item, value) contract view of a learned rule list: the exact
    * round-1 rule plus constant-expected gate rows (see q132 comment).
    * One row in, nine rows out — all arithmetic on the already-tiny rule
    * table, sorted by the struct's leading `rank` field. */
  private[operators] def bpeContract(rules: DataFrame): DataFrame = {
    val rs = array_sort(collect_list(struct(
      col("rank"), col("left"), col("right"), col("merged"), col("freq"))))
    rules
      .agg(rs.as("rs"))
      .select(
        element_at(col("rs"), 1).as("r1"),
        size(col("rs")).as("n"),
        forall(col("rs"), r => r.getField("merged") ===
          concat(r.getField("left"), r.getField("right"))).as("concat_ok"),
        forall(col("rs"), r => r.getField("freq") >= 1).as("freq_pos"),
        forall(zip_with(
          slice(col("rs"), lit(1), size(col("rs")) - 1),
          slice(col("rs"), lit(2), size(col("rs")) - 1),
          (p, q) => q.getField("freq") <= p.getField("freq")),
          m => m).as("monotone"),
        (transform(col("rs"), r => r.getField("rank")) ===
          sequence(lit(1), size(col("rs")))).as("ranks_ok"))
      .select(explode(map(
        lit("a_r1_left"), col("r1.left"),
        lit("a_r1_right"), col("r1.right"),
        lit("a_r1_merged"), col("r1.merged"),
        lit("a_r1_freq"), col("r1.freq").cast("string"),
        lit("g_n_rules"), col("n").cast("string"),
        lit("g_concat_ok"), col("concat_ok").cast("string"),
        lit("g_freq_monotone"), col("monotone").cast("string"),
        lit("g_freq_positive"), col("freq_pos").cast("string"),
        lit("g_ranks_contiguous"), col("ranks_ok").cast("string"))))
      .toDF("item", "value")
      .orderBy("item")
  }

  def oracles: Map[String, String] = Map(

    "q130_mlm_mask" -> {
      val thr = CorpusOps.hexThreshold(MaskFrac)
      s"""WITH t AS (
         |  SELECT doc_id, ${TextPack.toksSql("text")} AS toks FROM documents),
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
         |  SELECT doc_id, len(${TextPack.toksSql("text")}) AS n
         |  FROM documents),
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

    "q132_bpe_vocab" ->
      s"""WITH toks AS (
         |  SELECT unnest(${TextPack.toksSql("text")}) AS w FROM documents),
         |words AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w),
         |syms AS (
         |  SELECT list_append(list_transform(generate_series(1, length(w)),
         |           i -> substr(w, i, 1)), '</w>') AS s, cnt
         |  FROM words),
         |pairs AS (
         |  SELECT unnest(list_transform(generate_series(1, len(s) - 1),
         |           i -> struct_pack(a := s[i], b := s[i + 1]))) AS p, cnt
         |  FROM syms),
         |r1 AS (
         |  SELECT p.a AS a, p.b AS b, sum(cnt) AS freq
         |  FROM pairs GROUP BY 1, 2
         |  ORDER BY freq DESC, a ASC, b ASC LIMIT 1)
         |SELECT item, value FROM (
         |  SELECT 'a_r1_left' AS item, a AS value FROM r1
         |  UNION ALL SELECT 'a_r1_right', b FROM r1
         |  UNION ALL SELECT 'a_r1_merged', a || b FROM r1
         |  UNION ALL SELECT 'a_r1_freq', CAST(freq AS VARCHAR) FROM r1
         |  UNION ALL SELECT 'g_n_rules', '$BpeRounds'
         |  UNION ALL SELECT 'g_concat_ok', 'true'
         |  UNION ALL SELECT 'g_freq_monotone', 'true'
         |  UNION ALL SELECT 'g_freq_positive', 'true'
         |  UNION ALL SELECT 'g_ranks_contiguous', 'true')
         |ORDER BY item""".stripMargin,

    "q213_fim_split" -> {
      val h1 = graft.functions.Portable.hash32Sql(
        "'fim1:' || CAST(doc_id AS VARCHAR)")
      val h2 = graft.functions.Portable.hash32Sql(
        "'fim2:' || CAST(doc_id AS VARCHAR)")
      s"""WITH c AS (
         |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n,
         |         $h1 % (CAST(length(text) AS BIGINT) + 1) AS c1,
         |         $h2 % (CAST(length(text) AS BIGINT) + 1) AS c2
         |  FROM documents),
         |s AS (SELECT doc_id, text, n,
         |        least(c1, c2) AS lo, greatest(c1, c2) AS hi FROM c)
         |SELECT doc_id, n AS n_chars, lo AS p_len, hi - lo AS m_len,
         |       n - hi AS s_len,
         |       substr(md5('<PRE>' || substr(text, 1, CAST(lo AS INTEGER))
         |         || '<SUF>' || substr(text, CAST(hi + 1 AS INTEGER))
         |         || '<MID>' || substr(text, CAST(lo + 1 AS INTEGER),
         |                             CAST(hi - lo AS INTEGER))), 1, 8)
         |         AS psm_hash
         |FROM s ORDER BY doc_id""".stripMargin
    },

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
