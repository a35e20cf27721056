package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.functions.{Portable, TextFunctions => T}
import graft.sources.Tables

/** Text-analysis operators over the documents corpus: language-ID
  * heuristic, quality scoring, token counting, content fingerprinting.
  * All pure column expressions — at 100 TB these run embarrassingly
  * parallel inside the scan stage, no shuffle until the final (tiny)
  * ordering.
  */
object TextPack extends QueryPack {

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"),
    "zh" -> Seq("de", "le", "shi", "bu"))

  /** English-ish stopwords for quality scoring. */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Language ID: stopword-profile scores + argmax with deterministic
    // tiebreak (profile order).
    "q20_lang_id" -> ((s, dir) => {
      // native vocab-hit probes over ONE shared whitespace split (codegen
      // subexpression elimination merges the identical split subtrees)
      val scored = Tables.table(s, dir, "documents")
        .select(col("doc_id") +: col("lang") +:
          langProfiles.map { case (l, ws) =>
            T.vocabHitsText(col("text"), ws).as(s"s_$l") }: _*)
      val best = langProfiles.map(_._1).foldRight(lit("und")) { (l, rest) =>
        when(col(s"s_$l") === greatest(langProfiles.map(p => col(s"s_${p._1}")): _*)
          && col(s"s_$l") > 0, l).otherwise(rest)
      }
      scored.withColumn("pred_lang", best)
        .orderBy("doc_id")
    }),

    // Quality scoring: length/stopword/token-shape features + linear score
    // (the score itself is the shared TextFunctions.qualityScore — one
    // definition for this query and the curation pipeline; zero-token docs
    // get null features and quality 0 instead of an ANSI division error).
    "q21_quality_score" -> ((s, dir) => {
      Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          T.tokenStats(col("text")).getField("ws_tokens").as("n_tokens"),
          length(col("text")).as("n_chars"),
          round(T.avgTokenLength(col("text")), 6).as("avg_tok_len"),
          round(T.stopwordRatio(col("text"), stopwords), 6).as("stop_ratio"),
          round(T.qualityScore(col("text"), stopwords), 6).as("quality"))
        .orderBy("doc_id")
    }),

    // Token counting: whitespace + BPE-ish segmentation — ONE native
    // single-pass scan (graft_token_stats) instead of three
    // regexp_extract_all passes each materializing a match array (9.8 s
    // of the round-1 driver bench).
    "q22_token_stats" -> ((s, dir) => {
      val ts = T.tokenStats(col("text"))
      Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          ts.getField("ws_tokens").as("ws_tokens"),
          ts.getField("alpha_tokens").as("alpha_tokens"),
          ts.getField("bpe_tokens").as("bpe_tokens"))
        .orderBy("doc_id")
    }),

    // Content fingerprint of the normalized text (md5-derived 32-bit).
    "q23_fingerprint" -> ((s, dir) => {
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), T.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    // TF-IDF: term frequency × inverse document frequency over the corpus
    // (inverted-index shuffle shape: one explode + two aggregations), top
    // term per document with deterministic tiebreak.
    "q45_tfidf" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      // corpus size as an IN-PLAN 1-row aggregate cross-joined onto the
      // scores (the ScaleJoins.skewProfile pattern) — a driver-side
      // docs.count() here would run a job during query CONSTRUCTION and
      // scan the corpus twice. No broadcast hint on the document-frequency
      // side either: the vocabulary of a 100 TB corpus outgrows any
      // broadcast, so the join strategy is left to AQE.
      val nDocs = docs.select(
        count(lit(1)).cast("double").as("n_docs"))
      val terms = docs
        .select(col("doc_id"), explode(T.tokens(col("text"))).as("term"))
      val tf = terms.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = terms.select(col("doc_id"), col("term")).distinct()
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored = tf.join(df, "term").crossJoin(nDocs)
        .withColumn("tfidf", col("tf") * log(col("n_docs") / col("df")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          round(col("tfidf"), 6).as("tfidf"))
        .orderBy("doc_id")
    }),

    // Intra-document repetition: 1 - distinct/total word-3-grams — the
    // boilerplate/repetition quality signal used in corpus curation.
    "q46_repetition" -> ((s, dir) => {
      val grams = Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          explode(T.wordNgrams(T.tokens(col("text")), 3)).as("g"))
      // two-level aggregation instead of countDistinct: (doc, gram) counts
      // then per-doc sums — no distinct-expand, map-side partials all the way
      grams.groupBy(col("doc_id"), col("g"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_grams"), count(lit(1)).as("n_distinct"))
        .withColumn("repetition",
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_grams"), 6))
        .orderBy("doc_id")
    }),

    // Markup stripping — the crawl-cleaning stage. The corpus is plain
    // text, so the query wraps each doc in deterministic markup (tags,
    // attributes, entities — built identically in the oracle) and the
    // operator must recover exactly the text plus the entity-decoded
    // literal content ("& <tail>"), fingerprint-verified per doc.
    "q60_html_strip" -> ((s, dir) => {
      val raw = concat(lit("<div id=\""), col("doc_id").cast("string"),
        lit("\"><p>"), col("text"),
        lit("</p><br/><span>&amp;&lt;tail&gt;</span></div>"))
      val cleaned = T.stripMarkup(raw)
      Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          size(T.tokens(cleaned)).as("n_toks"),
          substring(md5(cleaned), 1, 8).as("clean_hash"))
        .orderBy("doc_id")
    }),

    // PII redaction (emails, long digit runs) — the corpus has none, so a
    // deterministic contact line is appended first; the patterns are
    // RE2-conservative so both engines' regex dialects agree.
    "q39_redact" -> ((s, dir) => {
      val withPii = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com ref "),
        (col("doc_id") * 1234567 + 100000000L).cast("string"))
      val emails = regexp_replace(withPii, EmailPattern, "<EMAIL>")
      Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          regexp_replace(emails, DigitsPattern, "<NUM>").as("redacted"),
          size(regexp_extract_all(withPii, lit(EmailPattern), lit(0))).as("n_emails"),
          size(regexp_extract_all(withPii, lit(DigitsPattern), lit(0))).as("n_nums"))
        .orderBy("doc_id")
    })
  )

  /** RE2-safe PII patterns (no lookarounds — portable to DuckDB). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val DigitsPattern = "[0-9]{6,}"

  // ---- DuckDB twins --------------------------------------------------------

  /** DuckDB: non-empty whitespace tokens of `text`. */
  def toksSql(text: String): String =
    s"list_filter(regexp_split_to_array($text, '\\s+'), t -> len(t) > 0)"

  private def hitsSql(toks: String, ws: Seq[String]): String =
    s"len(list_filter($toks, t -> t IN (${ws.map(w => s"'$w'").mkString(", ")})))"

  def oracles: Map[String, String] = Map(
    "q60_html_strip" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |         '<div id="' || CAST(doc_id AS VARCHAR) || '"><p>' || text ||
        |         '</p><br/><span>&amp;&lt;tail&gt;</span></div>' AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, trim(regexp_replace(
        |           replace(replace(replace(replace(replace(
        |             regexp_replace(h, '<[^>]*>', ' ', 'g'),
        |             '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |             '&#39;', chr(39)), '&amp;', '&'),
        |           '\s+', ' ', 'g')) AS cleaned
        |  FROM raw)
        |SELECT doc_id,
        |       CAST(len(string_split(cleaned, ' ')) AS INTEGER) AS n_toks,
        |       substring(md5(cleaned), 1, 8) AS clean_hash
        |FROM c ORDER BY doc_id""".stripMargin,

    "q20_lang_id" -> {
      val scores = langProfiles.map { case (l, ws) => s"${hitsSql("toks", ws)} AS s_$l" }
      val greatest = s"greatest(${langProfiles.map(p => s"s_${p._1}").mkString(", ")})"
      val best = langProfiles.map(_._1).foldRight("'und'") { (l, rest) =>
        s"CASE WHEN s_$l = $greatest AND s_$l > 0 THEN '$l' ELSE $rest END"
      }
      s"""WITH t AS (SELECT doc_id, lang, ${toksSql("text")} AS toks FROM documents),
         |sc AS (SELECT doc_id, lang, ${scores.mkString(", ")} FROM t)
         |SELECT doc_id, lang, ${langProfiles.map(p => s"CAST(s_${p._1} AS INTEGER) AS s_${p._1}").mkString(", ")},
         |       $best AS pred_lang
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "q21_quality_score" ->
      s"""WITH t AS (SELECT doc_id, text, ${toksSql("text")} AS toks FROM documents)
         |SELECT CAST(doc_id AS BIGINT) AS doc_id,
         |       CAST(len(toks) AS INTEGER) AS n_tokens,
         |       CAST(length(text) AS INTEGER) AS n_chars,
         |       ROUND(CASE WHEN len(toks) = 0 THEN NULL
         |             ELSE CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / len(toks) END, 6) AS avg_tok_len,
         |       ROUND(CASE WHEN len(toks) = 0 THEN NULL
         |             ELSE CAST(${hitsSql("toks", stopwords)} AS DOUBLE) / len(toks) END, 6) AS stop_ratio,
         |       ROUND(${graft.functions.TextFunctions.qualityScoreSql(stopwords)}, 6) AS quality
         |FROM t ORDER BY doc_id""".stripMargin,

    "q22_token_stats" ->
      s"""SELECT doc_id,
         |       CAST(len(${toksSql("text")}) AS INTEGER) AS ws_tokens,
         |       CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS INTEGER) AS alpha_tokens,
         |       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INTEGER) AS bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q23_fingerprint" ->
      s"""SELECT doc_id,
         |       ${Portable.hash32Sql("lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))")} AS fp
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q45_tfidf" ->
      s"""WITH terms AS (SELECT doc_id, unnest(${toksSql("text")}) AS term FROM documents),
         |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
         |df AS (SELECT term, COUNT(*) AS df
         |       FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY 1),
         |scored AS (SELECT doc_id, term, tf, df,
         |                  tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / df) AS tfidf
         |           FROM tf JOIN df USING (term)),
         |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |                     ORDER BY tfidf DESC, term) AS rn FROM scored)
         |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
         |       ROUND(tfidf, 6) AS tfidf
         |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q46_repetition" -> {
      val grams =
        """SELECT doc_id, unnest(
          |  CASE WHEN len(toks) >= 3
          |       THEN list_transform(generate_series(1, len(toks) - 2),
          |                           i -> array_to_string(list_slice(toks, i, i + 2), ' '))
          |       ELSE CAST([] AS VARCHAR[]) END) AS g
          |FROM (SELECT doc_id, """.stripMargin + toksSql("text") + " AS toks FROM documents)"
      s"""WITH grams AS ($grams)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
         |       CAST(COUNT(DISTINCT g) AS BIGINT) AS n_distinct,
         |       ROUND(1.0 - CAST(COUNT(DISTINCT g) AS DOUBLE) / COUNT(*), 6) AS repetition
         |FROM grams GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "q39_redact" -> {
      val withPii = "text || ' contact user' || doc_id || '@example.com ref ' || (doc_id * 1234567 + 100000000)"
      s"""WITH t AS (SELECT doc_id, $withPii AS wp FROM documents)
         |SELECT doc_id,
         |       regexp_replace(regexp_replace(wp, '$EmailPattern', '<EMAIL>', 'g'),
         |                      '$DigitsPattern', '<NUM>', 'g') AS redacted,
         |       CAST(len(regexp_extract_all(wp, '$EmailPattern')) AS INTEGER) AS n_emails,
         |       CAST(len(regexp_extract_all(wp, '$DigitsPattern')) AS INTEGER) AS n_nums
         |FROM t ORDER BY doc_id""".stripMargin
    }
  )
}
