package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Blocklist phrases for the q155 multi-pattern screen. Deliberately
    * includes a pair with overlapping occurrences ("slow scan" /
    * "an slo" both fire inside "…scan slow…" contexts) so the oracle
    * exercises the automaton's failure transitions, not just disjoint
    * matches. Order is the pattern id the query reports. */
  val blocklist: Seq[String] = Seq(
    "hash join", "slow scan", "big table", "sort merge", "merge batch",
    "an slo")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Blocklist screen: one Aho–Corasick pass per document over the
    // whole phrase list (scan-stage, codegen; an OR-of-LIKEs goes
    // O(patterns) per char and a regex alternation backtracks). Emits
    // only flagged docs: id, how many distinct phrases hit, and which.
    "q155_blocklist" -> ((s, dir) => {
      Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          T.acHits(col("text"), blocklist).as("_hits"))
        .filter(size(col("_hits")) > 0)
        .select(col("doc_id"),
          size(col("_hits")).as("n_hits"),
          array_join(transform(col("_hits"), _.cast("string")), ",")
            .as("hit_ids"))
        .orderBy("doc_id")
    }),

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

    // Label-quality audit: confusion matrix of the metadata `lang`
    // column against q20's content-based language ID — the agreement
    // check a pipeline runs before TRUSTING either signal (metadata lies
    // after scraper bugs; the classifier lies on short docs). Per
    // (claimed, predicted) cell: count and the share of the claimed
    // language it represents (row-normalized recall); `agree` marks the
    // diagonal. Scale shape: the scoring is q20's scan-stage vocab-hit
    // expressions; the matrix is one groupBy over |langs|² cells, the
    // row totals ride a window over that tiny table.
    "q189_lang_confusion" -> ((s, dir) => {
      val scored = Tables.table(s, dir, "documents")
        .select(col("doc_id") +: col("lang") +:
          langProfiles.map { case (l, ws) =>
            T.vocabHitsText(col("text"), ws).as(s"s_$l") }: _*)
      val best = langProfiles.map(_._1).foldRight(lit("und")) { (l, rest) =>
        when(col(s"s_$l") === greatest(langProfiles.map(p => col(s"s_${p._1}")): _*)
          && col(s"s_$l") > 0, l).otherwise(rest)
      }
      val cells = scored.withColumn("pred_lang", best)
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
      val wLang = Window.partitionBy("lang")
      cells
        .withColumn("n_lang", sum(col("n")).over(wLang))
        .select(col("lang"), col("pred_lang"), col("n"), col("n_lang"),
          Portable.snap6(col("n").cast("double") / col("n_lang"))
            .as("row_frac"),
          (col("lang") === col("pred_lang")).as("agree"))
        .orderBy("lang", "pred_lang")
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
          Portable.snap6(T.qualityScore(col("text"), stopwords)).as("quality"))
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

    // Tokenizer fertility audit per language — the "how expensive is this
    // language for the tokenizer" report (fertility = subword tokens per
    // whitespace word; bytes per subword token) that decides vocab
    // allocation and flags scripts the tokenizer fragments. One
    // TokenStats scan (the fused q22 kernel) feeding one lang-keyed
    // aggregation of four longs — map-side combinable, so at 100 TB the
    // shuffle carries |langs| rows of integer sums. Ratios are exact
    // long/long divisions snapped once; a lang with zero words/tokens
    // reports null, not a division error. NULL lang is its own ''
    // stratum (the stratifiedSample convention).
    "q229_tokenizer_fertility" -> ((s, dir) => {
      val ts = T.tokenStats(col("text"))
      Tables.table(s, dir, "documents")
        .select(coalesce(col("lang"), lit("")).as("lang"),
          octet_length(col("text")).cast("long").as("bytes"),
          ts.getField("ws_tokens").cast("long").as("ws"),
          ts.getField("bpe_tokens").cast("long").as("bpe"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("bytes").as("n_bytes"),
          sum("ws").as("ws_tokens"), sum("bpe").as("bpe_tokens"))
        .select(col("lang"), col("n_docs"), col("n_bytes"),
          col("ws_tokens"), col("bpe_tokens"),
          when(col("ws_tokens") === 0, lit(null).cast("double"))
            .otherwise(Portable.snap6(col("bpe_tokens").cast("double")
              / col("ws_tokens"))).as("fertility"),
          when(col("bpe_tokens") === 0, lit(null).cast("double"))
            .otherwise(Portable.snap6(col("n_bytes").cast("double")
              / col("bpe_tokens"))).as("bytes_per_token"))
        .orderBy("lang")
    }),

    // Credential/secret screen (the gitleaks-family heuristic a code/web
    // corpus MUST run before release): tokens that look like keys —
    // long, single-run [A-Za-z0-9_-], mixing letters AND digits, with
    // high distinct-character count (English words and serial numbers
    // fail one of the legs). The fixture plants a deterministic
    // sk_<md5> credential in every 7th doc so the screen has known
    // positives the oracle replays exactly; organic long tokens that
    // genuinely look key-like are flagged identically in both engines.
    // Scale: explode + filter is scan-stage; the per-doc rollup
    // shuffles only candidate tokens (rare), keyed by doc_id.
    "q230_secret_scan" -> ((s, dir) => {
      val planted = when(col("doc_id") % SecretPlantMod === 0,
        concat(col("text"), lit(" token sk_"),
          md5(col("doc_id").cast("string")))).otherwise(col("text"))
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), explode(T.tokens(planted)).as("tok"))
        .filter(length(col("tok")) >= SecretMinLen &&
          col("tok").rlike("^[A-Za-z0-9_\\-]+$") &&
          col("tok").rlike("[0-9]") && col("tok").rlike("[A-Za-z]") &&
          size(array_distinct(filter(split(col("tok"), ""),
            c => length(c) > 0))) >= SecretMinDistinct)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_secrets"),
          max(length(col("tok"))).cast("long").as("max_len"))
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

    // Unigram-LM surprisal — the model-based quality signal (CCNet-style
    // perplexity filtering, with the corpus's own unigram counts standing
    // in for the external LM): rare-token-heavy docs score high. The
    // corpus total is an in-plan 1-row aggregate (never a driver count);
    // the token-frequency table joins back on the token with no broadcast
    // hint (a real vocabulary outgrows any broadcast — AQE decides).
    // Per-token surprisal is rounded then summed as DECIMAL so the
    // per-doc sum is exact and independent of addition order — float
    // summation order differs between engines and would flake the hash.
    "q62_surprisal" -> ((s, dir) => {
      val toks = Tables.table(s, dir, "documents")
        .select(col("doc_id"), explode(T.tokens(col("text"))).as("tok"))
      val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val total = tf.agg(sum(col("cnt")).cast("double").as("n_total"))
      val surp = tf.crossJoin(total)
        .select(col("tok"),
          round(-log(col("cnt").cast("double") / col("n_total")), 6)
            .cast("decimal(18,6)").as("s"))
      toks.join(surp, "tok")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_toks"), sum(col("s")).as("_sum"))
        .select(col("doc_id"), col("n_toks"),
          round(col("_sum").cast("double"), 6).as("sum_surprisal"),
          round(col("_sum").cast("double") / col("n_toks"), 6).as("mean_surprisal"))
        .orderBy("doc_id")
    }),

    // Corpus vocabulary heavy hitters: top-20 tokens by frequency with
    // corpus share — the frequency-analysis pass behind stopword lists and
    // tokenizer vocabularies. Exact two-level aggregation; the top-k is an
    // orderBy+limit (TakeOrdered — no global sort materializes at scale).
    "q63_token_topk" -> ((s, dir) => {
      val toks = Tables.table(s, dir, "documents")
        .select(explode(T.tokens(col("text"))).as("tok"))
      val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val total = tf.agg(sum(col("cnt")).cast("double").as("n_total"))
      val top = tf.crossJoin(total)
        .orderBy(col("cnt").desc, col("tok")).limit(TopkTokens)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("tok"))
      top.withColumn("rank", row_number().over(w))
        .select(col("rank"), col("tok"), col("cnt"),
          round(col("cnt") / col("n_total"), 6).as("share"))
        .orderBy("rank")
    }),

    // Bigram PMI collocations: pointwise mutual information of adjacent
    // token pairs vs their unigram frequencies — the phrase-mining pass.
    // Ranking happens on the ROUNDED pmi (with the bigram as tiebreak) so
    // the top-k cut is engine-independent — raw float ordering could
    // disagree in the last ulp across engines and select different rows.
    "q64_pmi_bigrams" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
      val toks = d.select(col("doc_id"), T.tokens(col("text")).as("toks"))
      val uni = toks.select(explode(col("toks")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c1"))
      val bi = toks.select(explode(T.wordNgrams(col("toks"), 2)).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= PmiMinCount)
      val nUni = uni.agg(sum(col("c1")).cast("double").as("n_uni"))
      val nBi = bi.agg(sum(col("cab")).cast("double").as("n_bi"))
      // tokens contain no whitespace (they come from a whitespace split),
      // so splitting the joined bigram on its single space is exact
      val parts = bi
        .withColumn("w1", split(col("bigram"), " ").getItem(0))
        .withColumn("w2", split(col("bigram"), " ").getItem(1))
      val scored = parts
        .join(uni.select(col("tok").as("w1"), col("c1").as("ca")), "w1")
        .join(uni.select(col("tok").as("w2"), col("c1").as("cb")), "w2")
        .crossJoin(nUni).crossJoin(nBi)
        .select(col("bigram"), col("cab"), col("ca"), col("cb"),
          round(log((col("cab").cast("double") / col("n_bi"))
            / ((col("ca").cast("double") / col("n_uni"))
              * (col("cb").cast("double") / col("n_uni")))), 6).as("pmi"))
      scored.orderBy(col("pmi").desc, col("bigram")).limit(PmiTopK)
        .orderBy(col("pmi").desc, col("bigram"))
    }),

    // Bigram-LM cross-entropy per document — the conditional extension of
    // q62's unigram surprisal: an add-one-smoothed bigram model trained on
    // the corpus scores each document in bits per bigram (the CCNet/
    // perplexity-bucketing quality signal, with the LM itself relational).
    // Context counts derive FROM the bigram table (c1(w1) = Σ_w2 c2) so
    // doc-final tokens never open a bigram and the conditional normalizes.
    // Per-bigram NLL is rounded to 6 then DECIMAL-summed (the q62 pattern)
    // for partition-order- and engine-independent totals.
    // Scale shape: two token-keyed aggregations + one join back; the model
    // table is vocabulary²-bounded but df-concentrated, never broadcast —
    // AQE picks the join strategy.
    // Corpus-level distinct-n diversity (the "distinct-1/2/3/4" metric
    // generation-quality reports use): for each n, the type/token ratio
    // of word n-grams across the WHOLE corpus — low ratios flag
    // template/boilerplate saturation that per-doc repetition (q46)
    // cannot see. Distinctness is counted over 128-bit gram hashes, so
    // the shuffle carries 16-byte keys, never gram text, and the
    // two-level aggregate (hash-count then per-n rollup) avoids the
    // Expand a mixed count/count-distinct plan would pay.
    // ROUGE-N overlap (N = 1, 2) between deterministic (candidate,
    // reference) document pairs — each doc scored against its source's
    // next doc_id. The pair-eval primitive of summarization /
    // paraphrase data curation: clipped n-gram counts give
    // precision = Σ_g min(c_cand, c_ref) / |cand grams|, recall the
    // same over |ref grams|, and F1 collapses to the exact integer
    // ratio 2·overlap / (n_cand + n_ref) (both P and R share the same
    // numerator), so every emitted value is a ratio of exact longs —
    // no float accumulation anywhere. Scale shape: per-doc gram counts
    // are one (doc, gram-hash) aggregation; the pair overlap joins the
    // two count tables on (pair, 16-byte gram hash) — cost is matched
    // grams only, never |cand grams| × |ref grams|, and nothing
    // enumerates document pairs beyond the declared pairing.
    "q226_rouge_overlap" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("source"), T.tokens(col("text")).as("toks"))
        .localCheckpoint() // feeds the pairing + two gram sizes
      val wNext = Window.partitionBy("source").orderBy("doc_id")
      val pairs = d.select(col("doc_id").as("cand_id"),
          lead(col("doc_id"), 1).over(wNext).as("ref_id"))
        .filter(col("ref_id").isNotNull)
      // BOTH gram sizes in ONE pass: the 1- and 2-gram rows ride a single
      // explode tagged with n, so the corpus is tokenized/aggregated once
      // and the tot/overlap join chain exists once (keyed by n) instead of
      // per gram size — half the stages of the old per-n branches for the
      // same shuffled rows (each gram row previously crossed its own
      // branch's exchange anyway).
      val cc = d.select(col("doc_id"), explode(concat(
          transform(T.wordNgrams(col("toks"), 1),
            g => struct(lit(1).as("n"), g.as("g"))),
          transform(T.wordNgrams(col("toks"), 2),
            g => struct(lit(2).as("n"), g.as("g"))))).as("_ng"))
        .groupBy(col("doc_id"), col("_ng.n").as("n"), md5(col("_ng.g")).as("h"))
        .agg(count(lit(1)).as("c"))
      val tot = cc.groupBy("doc_id", "n").agg(sum("c").as("n_grams"))
      val ov = pairs
        .join(cc.select(col("doc_id").as("cand_id"), col("n"), col("h"),
          col("c").as("c_cand")), "cand_id")
        .join(cc.select(col("doc_id").as("ref_id"), col("n"), col("h"),
          col("c").as("c_ref")), Seq("ref_id", "n", "h"))
        .groupBy("cand_id", "ref_id", "n")
        .agg(sum(least(col("c_cand"), col("c_ref"))).as("overlap"))
      pairs.select(col("cand_id"), col("ref_id"),
          explode(array(lit(1), lit(2))).as("n"))
        .join(tot.select(col("doc_id").as("cand_id"), col("n"),
          col("n_grams").as("n_cand")), Seq("cand_id", "n"), "left_outer")
        .join(tot.select(col("doc_id").as("ref_id"), col("n"),
          col("n_grams").as("n_ref")), Seq("ref_id", "n"), "left_outer")
        .join(ov, Seq("cand_id", "ref_id", "n"), "left_outer")
        .select(col("n"), col("cand_id"), col("ref_id"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          coalesce(col("n_ref"), lit(0L)).as("n_ref"),
          coalesce(col("overlap"), lit(0L)).as("overlap"))
        .select(col("n"), col("cand_id"), col("ref_id"),
          col("n_cand"), col("n_ref"), col("overlap"),
          when(col("n_cand") === 0, lit(null).cast("double"))
            .otherwise(Portable.snap6(
              col("overlap").cast("double") / col("n_cand"))).as("rouge_p"),
          when(col("n_ref") === 0, lit(null).cast("double"))
            .otherwise(Portable.snap6(
              col("overlap").cast("double") / col("n_ref"))).as("rouge_r"),
          when(col("n_cand") + col("n_ref") === 0, lit(null).cast("double"))
            .otherwise(Portable.snap6(lit(2.0) * col("overlap")
              / (col("n_cand") + col("n_ref")))).as("rouge_f"))
        .orderBy("n", "cand_id")
    }),

    // ROUGE-L over the q226 pairing: longest-common-subsequence F-score,
    // the order-aware companion to q226's bag-overlap ROUGE-N (a
    // shuffled paraphrase keeps ROUGE-1 high but drops ROUGE-L). The
    // LCS runs as the native graft_lcs expression — sequence DP is the
    // one text kernel Spark's collection functions genuinely cannot
    // express (intra-row cell dependency), the textbook custom-
    // Expression case. Scores are computed over a fixed token budget
    // ([[RougeLMaxToks]], the q53/MaxTokens discipline: bounded per-pair
    // cost at any scale, and the budget is what makes the DuckDB twin —
    // the DP unrolled over exactly that many steps as plain window
    // prefix-maxes — exact rather than gate-checked). P, R and F are
    // exact integer ratios of (lcs, |a|, |b|); F = 2·lcs/(|a|+|b|).
    "q232_rouge_l" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          slice(T.tokens(col("text")), 1, RougeLMaxToks).as("toks"))
        .localCheckpoint() // feeds the pairing + both token sides
      val wNext = Window.partitionBy("source").orderBy("doc_id")
      val pairs = d.select(col("doc_id").as("cand_id"),
          lead(col("doc_id"), 1).over(wNext).as("ref_id"))
        .filter(col("ref_id").isNotNull)
      pairs
        .join(d.select(col("doc_id").as("cand_id"), col("toks").as("a")),
          "cand_id")
        .join(d.select(col("doc_id").as("ref_id"), col("toks").as("b")),
          "ref_id")
        .select(col("cand_id"), col("ref_id"),
          size(col("a")).cast("long").as("len_cand"),
          size(col("b")).cast("long").as("len_ref"),
          T.lcsLen(col("a"), col("b")).cast("long").as("lcs"))
        .select(col("cand_id"), col("ref_id"), col("len_cand"),
          col("len_ref"), col("lcs"),
          when(col("len_cand") === 0, lit(null).cast("double"))
            .otherwise(Portable.snap6(
              col("lcs").cast("double") / col("len_cand"))).as("rouge_l_p"),
          when(col("len_ref") === 0, lit(null).cast("double"))
            .otherwise(Portable.snap6(
              col("lcs").cast("double") / col("len_ref"))).as("rouge_l_r"),
          when(col("len_cand") + col("len_ref") === 0,
            lit(null).cast("double"))
            .otherwise(Portable.snap6(lit(2.0) * col("lcs")
              / (col("len_cand") + col("len_ref")))).as("rouge_l_f"))
        .orderBy("cand_id")
    }),

    "q219_distinct_ngrams" -> ((s, dir) => {
      val toks = Tables.table(s, dir, "documents")
        .select(T.tokens(col("text")).as("toks"))
        .localCheckpoint() // feeds one explode per n
      DiversityNs.map(n =>
          toks.select(lit(n).as("n"),
            explode(T.wordNgrams(col("toks"), n)).as("g")))
        .reduce(_ unionAll _)
        .select(col("n"), md5(col("g")).as("h"))
        .groupBy("n", "h").agg(count(lit(1)).as("c"))
        .groupBy("n")
        .agg(sum(col("c")).as("n_grams"), count(lit(1)).as("n_distinct"))
        .select(col("n"), col("n_grams"), col("n_distinct"),
          Portable.snap6(col("n_distinct").cast("double")
            / col("n_grams").cast("double")).as("distinct_ratio"))
        .orderBy("n")
    }),

    // Interpolated Kneser-Ney bigram LM over the corpus — the smoothing
    // that actually models continuation novelty (P_cont(w) ∝ how many
    // DISTINCT contexts w follows), vs q87's per-doc add-one LM:
    // P(w|v) = (max(c(vw)−d, 0) + d·N1+(v·)·P_cont(w)) / c(v), d=0.75.
    // Everything is count arithmetic off ONE bigram-type table (four
    // grouped aggregates over types, not tokens); per-type nll rounds to
    // 1e-6 DECIMAL before the token-weighted sum (the q87/q212 pattern)
    // so the corpus cross-entropy is partition-order-free.
    "q220_kn_bigram" -> ((s, dir) => {
      val bi = Tables.table(s, dir, "documents")
        .select(explode(T.wordNgrams(T.tokens(col("text")), 2)).as("bg"))
        .groupBy("bg").agg(count(lit(1)).as("c2"))
        .select(col("c2"),
          split(col("bg"), " ").getItem(0).as("w1"),
          split(col("bg"), " ").getItem(1).as("w2"))
        // EAGER: four consumers reach this frame through BROADCAST
        // exchanges, which materialize on concurrent threads — a lazy
        // checkpoint lets them race to compute the (corpus-scan-sized)
        // RDD before any block is persisted, duplicating the tokenize +
        // bigram shuffle up to 3×. Materializing once up front is what
        // the checkpoint was for (VERDICT r6 task 4: 8.95 s → target 4.5)
        .localCheckpoint(true) // feeds ctx, cont, totals, and the score
      val ctx = bi.groupBy("w1")
        .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1f"))
      val cont = bi.groupBy("w2").agg(count(lit(1)).as("n1b"))
      val tot = bi.agg(count(lit(1)).as("n_types"), sum(col("c2")).as("n_tok"))
      val nCtx = ctx.agg(count(lit(1)).as("n_contexts"))
      val p = (greatest(col("c2").cast("double") - lit(KnD), lit(0.0)) +
        lit(KnD) * col("n1f").cast("double") * col("n1b").cast("double")
          / col("n_types").cast("double")) / col("c1").cast("double")
      bi.join(ctx, "w1").join(cont, "w2").crossJoin(broadcast(tot))
        .select(col("c2"), col("n_types"), col("n_tok"),
          round(-log(2.0, p), 6).cast("decimal(18,6)").as("nll"))
        .groupBy("n_types", "n_tok")
        .agg(sum(col("c2").cast("decimal(12,0)") * col("nll")).as("s"))
        .crossJoin(broadcast(nCtx))
        .select(col("n_tok").as("n_bigrams"), col("n_types"),
          col("n_contexts"),
          round(col("s").cast("double") / col("n_tok").cast("double"), 6)
            .as("xent_bits"))
    }),

    "q87_bigram_xent" -> ((s, dir) =>
      bigramXent(s, dir).orderBy("doc_id")),

    // CCNet-style perplexity bucketing composed on the q87 bigram LM:
    // documents split into head / middle / tail terciles of cross-entropy
    // (head = most predictable). Buckets come from ntile(3) over the
    // TOTAL order (xent, doc_id) so both engines agree exactly even when
    // a document sits on a cut; at 100 TB the cuts would come from
    // approx_percentile (the q66 gate pattern) instead of a global
    // window, trading the exact tercile boundary for no global sort.
    "q96_ppl_buckets" -> ((s, dir) => {
      // composes the UNSORTED xent table (same rows as q87): q87's final
      // orderBy("doc_id") is presentation-only, and embedding it under
      // this query's global ntile window would execute a full doc_id sort
      // whose order the window immediately discards (guide §2.4: "an
      // orderBy used only to make output deterministic")
      val xent = bigramXent(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("xent_bits"), col("doc_id"))
      xent.withColumn("tercile", ntile(3).over(w))
        .select(col("doc_id"), col("xent_bits"),
          when(col("tercile") === 1, "head")
            .when(col("tercile") === 2, "middle")
            .otherwise("tail").as("bucket"))
        .orderBy("doc_id")
    }),

    // Count-min-sketch heavy hitters with an accuracy gate — the q54-HLL
    // pattern for frequency counting: at corpus scale the exact token
    // count table is itself huge; the CMS is a fixed-size mergeable
    // summary (element-wise counter adds commute, so the seeded estimate
    // is deterministic under any partitioning). Production probes ONLY
    // the sketch; this gate runs both and pins every top-k estimate
    // inside the CMS guarantee band: exact <= est <= exact + eps*N.
    // Confidence 0.9999 (depth 10) rather than the usual 0.99: the gate
    // probes TopkTokens items, so the union-bound failure probability
    // must stay negligible or a legit CMS excursion on regenerated bench
    // data would fail the oracle without any code bug.
    "q67_cms_heavy_hitters" -> ((s, dir) => {
      val toks = Tables.table(s, dir, "documents")
        .select(explode(T.tokens(col("text"))).as("tok"))
      val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val total = tf.agg(sum(col("cnt")).as("n_total"))
      val sketch = toks.agg(
        expr(s"count_min_sketch(tok, ${CmsEps}d, 0.9999d, 42)").as("cms"))
      val top = tf.orderBy(col("cnt").desc, col("tok")).limit(TopkTokens)
      top.crossJoin(sketch).crossJoin(total)
        .select(col("tok"), col("cnt"),
          (T.cmsProbe(col("cms"), col("tok")) >= col("cnt") &&
            T.cmsProbe(col("cms"), col("tok")) <=
              col("cnt") + ceil(lit(CmsEps) * col("n_total")).cast("long"))
            .as("cms_ok"))
        .orderBy(col("cnt").desc, col("tok"))
    }),

    // Gopher-style hard rule filter: token count, mean token length, alpha
    // run share, stopword presence. Emits a failure BITMASK (which rules
    // rejected the doc), not just the verdict — the reject-reason ledger a
    // curation pipeline reports. Zero-token docs fail the null-propagating
    // rules on both engines (CASE WHEN NULL -> ELSE branch).
    // Filter-attribution ablation over the q65 rule set — the report a
    // pipeline tunes thresholds with: per rule, how many docs FAIL it at
    // all vs fail it EXCLUSIVELY (mask == that bit alone — exactly the
    // docs that rule's removal would regain). Joint failures need no rule
    // change; exclusive failures are each rule's real marginal cost. One
    // scan, one 10-counter aggregate over the shared mask expression.
    "q206_filter_attribution" -> ((s, dir) => {
      val ts = T.tokenStats(col("text"))
      val n = ts.getField("ws_tokens")
      val avgLen = T.avgTokenLength(col("text"))
      val alphaOk = ts.getField("alpha_tokens") >= n * 0.8
      val stopHits = T.vocabHitsText(col("text"), stopwords)
      val mask =
        when(n >= MinTokens && n <= MaxTokens, 0).otherwise(1) +
          when(avgLen >= 3.0 && avgLen <= 10.0, 0).otherwise(2) +
          when(alphaOk, 0).otherwise(4) +
          when(stopHits >= 2, 0).otherwise(8)
      val m = Tables.table(s, dir, "documents").select(mask.as("mask"))
      def fail(bit: Int) =
        sum(when(col("mask").bitwiseAND(lit(bit)) =!= 0, 1L).otherwise(0L))
      def excl(bit: Int) =
        sum(when(col("mask") === bit, 1L).otherwise(0L))
      m.agg(count(lit(1)).as("n_docs"),
        sum(when(col("mask") === 0, 1L).otherwise(0L)).as("n_kept"),
        fail(1).as("fail_len"), fail(2).as("fail_avglen"),
        fail(4).as("fail_alpha"), fail(8).as("fail_stop"),
        excl(1).as("excl_len"), excl(2).as("excl_avglen"),
        excl(4).as("excl_alpha"), excl(8).as("excl_stop"))
    }),

    "q65_rule_filter" -> ((s, dir) => {
      val ts = T.tokenStats(col("text"))
      val n = ts.getField("ws_tokens")
      val avgLen = T.avgTokenLength(col("text"))
      val alphaOk = ts.getField("alpha_tokens") >= n * 0.8
      val stopHits = T.vocabHitsText(col("text"), stopwords)
      val mask =
        when(n >= MinTokens && n <= MaxTokens, 0).otherwise(1) +
          when(avgLen >= 3.0 && avgLen <= 10.0, 0).otherwise(2) +
          when(alphaOk, 0).otherwise(4) +
          when(stopHits >= 2, 0).otherwise(8)
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), n.as("n_toks"), mask.as("fail_mask"),
          (mask === 0).as("keep"))
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

  /** Per-document add-one-smoothed bigram cross-entropy (UNSORTED) — the
    * pipeline shared by q87 (which adds the presentation orderBy) and
    * q96 (which feeds it straight into the tercile window; composing
    * q87's sorted frame would embed a doc_id sort the window's own
    * (xent_bits, doc_id) sort immediately discards).
    *
    * Tokenization feeds three consumers (bigram counts, vocab, the
    * probe-side join) — cache it instead of re-scanning per branch (the
    * Dedup.allPairsJaccard pattern). The scan is spread first: tokenize +
    * the bigram explode below are the heavy maps, and a 1-split scan
    * would pin them (and both checkpoints) to one core (round-9 fleet
    * profile: q87 carried the suite's last >1 s of narrow-stage time). */
  private def bigramXent(s: SparkSession, dir: String): DataFrame = {
    val toks = graft.plans.Spread(Tables.table(s, dir, "documents"))
      .select(col("doc_id"), T.tokens(col("text")).as("toks"))
      .localCheckpoint()
    val docBigrams = toks
      .select(col("doc_id"), explode(T.wordNgrams(col("toks"), 2)).as("bigram"))
      .localCheckpoint()
    val bi = docBigrams.groupBy(col("bigram")).agg(count(lit(1)).as("c2"))
    val parts = bi.withColumn("w1", split(col("bigram"), " ").getItem(0))
    val ctx = parts.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val vocab = toks.select(explode(col("toks")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val model = parts.join(ctx, "w1").crossJoin(vocab)
      .select(col("bigram"),
        round(-log(2.0, (col("c2") + 1).cast("double") / (col("c1") + col("v"))), 6)
          .cast("decimal(18,6)").as("nll"))
    docBigrams.join(model, "bigram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll")).as("_s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("_s").cast("double") / col("n_bigrams"), 6).as("xent_bits"))
  }

  /** RE2-safe PII patterns (no lookarounds — portable to DuckDB). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val DigitsPattern = "[0-9]{6,}"

  /** q230 secret-screen knobs: plant cadence, minimum token length,
    * minimum distinct characters (a 32-hex md5 easily clears both;
    * natural words clear neither). */
  val SecretPlantMod = 7
  val SecretMinLen = 24
  val SecretMinDistinct = 12

  /** q232 ROUGE-L token budget — both the per-pair DP cost bound and the
    * unroll depth of the DuckDB twin. */
  val RougeLMaxToks = 24

  /** q63/q64/q65 knobs: heavy-hitter list size, PMI support floor and list
    * size, rule-filter token-count band. */
  val TopkTokens = 20

  /** n-gram orders for the q219 distinct-n diversity curve. */
  val DiversityNs: Seq[Int] = Seq(1, 2, 3, 4)
  /** Kneser-Ney absolute discount (q220). */
  val KnD = 0.75
  val PmiMinCount = 5
  val PmiTopK = 50
  val MinTokens = 40
  val MaxTokens = 1000

  /** q67 count-min-sketch error bound (over-count <= CmsEps * N). */
  val CmsEps = 0.001

  // ---- DuckDB twins --------------------------------------------------------

  /** DuckDB: non-empty whitespace tokens of `text`. */
  def toksSql(text: String): String =
    s"list_filter(regexp_split_to_array($text, '\\s+'), t -> len(t) > 0)"

  private def hitsSql(toks: String, ws: Seq[String]): String =
    s"len(list_filter($toks, t -> t IN (${ws.map(w => s"'$w'").mkString(", ")})))"

  /** Shared CTE chain of the q87 bigram LM (also the base of q96's
    * buckets): ends with `per(doc_id, n_bigrams, s)`. */
  private def bigramXentCtes: String =
    s"""d AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
       |db AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
       |         THEN list_transform(generate_series(1, len(toks) - 1),
       |                i -> array_to_string(list_slice(toks, i, i + 1), ' '))
       |         ELSE CAST([] AS VARCHAR[]) END) AS bigram FROM d),
       |bi AS (SELECT bigram, count(*) AS c2 FROM db GROUP BY bigram),
       |parts AS (SELECT bigram, c2, string_split(bigram, ' ')[1] AS w1 FROM bi),
       |ctx AS (SELECT w1, sum(c2) AS c1 FROM parts GROUP BY w1),
       |vocab AS (SELECT count(DISTINCT tok) AS v
       |          FROM (SELECT unnest(toks) AS tok FROM d)),
       |model AS (SELECT bigram,
       |            CAST(ROUND(-log2((c2 + 1.0) / (c1 + (SELECT v FROM vocab))), 6)
       |                 AS DECIMAL(18,6)) AS nll
       |          FROM parts JOIN ctx USING (w1)),
       |per AS (SELECT doc_id, count(*) AS n_bigrams, sum(nll) AS s
       |        FROM db JOIN model USING (bigram) GROUP BY doc_id)""".stripMargin

  def oracles: Map[String, String] = Map(

    // The LCS DP unrolled over RougeLMaxToks steps: step t consumes the
    // cand's t-th token; new[j] = max(prev[j], prefixmax_{k<=j, b_k=a_t}
    // (prev[k-1]+1)) — valid because DP rows are monotone, and every
    // construct is a plain window function (no DuckDB lambdas, which
    // mis-evaluate nested captures at these sizes — see LcsLen scaladoc).
    "q232_rouge_l" -> {
      val K = RougeLMaxToks
      val steps = (1 to K).map { t =>
        s"""r$t AS (
           |  SELECT pair, j, tok,
           |    GREATEST(val, coalesce(max(CASE WHEN tok = a_t
           |         THEN lag_val + 1 END)
           |       OVER (PARTITION BY pair ORDER BY j
           |             ROWS UNBOUNDED PRECEDING), 0)) AS val
           |  FROM (
           |    SELECT r.pair, r.j, r.tok, r.val,
           |           coalesce(lag(r.val) OVER (PARTITION BY r.pair
           |             ORDER BY r.j), 0) AS lag_val,
           |           at$t.atok AS a_t
           |    FROM r${t - 1} r LEFT JOIN atok at$t
           |      ON at$t.pair = r.pair AND at$t.t = $t))""".stripMargin
      }.mkString(",\n")
      s"""WITH d AS (SELECT doc_id, source,
         |             (${toksSql("text")})[1:$K] AS toks FROM documents),
         |pairs AS (SELECT cand_id, ref_id FROM (
         |            SELECT doc_id AS cand_id,
         |                   lead(doc_id) OVER (PARTITION BY source
         |                     ORDER BY doc_id) AS ref_id
         |            FROM d) WHERE ref_id IS NOT NULL),
         |atok AS (SELECT p.cand_id AS pair, t, dc.toks[t] AS atok
         |         FROM pairs p JOIN d dc ON dc.doc_id = p.cand_id
         |              CROSS JOIN generate_series(1, $K) AS g(t)
         |         WHERE t <= len(dc.toks)),
         |r0 AS (SELECT p.cand_id AS pair, j, dr.toks[j] AS tok, 0 AS val
         |       FROM pairs p JOIN d dr ON dr.doc_id = p.ref_id
         |            CROSS JOIN generate_series(1, $K) AS g(j)
         |       WHERE j <= len(dr.toks)),
         |$steps,
         |l AS (SELECT pair, max(val) AS lcs FROM r$K GROUP BY pair),
         |base AS (
         |  SELECT p.cand_id, p.ref_id,
         |         len(dc.toks) AS len_cand, len(dr.toks) AS len_ref,
         |         coalesce(l.lcs, 0) AS lcs
         |  FROM pairs p
         |    JOIN d dc ON dc.doc_id = p.cand_id
         |    JOIN d dr ON dr.doc_id = p.ref_id
         |    LEFT JOIN l ON l.pair = p.cand_id)
         |SELECT cand_id, ref_id,
         |       CAST(len_cand AS BIGINT) AS len_cand,
         |       CAST(len_ref AS BIGINT) AS len_ref,
         |       CAST(lcs AS BIGINT) AS lcs,
         |       CASE WHEN len_cand = 0 THEN NULL ELSE ${Portable.snap6Sql(
                 "CAST(lcs AS DOUBLE) / len_cand")} END AS rouge_l_p,
         |       CASE WHEN len_ref = 0 THEN NULL ELSE ${Portable.snap6Sql(
                 "CAST(lcs AS DOUBLE) / len_ref")} END AS rouge_l_r,
         |       CASE WHEN len_cand + len_ref = 0 THEN NULL
         |            ELSE ${Portable.snap6Sql(
                 "2.0 * lcs / (len_cand + len_ref)")} END AS rouge_l_f
         |FROM base ORDER BY cand_id""".stripMargin
    },

    "q226_rouge_overlap" -> {
      val g2 =
        """CASE WHEN len(toks) >= 2
          |  THEN list_transform(generate_series(1, len(toks) - 1),
          |         i -> md5(array_to_string(list_slice(toks, i, i + 1), ' ')))
          |  ELSE CAST([] AS VARCHAR[]) END""".stripMargin
      s"""WITH d AS (SELECT doc_id, source, ${toksSql("text")} AS toks
         |           FROM documents),
         |pairs AS (SELECT cand_id, ref_id FROM (
         |            SELECT doc_id AS cand_id,
         |                   lead(doc_id) OVER (PARTITION BY source
         |                     ORDER BY doc_id) AS ref_id
         |            FROM d) WHERE ref_id IS NOT NULL),
         |g AS (SELECT 1 AS n, doc_id,
         |             unnest(list_transform(toks, t -> md5(t))) AS h FROM d
         |      UNION ALL
         |      SELECT 2 AS n, doc_id, unnest($g2) AS h FROM d),
         |cc AS (SELECT n, doc_id, h, count(*) AS c FROM g GROUP BY 1, 2, 3),
         |tot AS (SELECT n, doc_id, sum(c) AS n_grams FROM cc GROUP BY 1, 2),
         |ov AS (SELECT a.n, p.cand_id, p.ref_id,
         |              sum(least(a.c, b.c)) AS overlap
         |       FROM pairs p
         |         JOIN cc a ON a.doc_id = p.cand_id
         |         JOIN cc b ON b.doc_id = p.ref_id AND b.h = a.h
         |                  AND b.n = a.n
         |       GROUP BY 1, 2, 3),
         |base AS (SELECT ns.n, p.cand_id, p.ref_id,
         |                coalesce(tc.n_grams, 0) AS n_cand,
         |                coalesce(tr.n_grams, 0) AS n_ref,
         |                coalesce(ov.overlap, 0) AS overlap
         |         FROM pairs p
         |           CROSS JOIN (SELECT 1 AS n UNION ALL SELECT 2) ns
         |           LEFT JOIN tot tc ON tc.n = ns.n AND tc.doc_id = p.cand_id
         |           LEFT JOIN tot tr ON tr.n = ns.n AND tr.doc_id = p.ref_id
         |           LEFT JOIN ov ON ov.n = ns.n AND ov.cand_id = p.cand_id
         |                       AND ov.ref_id = p.ref_id)
         |SELECT CAST(n AS INTEGER) AS n, cand_id, ref_id,
         |       CAST(n_cand AS BIGINT) AS n_cand,
         |       CAST(n_ref AS BIGINT) AS n_ref,
         |       CAST(overlap AS BIGINT) AS overlap,
         |       CASE WHEN n_cand = 0 THEN NULL ELSE ${Portable.snap6Sql(
                 "CAST(overlap AS DOUBLE) / n_cand")} END AS rouge_p,
         |       CASE WHEN n_ref = 0 THEN NULL ELSE ${Portable.snap6Sql(
                 "CAST(overlap AS DOUBLE) / n_ref")} END AS rouge_r,
         |       CASE WHEN n_cand + n_ref = 0 THEN NULL ELSE ${Portable.snap6Sql(
                 "2.0 * overlap / (n_cand + n_ref)")} END AS rouge_f
         |FROM base ORDER BY n, cand_id""".stripMargin
    },

    "q219_distinct_ngrams" -> {
      val perN = DiversityNs.map { n =>
        val grams =
          if (n == 1) "list_transform(toks, t -> md5(t))"
          else
            s"""CASE WHEN len(toks) >= $n
               |  THEN list_transform(generate_series(1, len(toks) - ${n - 1}),
               |         i -> md5(array_to_string(list_slice(toks, i, i + ${n - 1}), ' ')))
               |  ELSE CAST([] AS VARCHAR[]) END""".stripMargin
        s"SELECT $n AS n, unnest($grams) AS h FROM d"
      }.mkString("\n UNION ALL\n")
      s"""WITH d AS (SELECT ${toksSql("text")} AS toks FROM documents),
         |g AS ($perN),
         |c AS (SELECT n, h, count(*) AS c FROM g GROUP BY 1, 2)
         |SELECT CAST(n AS INTEGER) AS n,
         |       CAST(sum(c) AS BIGINT) AS n_grams,
         |       CAST(count(*) AS BIGINT) AS n_distinct,
         |       ${Portable.snap6Sql(
                   "CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE)")}
         |         AS distinct_ratio
         |FROM c GROUP BY n ORDER BY n""".stripMargin
    },

    "q220_kn_bigram" -> {
      val p = s"(greatest(CAST(c2 AS DOUBLE) - $KnD, 0.0)" +
        s" + $KnD * CAST(n1f AS DOUBLE) * CAST(n1b AS DOUBLE)" +
        " / CAST(n_types AS DOUBLE)) / CAST(c1 AS DOUBLE)"
      s"""WITH d AS (SELECT ${toksSql("text")} AS toks FROM documents),
         |db AS (SELECT unnest(CASE WHEN len(toks) >= 2
         |         THEN list_transform(generate_series(1, len(toks) - 1),
         |                i -> array_to_string(list_slice(toks, i, i + 1), ' '))
         |         ELSE CAST([] AS VARCHAR[]) END) AS bg FROM d),
         |bi AS (SELECT string_split(bg, ' ')[1] AS w1,
         |              string_split(bg, ' ')[2] AS w2,
         |              count(*) AS c2
         |       FROM db GROUP BY bg),
         |ctx AS (SELECT w1, sum(c2) AS c1, count(*) AS n1f
         |        FROM bi GROUP BY w1),
         |cont AS (SELECT w2, count(*) AS n1b FROM bi GROUP BY w2),
         |tot AS (SELECT count(*) AS n_types, sum(c2) AS n_tok FROM bi),
         |nc AS (SELECT count(*) AS n_contexts FROM ctx),
         |scored AS (
         |  SELECT c2,
         |         CAST(ROUND(-log2($p), 6) AS DECIMAL(18,6)) AS nll
         |  FROM bi JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN tot),
         |agg AS (SELECT sum(CAST(c2 AS DECIMAL(12,0)) * nll) AS s
         |        FROM scored)
         |SELECT CAST(n_tok AS BIGINT) AS n_bigrams,
         |       CAST(n_types AS BIGINT) AS n_types,
         |       CAST(n_contexts AS BIGINT) AS n_contexts,
         |       ROUND(CAST(s AS DOUBLE) / CAST(n_tok AS DOUBLE), 6)
         |         AS xent_bits
         |FROM agg CROSS JOIN tot CROSS JOIN nc""".stripMargin
    },

    "q155_blocklist" -> {
      // the oracle replays each pattern as an independent strpos probe;
      // concat_ws drops the NULL (non-matching) branches, reproducing the
      // automaton's sorted-id list exactly
      val hitCases = blocklist.zipWithIndex.map { case (p, i) =>
        s"CASE WHEN strpos(text, '$p') > 0 THEN '$i' END"
      }.mkString(",\n         |         ")
      val nHits = blocklist.map(p =>
        s"CASE WHEN strpos(text, '$p') > 0 THEN 1 ELSE 0 END")
        .mkString(" +\n         |         ")
      s"""SELECT doc_id,
         |       CAST($nHits AS INTEGER) AS n_hits,
         |       concat_ws(',',
         |         $hitCases) AS hit_ids
         |FROM documents
         |WHERE $nHits > 0
         |ORDER BY doc_id""".stripMargin
    },

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

    "q189_lang_confusion" -> {
      val scores = langProfiles.map { case (l, ws) =>
        s"${hitsSql("toks", ws)} AS s_$l" }
      val greatest =
        s"greatest(${langProfiles.map(p => s"s_${p._1}").mkString(", ")})"
      val best = langProfiles.map(_._1).foldRight("'und'") { (l, rest) =>
        s"CASE WHEN s_$l = $greatest AND s_$l > 0 THEN '$l' ELSE $rest END"
      }
      s"""WITH t AS (SELECT lang, ${toksSql("text")} AS toks FROM documents),
         |sc AS (SELECT lang, ${scores.mkString(", ")} FROM t),
         |p AS (SELECT lang, $best AS pred_lang FROM sc),
         |cells AS (
         |  SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
         |  FROM p GROUP BY 1, 2)
         |SELECT lang, pred_lang, n,
         |       CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_lang,
         |       ${Portable.snap6Sql("CAST(n AS DOUBLE) / " +
             "(sum(n) OVER (PARTITION BY lang))")} AS row_frac,
         |       lang = pred_lang AS agree
         |FROM cells ORDER BY lang, pred_lang""".stripMargin
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
         |       ${Portable.snap6Sql(graft.functions.TextFunctions.qualityScoreSql(stopwords))} AS quality
         |FROM t ORDER BY doc_id""".stripMargin,

    "q22_token_stats" ->
      s"""SELECT doc_id,
         |       CAST(len(${toksSql("text")}) AS INTEGER) AS ws_tokens,
         |       CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS INTEGER) AS alpha_tokens,
         |       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INTEGER) AS bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q230_secret_scan" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % $SecretPlantMod = 0
         |              THEN text || ' token sk_' || md5(CAST(doc_id AS VARCHAR))
         |              ELSE text END AS wp
         |  FROM documents),
         |toks AS (SELECT doc_id, unnest(${toksSql("wp")}) AS tok FROM t),
         |cand AS (
         |  SELECT doc_id, tok FROM toks
         |  WHERE len(tok) >= $SecretMinLen
         |    AND regexp_matches(tok, '^[A-Za-z0-9_\\-]+$$')
         |    AND regexp_matches(tok, '[0-9]')
         |    AND regexp_matches(tok, '[A-Za-z]')
         |    AND len(list_distinct(string_split(tok, ''))) >= $SecretMinDistinct)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_secrets,
         |       CAST(max(len(tok)) AS BIGINT) AS max_len
         |FROM cand GROUP BY 1 ORDER BY 1""".stripMargin,

    "q229_tokenizer_fertility" ->
      s"""WITH d AS (
         |  SELECT coalesce(lang, '') AS lang,
         |         CAST(octet_length(encode(text)) AS BIGINT) AS bytes,
         |         CAST(len(${toksSql("text")}) AS BIGINT) AS ws,
         |         CAST(len(regexp_extract_all(text,
         |           '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS bpe
         |  FROM documents),
         |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |             CAST(sum(bytes) AS BIGINT) AS n_bytes,
         |             CAST(sum(ws) AS BIGINT) AS ws_tokens,
         |             CAST(sum(bpe) AS BIGINT) AS bpe_tokens
         |      FROM d GROUP BY 1)
         |SELECT lang, n_docs, n_bytes, ws_tokens, bpe_tokens,
         |       CASE WHEN ws_tokens = 0 THEN NULL ELSE ${Portable.snap6Sql(
               "CAST(bpe_tokens AS DOUBLE) / ws_tokens")} END AS fertility,
         |       CASE WHEN bpe_tokens = 0 THEN NULL ELSE ${Portable.snap6Sql(
               "CAST(n_bytes AS DOUBLE) / bpe_tokens")} END AS bytes_per_token
         |FROM a ORDER BY lang""".stripMargin,

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

    "q62_surprisal" ->
      s"""WITH toks AS (SELECT doc_id, unnest(${toksSql("text")}) AS tok FROM documents),
         |tf AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
         |n AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total FROM tf),
         |surp AS (SELECT tok,
         |           CAST(ROUND(-ln(CAST(cnt AS DOUBLE) / (SELECT n_total FROM n)), 6)
         |                AS DECIMAL(18,6)) AS s
         |         FROM tf)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         |       ROUND(CAST(sum(s) AS DOUBLE), 6) AS sum_surprisal,
         |       ROUND(CAST(sum(s) AS DOUBLE) / count(*), 6) AS mean_surprisal
         |FROM toks JOIN surp USING (tok)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q63_token_topk" ->
      s"""WITH toks AS (SELECT unnest(${toksSql("text")}) AS tok FROM documents),
         |tf AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
         |n AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n_total FROM tf),
         |ranked AS (SELECT tok, cnt,
         |             ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank
         |           FROM tf)
         |SELECT CAST(rank AS INTEGER) AS rank, tok, CAST(cnt AS BIGINT) AS cnt,
         |       ROUND(cnt / (SELECT n_total FROM n), 6) AS share
         |FROM ranked WHERE rank <= $TopkTokens ORDER BY rank""".stripMargin,

    "q64_pmi_bigrams" ->
      s"""WITH d AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
         |uni AS (SELECT tok, count(*) AS c1
         |        FROM (SELECT unnest(toks) AS tok FROM d) GROUP BY tok),
         |bi AS (SELECT bigram, count(*) AS cab FROM (
         |         SELECT unnest(CASE WHEN len(toks) >= 2
         |           THEN list_transform(generate_series(1, len(toks) - 1),
         |                  i -> array_to_string(list_slice(toks, i, i + 1), ' '))
         |           ELSE CAST([] AS VARCHAR[]) END) AS bigram FROM d)
         |       GROUP BY bigram HAVING count(*) >= $PmiMinCount),
         |nuni AS (SELECT CAST(sum(c1) AS DOUBLE) AS n_uni FROM uni),
         |nbi AS (SELECT CAST(sum(cab) AS DOUBLE) AS n_bi FROM bi),
         |parts AS (SELECT bigram, cab, string_split(bigram, ' ')[1] AS w1,
         |                 string_split(bigram, ' ')[2] AS w2 FROM bi),
         |scored AS (SELECT bigram, cab, ua.c1 AS ca, ub.c1 AS cb,
         |             ROUND(ln((CAST(cab AS DOUBLE) / (SELECT n_bi FROM nbi))
         |               / ((CAST(ua.c1 AS DOUBLE) / (SELECT n_uni FROM nuni))
         |                  * (CAST(ub.c1 AS DOUBLE) / (SELECT n_uni FROM nuni)))), 6) AS pmi
         |           FROM parts
         |           JOIN uni ua ON ua.tok = parts.w1
         |           JOIN uni ub ON ub.tok = parts.w2),
         |ranked AS (SELECT *, ROW_NUMBER() OVER (ORDER BY pmi DESC, bigram) AS rn
         |           FROM scored)
         |SELECT bigram, CAST(cab AS BIGINT) AS cab, CAST(ca AS BIGINT) AS ca,
         |       CAST(cb AS BIGINT) AS cb, pmi
         |FROM ranked WHERE rn <= $PmiTopK ORDER BY pmi DESC, bigram""".stripMargin,

    "q87_bigram_xent" ->
      s"""WITH $bigramXentCtes
         |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
         |       ROUND(CAST(s AS DOUBLE) / n_bigrams, 6) AS xent_bits
         |FROM per ORDER BY doc_id""".stripMargin,

    "q96_ppl_buckets" ->
      s"""WITH $bigramXentCtes,
         |x AS (SELECT doc_id,
         |             ROUND(CAST(s AS DOUBLE) / n_bigrams, 6) AS xent_bits
         |      FROM per)
         |SELECT doc_id, xent_bits,
         |       CASE NTILE(3) OVER (ORDER BY xent_bits, doc_id)
         |            WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
         |            ELSE 'tail' END AS bucket
         |FROM x ORDER BY doc_id""".stripMargin,

    "q67_cms_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest(${toksSql("text")}) AS tok FROM documents),
         |tf AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
         |ranked AS (SELECT tok, cnt,
         |             ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rn
         |           FROM tf)
         |SELECT tok, CAST(cnt AS BIGINT) AS cnt, TRUE AS cms_ok
         |FROM ranked WHERE rn <= $TopkTokens ORDER BY cnt DESC, tok""".stripMargin,

    "q206_filter_attribution" -> {
      val hits = hitsSql("toks", stopwords)
      s"""WITH t AS (SELECT doc_id, text, ${toksSql("text")} AS toks FROM documents),
         |f AS (SELECT doc_id, len(toks) AS n,
         |        CASE WHEN len(toks) = 0 THEN NULL
         |             ELSE CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / len(toks)
         |        END AS avg_len,
         |        len(regexp_extract_all(text, '[a-zA-Z]+')) AS alpha,
         |        $hits AS hits
         |      FROM t),
         |m AS (SELECT doc_id,
         |        (CASE WHEN n >= $MinTokens AND n <= $MaxTokens THEN 0 ELSE 1 END)
         |        + (CASE WHEN avg_len >= 3.0 AND avg_len <= 10.0 THEN 0 ELSE 2 END)
         |        + (CASE WHEN alpha >= n * 0.8 THEN 0 ELSE 4 END)
         |        + (CASE WHEN hits >= 2 THEN 0 ELSE 8 END) AS mask
         |      FROM f)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN mask = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       CAST(sum(CASE WHEN (mask & 1) != 0 THEN 1 ELSE 0 END) AS BIGINT) AS fail_len,
         |       CAST(sum(CASE WHEN (mask & 2) != 0 THEN 1 ELSE 0 END) AS BIGINT) AS fail_avglen,
         |       CAST(sum(CASE WHEN (mask & 4) != 0 THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha,
         |       CAST(sum(CASE WHEN (mask & 8) != 0 THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop,
         |       CAST(sum(CASE WHEN mask = 1 THEN 1 ELSE 0 END) AS BIGINT) AS excl_len,
         |       CAST(sum(CASE WHEN mask = 2 THEN 1 ELSE 0 END) AS BIGINT) AS excl_avglen,
         |       CAST(sum(CASE WHEN mask = 4 THEN 1 ELSE 0 END) AS BIGINT) AS excl_alpha,
         |       CAST(sum(CASE WHEN mask = 8 THEN 1 ELSE 0 END) AS BIGINT) AS excl_stop
         |FROM m""".stripMargin
    },

    "q65_rule_filter" -> {
      val hits = hitsSql("toks", stopwords)
      s"""WITH t AS (SELECT doc_id, text, ${toksSql("text")} AS toks FROM documents),
         |f AS (SELECT doc_id, len(toks) AS n,
         |        CASE WHEN len(toks) = 0 THEN NULL
         |             ELSE CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / len(toks)
         |        END AS avg_len,
         |        len(regexp_extract_all(text, '[a-zA-Z]+')) AS alpha,
         |        $hits AS hits
         |      FROM t),
         |m AS (SELECT doc_id, n,
         |        (CASE WHEN n >= $MinTokens AND n <= $MaxTokens THEN 0 ELSE 1 END)
         |        + (CASE WHEN avg_len >= 3.0 AND avg_len <= 10.0 THEN 0 ELSE 2 END)
         |        + (CASE WHEN alpha >= n * 0.8 THEN 0 ELSE 4 END)
         |        + (CASE WHEN hits >= 2 THEN 0 ELSE 8 END) AS mask
         |      FROM f)
         |SELECT doc_id, CAST(n AS INTEGER) AS n_toks,
         |       CAST(mask AS INTEGER) AS fail_mask, mask = 0 AS keep
         |FROM m ORDER BY doc_id""".stripMargin
    },

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
