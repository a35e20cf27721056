package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.functions.TextFunctions
import graft.sources.Tables

/** Corpus-preparation queries over the documents/events tables: the
  * deterministic split/sample/canonicalize/chunk stages of a training-data
  * pipeline (CorpusOps) plus sketch-based counting and the compression
  * quality signal.
  *
  * Every query here is oracle-checked. The hash/sampling/URL/chunk ops are
  * replicated exactly in DuckDB (md5 hex + basic regex are portable); the
  * two engine-specific kernels (HyperLogLog, deflate) emit deterministic
  * quality GATES the oracle pins (exact counts + booleans) — a hash
  * mismatch means the sketch or signal left its accuracy envelope.
  */
object PipelinePack extends QueryPack {

  /** q95's token budget — ONE definition interpolated into both engines. */
  val MixPlanBudget = 100000L

  /** q175: id offset for planted exact-copy documents. */
  val LeakCopyOffset = 1000000L

  /** q178: epochs simulated and output shards per epoch. */
  val ShuffleEpochs = 2
  val ShuffleShards = 8L

  /** q204 purged temporal split: train before the cut, test from
    * cut + 3 days, the gap purged (embargo = 259200 s). */
  val EmbargoCut = "2024-01-20 00:00:00"
  val EmbargoTestFrom = "2024-01-23 00:00:00"
  val EmbargoSeconds = 259200L

  /** q211 label construction: per-cutoff observation lookback and outcome
    * horizon (both 7 days), two cutoffs inside the events range. */
  val LabelCutoffs = Seq("2024-01-10 00:00:00", "2024-01-20 00:00:00")
  val LabelWindowDays = 7

  /** Sampling temperature for the q154 mix plan: p_i ∝ tokens_i^alpha.
    * alpha=1 is proportional (big sources dominate), alpha=0 is uniform
    * (q95's plan); 0.7 is the usual multilingual/multi-source compromise
    * that up-weights small sources without drowning large ones. */
  val MixAlpha = 0.7

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  /** Synthetic absolute URL per document, messy on purpose (mixed-case
    * scheme/host, default port, www, tracking params, fragment). Built
    * identically in the DuckDB twin so normalization is exercised on real
    * variety: doc_ids collide on (mod 40) after canonicalization. */
  private def syntheticUrl = concat(
    lit("HTTPS://WWW."), col("source"), lit(".Example.COM:443/docs/"),
    (col("doc_id") % 40).cast("string"),
    lit("/page?utm_source=feed&utm_campaign=c"), (col("doc_id") % 3).cast("string"),
    lit("&id="), (col("doc_id") % 20).cast("string"),
    lit("#sec"), (col("doc_id") % 5).cast("string"))

  private val urlSql =
    """'HTTPS://WWW.' || source || '.Example.COM:443/docs/' ||
      |CAST(doc_id % 40 AS VARCHAR) ||
      |'/page?utm_source=feed&utm_campaign=c' || CAST(doc_id % 3 AS VARCHAR) ||
      |'&id=' || CAST(doc_id % 20 AS VARCHAR) ||
      |'#sec' || CAST(doc_id % 5 AS VARCHAR)""".stripMargin

  /** Line rendering for q61: content-line width in tokens, and the
    * distinct-document frequency at which a line counts as boilerplate
    * (per-source headers/footers hit ~25 docs at sf0.01; unique content
    * lines hit 1). */
  private val LineWindow = 12
  private val LineMaxDocFreq = 10

  /** Per-language keep fractions for the stratified sample: downsample the
    * dominant language, keep all of the rarest (the domain-rebalancing
    * shape of a training mix). */
  private val StratFracs = Map("en" -> 0.25, "zh" -> 1.0)
  private val StratDefault = 0.5

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Deterministic md5-bucket train/val/test split: layout-independent
    // (unlike rand(seed)), exhaustive and disjoint by construction.
    // Purged temporal split with an embargo gap — the time-series-ML
    // split that prevents TEMPORAL leakage (a model must not train on
    // events adjacent to its test window; label horizons straddle the
    // cut): train = events strictly before the cut, test = events at or
    // after cut + embargo, the gap rows are PURGED. The audit emits the
    // ledger plus the proof: the minimum per-user gap between last train
    // event and first test event, in exact epoch seconds — by
    // construction >= the embargo, and the flag pins it. One shuffle on
    // user_id for the per-user extremes; the split itself is scan-stage.
    "q204_embargo_split" -> ((s, dir) => {
      val cut = lit(EmbargoCut).cast("timestamp")
      val testFrom = lit(EmbargoTestFrom).cast("timestamp")
      // Tables.events (NOT Tables.table): it normalizes every driver ts
      // fixture variant — TIMESTAMP(NANOS)-as-BIGINT included — to
      // TIMESTAMP in the UTC session zone, so the epoch arithmetic below
      // can never silently read nanos as seconds
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("ts"),
          when(col("ts") < cut, "train")
            .when(col("ts") >= testFrom, "test")
            .otherwise("purged").as("part"))
      val epochS = expr("unix_micros(ts) DIV 1000000")
      val perUser = e.groupBy("user_id")
        .agg(max(when(col("part") === "train", epochS)).as("last_train_s"),
          min(when(col("part") === "test", epochS)).as("first_test_s"))
        .filter(col("last_train_s").isNotNull && col("first_test_s").isNotNull)
      val gaps = perUser.agg(
        count(lit(1)).as("n_users_both"),
        min(col("first_test_s") - col("last_train_s")).as("min_gap_s"))
      val sizes = e.groupBy()
        .agg(sum(when(col("part") === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when(col("part") === "test", 1L).otherwise(0L)).as("n_test"),
          sum(when(col("part") === "purged", 1L).otherwise(0L)).as("n_purged"))
      sizes.crossJoin(broadcast(gaps))
        .select(col("n_train"), col("n_test"), col("n_purged"),
          col("n_users_both"), col("min_gap_s"),
          (col("min_gap_s") >= EmbargoSeconds).as("embargo_ok"))
    }),

    // Supervised-label construction — the step that turns an event log
    // into a training table WITHOUT temporal leakage: for each (user,
    // cutoff), features aggregate ONLY the observation window
    // (cutoff-7d, cutoff] and the label looks ONLY at the outcome
    // horizon (cutoff, cutoff+7d]. Strict window edges are the whole
    // point (an event AT the cutoff is observable; one after it is
    // future) — the same discipline as the q204 embargo, applied to
    // label building. Cutoffs ride a tiny exploded literal frame; one
    // shuffle on (user, cutoff).
    "q211_churn_labels" -> ((s, dir) => {
      // Tables.events for the same ts-normalization reason as q204
      val e = Tables.events(s, dir)
        .filter(col("user_id").isNotNull && col("user_id") % 5 === 0)
        .select(col("user_id"), col("ts"), col("event_type"))
      val cuts = LabelCutoffs.map(c =>
        struct(lit(c).as("cut_s"), lit(c).cast("timestamp").as("cut")))
      val framed = e.select(col("user_id"), col("ts"), col("event_type"),
          explode(array(cuts: _*)).as("c"))
        .select(col("user_id"), col("ts"), col("event_type"),
          col("c.cut_s").as("cutoff"), col("c.cut").as("cut"))
      val lo = col("cut") - expr(s"INTERVAL $LabelWindowDays DAYS")
      val hi = col("cut") + expr(s"INTERVAL $LabelWindowDays DAYS")
      val obs = col("ts") > lo && col("ts") <= col("cut")
      val out = col("ts") > col("cut") && col("ts") <= hi
      framed
        .groupBy("user_id", "cutoff")
        .agg(sum(when(obs, 1L).otherwise(0L)).as("n_events_obs"),
          sum(when(obs && col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases_obs"),
          max(when(out, 1L).otherwise(0L)).as("label_active"))
        // rows need at least one OBSERVED event: a user invisible before
        // the cutoff has no features to train on
        .filter(col("n_events_obs") > 0)
        .orderBy("user_id", "cutoff")
    }),

    "q50_hash_split" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), CorpusOps.hashSplit(col("doc_id")).as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("split")
    }),

    // Leakage-aware split audit: the q50 hash split keyed by DOC ID lets
    // exact duplicates straddle train/val — the eval-contamination bug
    // every dedup'd-but-naively-split corpus ships. Keying the SAME split
    // by CONTENT hash pins every duplicate clique to one side by
    // construction. This query runs both policies on a frame with planted
    // exact copies and emits the ledger: split sizes, multi-doc content
    // groups, duplicate pairs, and pairs split across sides (naive > 0,
    // grouped = 0 — the oracle pins both). Scale shape: leaked pairs are
    // counted per content GROUP as C(n,2) − Σ_split C(n_s,2) from two
    // grouped aggregations — no dup-pair self-join, so the audit costs
    // two shuffles of (hash, split) counts regardless of clique sizes.
    "q175_leakage_split" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      val frame = d.unionAll(d.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + LeakCopyOffset).as("doc_id"), col("text")))
      val keyed = frame.select(col("doc_id"), md5(col("text")).as("h"))
      def audit(policy: String, splitOf: org.apache.spark.sql.Column) = {
        val sp = keyed.select(col("h"), splitOf.as("split"))
        val perHS = sp.groupBy("h", "split").agg(count(lit(1)).as("ns"))
        val perH = perHS.groupBy("h").agg(
          sum(col("ns")).as("n"),
          sum(expr("(ns * (ns - 1)) div 2")).as("same_pairs"))
        val pairStats = perH.agg(
          sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_groups_multi"),
          sum(expr("(n * (n - 1)) div 2")).as("n_dup_pairs"),
          sum(expr("(n * (n - 1)) div 2") - col("same_pairs")).as("n_leaked"))
        val sizes = sp.agg(
          sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
          sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
        sizes.crossJoin(pairStats).select(lit(policy).as("policy"),
          col("n_train"), col("n_val"), col("n_test"),
          col("n_groups_multi"), col("n_dup_pairs"), col("n_leaked"))
      }
      audit("doc_keyed", CorpusOps.hashSplit(col("doc_id")))
        .unionAll(audit("content_keyed", CorpusOps.hashSplit(col("h"))))
        .orderBy("policy")
    }),

    // Stratified deterministic sampling: per-language keep fractions; the
    // oracle re-derives the exact surviving row set.
    "q51_stratified_sample" -> ((s, dir) => {
      CorpusOps.stratifiedSample(docs(s, dir), "doc_id", "lang",
        StratFracs, StratDefault)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // Deterministic epoch shuffle: the global reshuffle a training run
    // needs between epochs, as a pure function of (epoch, doc_id) — no
    // rand() state, no driver-side permutation array, so any worker (or
    // a resumed job) recomputes its shard identically. Each epoch hashes
    // every doc to a shuffle key; shard = key mod #shards, within-shard
    // order = (key, doc_id). The audit emits per (epoch, shard): size,
    // first/last doc, and a Σ offset·doc_id permutation checksum — the
    // epochs provably differ while each stays balanced. Scale shape: one
    // hash + one shuffle per epoch, rank confined WITHIN each shard
    // (shards are the parallel unit; no global sort anywhere).
    "q178_epoch_shuffle" -> ((s, dir) => {
      val d = docs(s, dir).select(col("doc_id"))
        .withColumn("epoch", explode(sequence(lit(0), lit(ShuffleEpochs - 1))))
        .withColumn("key", graft.functions.Portable.hash32(
          concat(lit("ep"), col("epoch").cast("string"), lit(":"),
            col("doc_id").cast("string"))))
        .withColumn("shard", col("key") % ShuffleShards)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("epoch", "shard").orderBy(col("key"), col("doc_id"))
      d.withColumn("off", row_number().over(w).cast("long") - 1L)
        .groupBy("epoch", "shard")
        .agg(count(lit(1)).as("n_docs"),
          min_by(col("doc_id"), col("off")).as("first_doc"),
          max_by(col("doc_id"), col("off")).as("last_doc"),
          sum(col("off") * col("doc_id")).as("perm_check"))
        .orderBy("epoch", "shard")
    }),

    // URL canonicalization + dedup: normalize the messy synthetic URL,
    // group on the canonical form, keep the smallest doc_id.
    "q52_url_dedup" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), CorpusOps.normalizeUrl(syntheticUrl).as("url"))
        .groupBy("url")
        .agg(count(lit(1)).as("n"), min("doc_id").as("keep_id"))
        .orderBy("url")
    }),

    // Token-window chunking (window 32, stride 24): the sequence-packing
    // step before tokenization. Chunk text is hash-fingerprinted so the
    // oracle verifies exact chunk CONTENT without bulky output.
    "q53_chunk_tokens" -> ((s, dir) => {
      CorpusOps.chunkTokens(docs(s, dir), "doc_id", "text",
        window = 32, stride = 24)
        .select(col("doc_id"), col("chunk_idx"), col("n_toks"),
          substring(md5(col("chunk")), 1, 8).as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // HyperLogLog distinct-count sketch (rsd 1%) vs the exact count — the
    // cardinality-estimation pass a 100 TB pipeline runs where exact
    // distinct would shuffle everything (in production you run ONLY the
    // sketch; this gate query exists to pin its accuracy). Both aggregates
    // run over pre-deduped keys: HLL is duplicate-insensitive, so the
    // estimate is identical and the plan avoids the expand-based mixed
    // distinct/non-distinct aggregation.
    "q54_approx_distinct" -> ((s, dir) => {
      val exact = count(lit(1))
      Tables.table(s, dir, "events")
        // NULL keys out: COUNT(DISTINCT x) in SQL ignores NULLs while
        // DataFrame distinct() would keep a null row — the one semantic
        // crack between the engines for this query
        .filter(col("user_id").isNotNull)
        .select(col("user_id")).distinct()
        .agg(exact.as("exact_users"),
          // empty input: 0/0 is NULL; the gate holds vacuously
          coalesce(abs(approx_count_distinct(col("user_id"), 0.01) - exact)
            .cast("double") / exact.cast("double") <= 0.05, lit(true))
            .as("hll_within_5pct"))
    }),

    // Grouped mergeable sketches: per-source distinct-token HLL next to
    // the exact count — the per-partition profile a corpus audit keeps at
    // scale (one sketch per group merges across shuffles; production runs
    // only the sketch, this gate runs both and pins the estimate inside
    // the accuracy envelope).
    "q91_source_distinct" -> ((s, dir) => {
      val exact = count_distinct(col("tok"))
      docs(s, dir)
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_toks"),
          exact.as("exact_toks"),
          coalesce(abs(approx_count_distinct(col("tok"), 0.02) - exact)
            .cast("double") / exact.cast("double") <= 0.1, lit(true))
            .as("hll_ok"))
        .orderBy("source")
    }),

    // Two-level sketch ROLLUP: per-source DataSketches HLL over word
    // 3-grams, then the GLOBAL distinct estimated by unioning the
    // per-source sketches — never rescanning the corpus. This is the
    // property approx_count_distinct lacks (its partial is not a stored,
    // re-aggregable artifact): at 100 TB the per-source sketch column IS
    // the stored profile, and any ad-hoc grouping rolls up from it. The
    // oracle pins the exact counts and the accuracy gates; the sum of
    // per-source exacts vs the global exact exposes the cross-source
    // overlap a naive sum would double-count.
    "q138_hll_rollup" -> ((s, dir) => {
      val grams = docs(s, dir)
        .select(col("source"), explode(TextFunctions.wordNgrams(
          TextFunctions.tokens(col("text")), 3)).as("g"))
      // Dedup (source, g) FIRST: count_distinct mixed with the sketch agg
      // would Expand every exploded gram 2x, and the global exact would
      // rescan raw grams. Over the deduped pairs the distinct counts are
      // plain counts, the HLL sketch is bit-identical (duplicate inserts
      // are no-ops), and both downstream aggregates read the same (reused)
      // exchange instead of re-exploding the corpus.
      val pairs = grams.select(col("source"), col("g")).distinct()
      val perSource = pairs.groupBy("source")
        .agg(count(lit(1)).as("exact"),
          expr("hll_sketch_agg(g, 12)").as("sk"))
      val rolled = perSource.agg(
        sum(col("exact")).as("sum_source_exact"),
        expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
      val exactG = pairs.select("g").distinct()
        .agg(count(lit(1)).as("exact_global"))
      rolled.crossJoin(broadcast(exactG))
        .select(col("exact_global"), col("sum_source_exact"),
          (abs(col("est") - col("exact_global")).cast("double")
            / col("exact_global") <= 0.05).as("union_ok"),
          (col("sum_source_exact") >= col("exact_global")).as("overlap_ok"))
    }),

    // Rolling 7-day distinct users from STORED per-day HLL sketches —
    // the mergeable-sketch pattern that makes rolling count-distinct
    // affordable at warehouse scale: per-day sketches are built once
    // (one shuffle over raw events), and each day's trailing window is
    // a union of ≤7 stored sketches (O(days·7) tiny rows), where the
    // exact rolling distinct would rescan raw events per window. The
    // window membership is an EXPLODE(0..6) equi-join on the shifted
    // day — a range predicate would plan a nested-loop join, which the
    // fleet guardrail forbids. The exact side rides along as the audit
    // gate (est within 5%, per-day sum over-counts overlap).
    "q158_rolling_distinct" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val days = ev.select(col("day").as("d_end")).distinct()
      val perDay = ev.groupBy("day")
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"),
          count_distinct(col("user_id")).as("day_exact"))
      val contrib = perDay
        .select(col("sk"), col("day_exact"),
          explode(sequence(lit(0), lit(6))).as("off"),
          col("day"))
        .select(date_add(col("day"), col("off")).as("d_end"),
          col("sk"), col("day_exact"))
        .join(days, "d_end")
      val rolled = contrib.groupBy("d_end")
        .agg(count(lit(1)).as("n_days"),
          sum(col("day_exact")).as("sum_day_exact"),
          expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
      val exact = ev
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("off"), col("day"))
        .select(date_add(col("day"), col("off")).as("d_end"), col("user_id"))
        .join(days, "d_end")
        .groupBy("d_end")
        .agg(count_distinct(col("user_id")).as("exact_rolling"))
      rolled.join(exact, "d_end")
        .select(date_format(col("d_end"), "yyyy-MM-dd").as("day"),
          col("n_days"), col("exact_rolling"),
          (col("sum_day_exact") >= col("exact_rolling")).as("overlap_ok"),
          (abs(col("est") - col("exact_rolling")).cast("double")
            / col("exact_rolling") <= 0.05).as("est_ok"))
        .orderBy("day")
    }),

    // Small-file compaction: fragment the corpus into 64 tiny files, run
    // Layout.compact (coalesce — narrow, no shuffle), then gate on the
    // file listings and on LOSSLESSNESS via a relational full-outer
    // compare of content hashes — a dropped or duplicated row cannot hide.
    "q93_compact" -> ((s, dir) => {
      // FIXED scratch path + overwrite mode: a fresh temp dir per
      // invocation would leak two corpus copies per bench/verify run
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft-q93-compact"
      val frag = s"$tmp/frag"
      val out = s"$tmp/out"
      val d = docs(s, dir).select(col("doc_id"), col("text"))
      d.repartition(64).write.mode("overwrite").parquet(frag)
      val (nBefore, nAfter) = Layout.compact(s, frag, out, targetFiles = 4)
      val after = s.read.parquet(out)
      d.select(col("doc_id"), md5(col("text")).as("h_src"))
        .join(after.select(col("doc_id"), md5(col("text")).as("h_out")),
          Seq("doc_id"), "full_outer")
        .agg(count(lit(1)).as("n_rows"),
          bool_and(col("h_src").isNotNull && col("h_out").isNotNull &&
            col("h_src") === col("h_out")).as("lossless"),
          lit(nBefore >= 64).as("fragmented_ok"),
          lit(nAfter <= 4).as("compacted_ok"))
    }),

    // Training-mix plan: given per-source availability, uniform target
    // weights, and a token budget, emit the allocation table a data mix
    // is built from — target tokens per source and the EPOCH factor
    // (target / available; > 1 means the source must be oversampled /
    // repeated, the signal mix designers watch). Pure relational
    // arithmetic over a tiny per-source aggregate — the plan itself is
    // never the scale problem, the corpus scan feeding it is one
    // aggregation.
    "q95_mix_plan" -> ((s, dir) => {
      val budget = MixPlanBudget
      val perSource = docs(s, dir)
        .select(col("source"),
          TextFunctions.tokenStats(col("text"))
            .getField("ws_tokens").cast("long").as("n"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("avail_tokens"))
      val nSources = perSource.agg(count(lit(1)).as("k"))
      perSource.crossJoin(nSources)
        .select(col("source"), col("n_docs"), col("avail_tokens"),
          floor(lit(budget) / col("k")).cast("long").as("target_tokens"),
          round(floor(lit(budget) / col("k")) / col("avail_tokens"), 6)
            .as("epochs"),
          (floor(lit(budget) / col("k")) > col("avail_tokens"))
            .as("oversampled"))
        .orderBy("source")
    }),

    // Temperature-scaled mix plan: p_i ∝ avail_i^alpha (UniMax/mT5-style
    // alpha-sampling) instead of q95's uniform split — the standard way
    // to up-weight small sources without letting the head source eat the
    // whole budget. Determinism: the ^alpha shares are ROUNDED to 6
    // before anything downstream reads them; pow differs from DuckDB's
    // libm by at most 1 ulp (~1e-16 relative), far inside the 5e-7
    // rounding guard — the same argument weightedSample makes for log().
    "q154_temperature_mix" -> ((s, dir) => {
      val perSource = docs(s, dir)
        .select(col("source"),
          TextFunctions.tokenStats(col("text"))
            .getField("ws_tokens").cast("long").as("n"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("avail_tokens"))
      val tot = perSource.agg(
        sum(pow(col("avail_tokens").cast("double"), MixAlpha)).as("z"),
        sum(col("avail_tokens")).cast("double").as("t"))
      perSource.crossJoin(tot)
        .select(col("source"), col("n_docs"), col("avail_tokens"),
          round(col("avail_tokens") / col("t"), 6).as("p_raw"),
          round(pow(col("avail_tokens").cast("double"), MixAlpha) / col("z"), 6)
            .as("p_temp"),
          floor(lit(MixPlanBudget) *
            pow(col("avail_tokens").cast("double"), MixAlpha) / col("z"))
            .cast("long").as("target_tokens"),
          round(floor(lit(MixPlanBudget) *
            pow(col("avail_tokens").cast("double"), MixAlpha) / col("z")) /
            col("avail_tokens"), 6).as("epochs"))
        .orderBy("source")
    }),

    // Deterministic 16-way shard assignment — the final-write layout step:
    // shard indices are stable under any partitioning/re-run, so exports
    // are resumable and diffable shard-by-shard.
    "q58_sharded_export" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), CorpusOps.shardIndex(col("doc_id")).as("shard"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("shard")
    }),

    // Fractional domain-mixing weights: src0 ×2.5, src1 ×2.0, src2 ×0.25,
    // everything else ×1.0. The oracle replays the exact replicate-and-
    // keep rule, so output counts AND copy indices must match.
    "q59_domain_mix" -> ((s, dir) => {
      CorpusOps.mixtureWeights(docs(s, dir), "doc_id", "source",
        Map("src0" -> 2.5, "src1" -> 2.0, "src2" -> 0.25), defaultWeight = 1.0)
        .groupBy("source")
        .agg(count(lit(1)).as("n_out"), max("rep").as("max_rep"))
        .orderBy("source")
    }),

    // Corpus-level frequent-line removal (CCNet/C4-style boilerplate
    // dedup). The corpus has no line structure, so each doc is rendered as
    // lines deterministically — a per-source subscribe header, 12-token
    // content lines, a per-source copyright footer (the oracle builds the
    // identical rendering). Headers/footers recur across every doc of a
    // source (25 docs at sf0.01) and cross the doc-frequency bar; content
    // lines are unique and survive. Output pins counts AND the exact
    // reconstructed text per doc via an md5 fingerprint.
    "q61_line_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      val content = CorpusOps.chunkTokens(d, "doc_id", "text",
          window = LineWindow, stride = LineWindow)
        .select(col("doc_id"), (col("chunk_idx") + 1).cast("long").as("idx"),
          col("chunk").as("line"))
      val header = d.select(col("doc_id"), lit(0L).as("idx"),
        concat(lit("subscribe to "), col("source"), lit(" newsletter today")).as("line"))
      val footer = d.select(col("doc_id"), lit(1000000L).as("idx"),
        concat(lit("copyright "), col("source"), lit(" all rights reserved")).as("line"))
      CorpusOps.dropFrequentLines(header.unionAll(content).unionAll(footer),
          "doc_id", "idx", "line", maxDocFreq = LineMaxDocFreq)
        .select(col("doc_id"), col("n_kept"), col("n_dropped"),
          substring(md5(col("clean_text")), 1, 8).as("clean_hash"))
        .orderBy("doc_id")
    }),

    // Deflate compression-ratio quality signal (graft_zratio): per-doc
    // ratios are not SQL-expressible, so the query emits corpus-level
    // gates: ratios inside the sane band, and doubling a text never
    // compresses worse (the invariant that makes the signal a repetition
    // detector).
    "q55_compress_ratio" -> ((s, dir) => {
      val zr = TextFunctions.zratio(col("text"))
      val zr2 = TextFunctions.zratio(concat(col("text"), lit(" "), col("text")))
      docs(s, dir)
        .select(length(col("text")).as("len"), zr.as("r1"), zr2.as("r2"))
        .agg(count(lit(1)).as("n_docs"),
          bool_and(col("r1") > 0.02 && col("r1") < 1.3).as("ratio_bounded"),
          // the doubling invariant holds for real text only: an empty doc
          // has the defined ratio 1.0 but its "doubled" form is the 1-byte
          // string " ", which deflate expands — exempt zero-length docs
          bool_and(col("r2") <= col("r1") || col("len") === 0)
            .as("doubling_compresses"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q211_churn_labels" -> {
      val cutsValues = LabelCutoffs
        .map(c => s"('$c', TIMESTAMP '$c')").mkString(", ")
      s"""WITH e AS (
         |  SELECT user_id, ts, event_type FROM events
         |  WHERE user_id IS NOT NULL AND user_id % 5 = 0),
         |cuts(cutoff, cut) AS (VALUES $cutsValues),
         |f AS (SELECT user_id, ts, event_type, cutoff, cut
         |      FROM e CROSS JOIN cuts),
         |g AS (SELECT user_id, cutoff,
         |        CAST(sum(CASE WHEN ts > cut - INTERVAL $LabelWindowDays DAY
         |                       AND ts <= cut THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_events_obs,
         |        CAST(sum(CASE WHEN ts > cut - INTERVAL $LabelWindowDays DAY
         |                       AND ts <= cut
         |                       AND event_type = 'purchase'
         |                      THEN 1 ELSE 0 END) AS BIGINT)
         |          AS n_purchases_obs,
         |        CAST(max(CASE WHEN ts > cut
         |                       AND ts <= cut + INTERVAL $LabelWindowDays DAY
         |                      THEN 1 ELSE 0 END) AS BIGINT) AS label_active
         |      FROM f GROUP BY user_id, cutoff)
         |SELECT user_id, cutoff, n_events_obs, n_purchases_obs, label_active
         |FROM g WHERE n_events_obs > 0
         |ORDER BY user_id, cutoff""".stripMargin
    },

    "q204_embargo_split" ->
      s"""WITH e AS (
         |  SELECT user_id, ts,
         |         CASE WHEN ts < TIMESTAMP '$EmbargoCut' THEN 'train'
         |              WHEN ts >= TIMESTAMP '$EmbargoTestFrom' THEN 'test'
         |              ELSE 'purged' END AS part
         |  FROM events),
         |pu AS (SELECT user_id,
         |         max(CASE WHEN part = 'train'
         |                  THEN epoch_us(ts) // 1000000 END)
         |           AS last_train_s,
         |         min(CASE WHEN part = 'test'
         |                  THEN epoch_us(ts) // 1000000 END)
         |           AS first_test_s
         |       FROM e GROUP BY user_id),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n_users_both,
         |             min(first_test_s - last_train_s) AS min_gap_s
         |      FROM pu
         |      WHERE last_train_s IS NOT NULL AND first_test_s IS NOT NULL),
         |sz AS (SELECT
         |         CAST(sum(CASE WHEN part = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         |         CAST(sum(CASE WHEN part = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
         |         CAST(sum(CASE WHEN part = 'purged' THEN 1 ELSE 0 END) AS BIGINT) AS n_purged
         |       FROM e)
         |SELECT n_train, n_test, n_purged, n_users_both,
         |       CAST(min_gap_s AS BIGINT) AS min_gap_s,
         |       min_gap_s >= $EmbargoSeconds AS embargo_ok
         |FROM sz CROSS JOIN g""".stripMargin,

    "q50_hash_split" ->
      """WITH s AS (
        |  SELECT doc_id,
        |         CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
        |              WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, CAST(count(*) AS BIGINT) AS n,
        |       min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM s GROUP BY split ORDER BY split""".stripMargin,

    "q175_leakage_split" -> {
      def splitCase(key: String) =
        s"""CASE WHEN substring(md5('split:' || $key), 1, 4) < 'cccc' THEN 'train'
           |     WHEN substring(md5('split:' || $key), 1, 4) < 'e666' THEN 'val'
           |     ELSE 'test' END""".stripMargin
      def policy(name: String, splitExpr: String) =
        s"""SELECT '$name' AS policy,
           |  (SELECT CAST(sum(CASE WHEN $splitExpr = 'train' THEN 1 ELSE 0 END) AS BIGINT) FROM keyed) AS n_train,
           |  (SELECT CAST(sum(CASE WHEN $splitExpr = 'val' THEN 1 ELSE 0 END) AS BIGINT) FROM keyed) AS n_val,
           |  (SELECT CAST(sum(CASE WHEN $splitExpr = 'test' THEN 1 ELSE 0 END) AS BIGINT) FROM keyed) AS n_test,
           |  g.n_groups_multi, g.n_dup_pairs, g.n_leaked
           |FROM (
           |  SELECT CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_groups_multi,
           |         CAST(sum((n * (n - 1)) // 2) AS BIGINT) AS n_dup_pairs,
           |         CAST(sum((n * (n - 1)) // 2 - same_pairs) AS BIGINT) AS n_leaked
           |  FROM (
           |    SELECT h, sum(ns) AS n, sum((ns * (ns - 1)) // 2) AS same_pairs
           |    FROM (SELECT h, $splitExpr AS split, count(*) AS ns
           |          FROM keyed GROUP BY 1, 2)
           |    GROUP BY h)) g""".stripMargin
      s"""WITH d AS (SELECT doc_id, text FROM documents),
         |frame AS (SELECT doc_id, text FROM d
         |          UNION ALL
         |          SELECT doc_id + $LeakCopyOffset, text FROM d WHERE doc_id % 3 = 0),
         |keyed AS (SELECT doc_id, md5(text) AS h FROM frame)
         |${policy("doc_keyed", splitCase("CAST(doc_id AS VARCHAR)"))}
         |UNION ALL
         |${policy("content_keyed", splitCase("h"))}
         |ORDER BY policy""".stripMargin
    },

    "q51_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substring(md5('strat:' || coalesce(lang, '') || ':' || CAST(doc_id AS VARCHAR)), 1, 4)
        |      < CASE lang WHEN 'en' THEN '4000' WHEN 'zh' THEN 'zzzz' ELSE '8000' END
        |ORDER BY doc_id""".stripMargin,

    "q178_epoch_shuffle" -> {
      val key = graft.functions.Portable.hash32Sql(
        "'ep' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")
      s"""WITH d AS (
         |  SELECT doc_id, epoch FROM documents
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${ShuffleEpochs - 1})) AS epoch)),
         |keyed AS (SELECT doc_id, epoch, $key AS key FROM d),
         |sh AS (SELECT doc_id, epoch, key, key % $ShuffleShards AS shard FROM keyed),
         |off AS (SELECT doc_id, epoch, shard,
         |          CAST(row_number() OVER (PARTITION BY epoch, shard
         |            ORDER BY key, doc_id) AS BIGINT) - 1 AS off
         |        FROM sh)
         |SELECT epoch, shard, CAST(count(*) AS BIGINT) AS n_docs,
         |       min_by(doc_id, off) AS first_doc,
         |       max_by(doc_id, off) AS last_doc,
         |       CAST(sum(off * doc_id) AS BIGINT) AS perm_check
         |FROM off GROUP BY 1, 2 ORDER BY epoch, shard""".stripMargin
    },

    "q52_url_dedup" ->
      s"""WITH u AS (
         |  SELECT doc_id, $urlSql AS url FROM documents),
         |p1 AS (
         |  SELECT doc_id,
         |    regexp_replace(regexp_replace(
         |      lower(regexp_extract(url, '^([^/]*//[^/]*)', 1)),
         |      ':(443|80)$$', ''), '//www\\.', '//') AS prefix,
         |    regexp_replace(regexp_replace(url, '^[^/]*//[^/]*', ''),
         |                   '#.*', '') AS rest1
         |  FROM u),
         |p2 AS (
         |  SELECT doc_id, prefix,
         |    regexp_extract(rest1, '^[^?]*') AS path,
         |    regexp_replace(regexp_replace(regexp_replace(
         |      regexp_replace(rest1, '^[^?]*', ''),
         |      '^\\?', '&'),
         |      '&utm_[^&#]*', '', 'g'),
         |      '^&', '?') AS q
         |  FROM p1),
         |n AS (
         |  SELECT doc_id,
         |    prefix || regexp_replace(regexp_replace(path || q, '[?&]+$$', ''),
         |                             '/$$', '') AS url
         |  FROM p2)
         |SELECT url, CAST(count(*) AS BIGINT) AS n, min(doc_id) AS keep_id
         |FROM n GROUP BY url ORDER BY url""".stripMargin,

    "q53_chunk_tokens" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, toks,
        |         unnest(generate_series(0, len(toks) - 1, 24)) AS start
        |  FROM d)
        |SELECT doc_id,
        |       CAST(start // 24 AS INTEGER) AS chunk_idx,
        |       CAST(least(32, len(toks) - start) AS INTEGER) AS n_toks,
        |       substring(md5(array_to_string(toks[start + 1 : start + 32], ' ')), 1, 8) AS chunk_hash
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    "q58_sharded_export" -> {
      val c = "ascii(substring(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 1))"
      s"""WITH s AS (
         |  SELECT doc_id,
         |         CASE WHEN $c <= 57 THEN $c - 48 ELSE $c - 87 END AS shard
         |  FROM documents)
         |SELECT CAST(shard AS INTEGER) AS shard, CAST(count(*) AS BIGINT) AS n,
         |       min(doc_id) AS min_id, max(doc_id) AS max_id
         |FROM s GROUP BY shard ORDER BY shard""".stripMargin
    },

    "q59_domain_mix" ->
      """WITH w AS (
        |  SELECT doc_id, source,
        |         CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 2.0
        |                     WHEN 'src2' THEN 0.25 ELSE 1.0 END AS wt
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, wt,
        |         unnest(generate_series(0, CAST(floor(wt) AS INTEGER))) AS rep
        |  FROM w),
        |k AS (
        |  SELECT * FROM r
        |  WHERE rep < floor(wt)
        |     OR substring(md5('mix:' || source || ':' || CAST(doc_id AS VARCHAR)
        |                      || ':' || CAST(rep AS VARCHAR)), 1, 4)
        |        < CASE source WHEN 'src0' THEN '8000' WHEN 'src2' THEN '4000'
        |                      ELSE '0000' END)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_out,
        |       CAST(max(rep) AS INTEGER) AS max_rep
        |FROM k GROUP BY source ORDER BY source""".stripMargin,

    "q61_line_dedup" ->
      s"""WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
         |content AS (
         |  SELECT doc_id, CAST(start // $LineWindow + 1 AS BIGINT) AS idx,
         |         array_to_string(toks[start + 1 : start + $LineWindow], ' ') AS line
         |  FROM (SELECT doc_id, toks,
         |          unnest(generate_series(0, len(toks) - 1, $LineWindow)) AS start
         |        FROM d)),
         |lines AS (
         |  SELECT doc_id, CAST(0 AS BIGINT) AS idx,
         |         'subscribe to ' || source || ' newsletter today' AS line FROM d
         |  UNION ALL SELECT doc_id, idx, line FROM content
         |  UNION ALL SELECT doc_id, CAST(1000000 AS BIGINT) AS idx,
         |         'copyright ' || source || ' all rights reserved' AS line FROM d),
         |freq AS (SELECT line, count(DISTINCT doc_id) AS dfreq
         |         FROM lines GROUP BY line),
         |k AS (SELECT l.doc_id, l.idx, l.line, f.dfreq < $LineMaxDocFreq AS keep
         |      FROM lines l JOIN freq f USING (line))
         |SELECT doc_id,
         |       CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
         |       CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped,
         |       substring(md5(coalesce(
         |         string_agg(line, chr(10) ORDER BY idx) FILTER (WHERE keep),
         |         '')), 1, 8) AS clean_hash
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q54_approx_distinct" ->
      """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |       TRUE AS hll_within_5pct
        |FROM events""".stripMargin,

    "q55_compress_ratio" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |       TRUE AS ratio_bounded, TRUE AS doubling_compresses
        |FROM documents""".stripMargin,

    "q91_source_distinct" -> {
      val toks = TextPack.toksSql("text")
      s"""WITH t AS (SELECT source, unnest($toks) AS tok FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_toks,
         |       CAST(count(DISTINCT tok) AS BIGINT) AS exact_toks,
         |       TRUE AS hll_ok
         |FROM t GROUP BY source ORDER BY source""".stripMargin
    },

    "q138_hll_rollup" -> {
      val toks = TextPack.toksSql("text")
      val grams3 =
        s"""CASE WHEN len(toks) >= 3
           |     THEN list_transform(generate_series(1, len(toks) - 2),
           |            i -> array_to_string(list_slice(toks, i, i + 2), ' '))
           |     ELSE CAST([] AS VARCHAR[]) END""".stripMargin
      s"""WITH t AS (SELECT source, $toks AS toks FROM documents),
         |g AS (SELECT source, unnest($grams3) AS g FROM t),
         |per AS (SELECT source, count(DISTINCT g) AS exact
         |        FROM g GROUP BY 1)
         |SELECT (SELECT CAST(count(DISTINCT g) AS BIGINT) FROM g)
         |         AS exact_global,
         |       CAST(sum(exact) AS BIGINT) AS sum_source_exact,
         |       TRUE AS union_ok, TRUE AS overlap_ok
         |FROM per""".stripMargin
    },

    "q93_compact" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows, TRUE AS lossless,
        |       TRUE AS fragmented_ok, TRUE AS compacted_ok
        |FROM documents""".stripMargin,

    "q158_rolling_distinct" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
        |days AS (SELECT DISTINCT day AS d_end FROM ev),
        |perday AS (SELECT day, count(DISTINCT user_id) AS day_exact
        |           FROM ev GROUP BY day),
        |rolled AS (
        |  SELECT d.d_end, count(*) AS n_days,
        |         sum(p.day_exact) AS sum_day_exact
        |  FROM days d JOIN perday p
        |    ON p.day <= d.d_end AND p.day >= d.d_end - 6
        |  GROUP BY d.d_end),
        |ex AS (
        |  SELECT d.d_end, count(DISTINCT e.user_id) AS exact_rolling
        |  FROM days d JOIN ev e
        |    ON e.day <= d.d_end AND e.day >= d.d_end - 6
        |  GROUP BY d.d_end)
        |SELECT strftime(r.d_end, '%Y-%m-%d') AS day,
        |       CAST(r.n_days AS BIGINT) AS n_days,
        |       CAST(ex.exact_rolling AS BIGINT) AS exact_rolling,
        |       r.sum_day_exact >= ex.exact_rolling AS overlap_ok,
        |       TRUE AS est_ok
        |FROM rolled r JOIN ex USING (d_end)
        |ORDER BY day""".stripMargin,

    "q154_temperature_mix" -> {
      val toks = TextPack.toksSql("text")
      val pw = s"pow(CAST(avail_tokens AS DOUBLE), $MixAlpha)"
      s"""WITH t AS (SELECT source, len($toks) AS n FROM documents),
         |p AS (SELECT source, count(*) AS n_docs, sum(n) AS avail_tokens
         |      FROM t GROUP BY source),
         |z AS (SELECT sum($pw) AS z, CAST(sum(avail_tokens) AS DOUBLE) AS t
         |      FROM p)
         |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
         |       CAST(avail_tokens AS BIGINT) AS avail_tokens,
         |       ROUND(avail_tokens / t, 6) AS p_raw,
         |       ROUND($pw / z, 6) AS p_temp,
         |       CAST(FLOOR($MixPlanBudget * $pw / z) AS BIGINT)
         |         AS target_tokens,
         |       ROUND(FLOOR($MixPlanBudget * $pw / z) / avail_tokens, 6)
         |         AS epochs
         |FROM p CROSS JOIN z ORDER BY source""".stripMargin
    },

    "q95_mix_plan" -> {
      val toks = TextPack.toksSql("text")
      s"""WITH t AS (SELECT source, len($toks) AS n FROM documents),
         |p AS (SELECT source, count(*) AS n_docs, sum(n) AS avail_tokens
         |      FROM t GROUP BY source),
         |k AS (SELECT count(*) AS k FROM p)
         |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
         |       CAST(avail_tokens AS BIGINT) AS avail_tokens,
         |       CAST(FLOOR($MixPlanBudget / k) AS BIGINT) AS target_tokens,
         |       ROUND(FLOOR($MixPlanBudget / k) / avail_tokens, 6) AS epochs,
         |       FLOOR($MixPlanBudget / k) > avail_tokens AS oversampled
         |FROM p CROSS JOIN k ORDER BY source""".stripMargin
    }
  )
}
