package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training-data pipeline runs
  * between ingestion and training: deterministic splits/sampling, URL
  * canonicalization, and token-window chunking (no reference analog — the
  * builder-prompt LLM-pipeline scope).
  *
  * Everything here is a pure function of the row (seeded by a salt string),
  * so the operators are embarrassingly parallel — no shuffle, no state, no
  * RNG whose draw order depends on partitioning — and every one is
  * reproducible across engines: the DuckDB oracles replicate them exactly
  * (md5 hex and basic regexes behave identically on both).
  *
  * Why md5-bucket sampling instead of `df.sample`/`rand`: `rand(seed)` is
  * partition-order dependent — a repartition or AQE re-plan silently changes
  * WHICH rows are kept. A content hash of (salt, key) is stable under any
  * physical layout, re-run, and engine — the property a train/val/test
  * split must have at 100 TB where the layout is never twice the same.
  */
object CorpusOps {

  /** First 4 hex chars of md5("salt:key") — a uniform bucket in [0, 16^4)
    * represented AS THE HEX STRING, compared lexicographically. Staying in
    * string space keeps the operator portable: every engine renders md5 as
    * lowercase hex, while hex→int conversion is engine-specific. */
  def hashHex4(salt: String, key: Column): Column =
    substring(md5(concat(lit(salt), lit(":"), key.cast("string"))), 1, 4)

  /** Threshold hex string for a keep-fraction: bucket < threshold ⇔ keep.
    * frac ≥ 1.0 maps to "zzzz" (sorts above every hex digit → keep all). */
  def hexThreshold(frac: Double): String =
    if (frac >= 1.0) "zzzz"
    else f"${math.max(0, (frac * 65536).toInt)}%04x"

  /** Deterministic train/val/test label for a row key. Buckets partition
    * the space, so the split is exhaustive and disjoint by construction. */
  def hashSplit(key: Column, trainFrac: Double = 0.8, valFrac: Double = 0.1,
                salt: String = "split"): Column = {
    val b = hashHex4(salt, key)
    when(b < hexThreshold(trainFrac), "train")
      .when(b < hexThreshold(trainFrac + valFrac), "val")
      .otherwise("test")
  }

  /** Per-stratum deterministic sampling — the domain-rebalancing step of a
    * training-data mix (downsample the dominant web crawl, keep all of the
    * rare domain). Keeps a row iff its (stratum, key) hash bucket falls
    * below the stratum's fraction threshold. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       fracs: Map[String, Double], defaultFrac: Double,
                       salt: String = "strat"): DataFrame = {
    val thr = fracs.foldLeft(when(lit(false), lit(""))) {
      case (acc, (stratum, f)) =>
        acc.when(col(stratumCol) === stratum, lit(hexThreshold(f)))
    }.otherwise(lit(hexThreshold(defaultFrac)))
    // a NULL stratum must not null the hash key (filter(NULL) would drop
    // the row no matter what defaultFrac promises) — it hashes as the
    // empty stratum and samples at defaultFrac
    df.filter(
      hashHex4(salt, concat(coalesce(col(stratumCol), lit("")), lit(":"),
        col(keyCol).cast("string"))) < thr)
  }

  /** Canonicalize an absolute URL for dedup:
    *  - scheme + host lowercased (path/query case preserved)
    *  - default ports :80/:443 stripped
    *  - leading `www.` stripped
    *  - fragment stripped
    *  - `utm_*` tracking parameters stripped (with separator repair)
    *  - trailing `?`/`&`/`/` stripped
    *
    * Built from simple regexp_replace steps with no backreferences — the
    * subset of regex behavior that is identical between Java regex (Spark)
    * and RE2 (DuckDB oracle), so the canonical form is engine-independent. */
  def normalizeUrl(url: Column): Column = {
    val prefix = regexp_replace(
      regexp_replace(
        lower(regexp_extract(url, "^([^/]*//[^/]*)", 1)),
        ":(443|80)$", ""),
      "//www\\.", "//")
    val rest0 = regexp_replace(url, "^[^/]*//[^/]*", "")
    val rest1 = regexp_replace(rest0, "#.*", "")
    // utm params are stripped ANCHORED at a separator. The query string is
    // split off, its leading '?' canonicalized to '&' so EVERY param is
    // '&'-prefixed, '&utm_*' params removed, then the '?' restored — no
    // backreferences (Java regex `$1` vs RE2 `\1` disagree), and a 'utm_'
    // inside a path segment or inside another param's VALUE is untouched.
    val path = regexp_extract(rest1, "^[^?]*", 0)
    val query = regexp_replace(
      regexp_replace(
        regexp_replace(regexp_replace(rest1, "^[^?]*", ""), "^\\?", "&"),
        "&utm_[^&#]*", ""),
      "^&", "?")
    val rest = regexp_replace(
      regexp_replace(concat(path, query), "[?&]+$", ""), "/$", "")
    concat(prefix, rest)
  }

  /** Deterministic shard index in [0, 16) from the first hex char of the
    * row hash — the final-write layout step of a training pipeline: shards
    * are stable under any partitioning/re-run, so an export can be
    * resumed, diffed, or re-written shard-by-shard. 16 shards because one
    * hex char is the largest shard count whose derivation stays portable
    * (`ascii` of the char — no engine-specific hex→int cast). Write with
    * `df.write.partitionBy(col)` for one directory per shard. */
  def shardIndex(key: Column, salt: String = "shard"): Column = {
    val c = ascii(substring(md5(concat(lit(salt), lit(":"),
      key.cast("string"))), 1, 1))
    when(c <= 57, c - 48).otherwise(c - 87).cast("int") // '0'-'9' | 'a'-'f'
  }

  /** Materialize a deterministic sharded export: one directory per
    * [[shardIndex]] bucket, rows sorted by the key within each file so
    * re-exports are byte-diffable. `repartition(shard)` aligns the
    * physical partitioning with the output layout — without it every task
    * would open a writer per shard (16× the open files, tiny row groups).
    * The sort leads with the shard column: partitioned writes require
    * ordering by the partition columns, and satisfying that here keeps
    * Spark from inserting its own Sort(shard) above the key sort (whose
    * stability the within-file key order would then silently depend on). */
  def shardedWrite(df: DataFrame, keyCol: String, path: String,
                   salt: String = "shard"): Unit =
    df.withColumn("shard", shardIndex(col(keyCol), salt))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(keyCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Fractional per-domain replication — the data-mixing step that
    * realizes "epochs per source" weights (upweight the curated domain,
    * downsample the crawl). A weight w yields floor(w) full copies of
    * every row plus one extra copy kept with probability w - floor(w),
    * decided by the same layout-independent md5-bucket rule the samplers
    * use. Output carries a `rep` column (0-based copy index) so downstream
    * shuffling/sharding can separate the copies. */
  def mixtureWeights(df: DataFrame, keyCol: String, domainCol: String,
                     weights: Map[String, Double], defaultWeight: Double,
                     salt: String = "mix"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 8),
      "weights must be in [0, 8] (full copies explode rows)")
    // NULL domains fold into the "" stratum (same rule as stratifiedSample):
    // a raw NULL would poison both the weight dispatch and the hash key and
    // silently drop the row whenever the applicable weight has a fraction.
    val dom = coalesce(col(domainCol), lit(""))
    def chain(f: Double => Column) =
      weights.foldLeft(when(lit(false), lit(null))) { case (acc, (d, w)) =>
        acc.when(dom === d, f(w))
      }.otherwise(f(defaultWeight))
    val wholeCopies = chain(w => lit(math.floor(w).toInt))
    val fracThr = chain(w => lit(hexThreshold(w - math.floor(w))))
    df
      .withColumn("_whole", wholeCopies)
      .withColumn("rep",
        explode(sequence(lit(0), col("_whole")))) // 0..floor(w) inclusive
      .filter(col("rep") < col("_whole") ||
        hashHex4(salt, concat(dom, lit(":"),
          col(keyCol).cast("string"), lit(":"), col("rep").cast("string")))
          < fracThr)
      .drop("_whole")
  }

  /** Corpus-level frequent-line removal — the boilerplate-dedup pass of a
    * crawl pipeline (headers, footers, nav lines repeat across thousands
    * of pages; real content lines are rare). Input is one row per
    * (id, idx, line); a line is boilerplate iff it appears in at least
    * `maxDocFreq` DISTINCT documents. Returns one row per document:
    * (id, n_kept, n_dropped, clean_text), kept lines rejoined in idx
    * order with newlines (empty string when everything was boilerplate).
    *
    * Scale shape: the frequency pass shuffles md5 line-hashes, not line
    * text, and counts document frequency as distinct (hash, id) then a
    * plain count — no count-distinct expand. The tiny doc-frequency table
    * joins back on the hash with NO broadcast hint: a 100 TB corpus's
    * line vocabulary outgrows any broadcast, so the strategy is left to
    * AQE. Reconstruction is one shuffle on the document id. */
  def dropFrequentLines(lines: DataFrame, idCol: String, idxCol: String,
                        lineCol: String, maxDocFreq: Int): DataFrame = {
    require(maxDocFreq >= 2, "maxDocFreq < 2 would drop every line")
    val hashed = lines.select(col(idCol), col(idxCol), col(lineCol),
      md5(col(lineCol)).as("_lh"))
    val docFreq = hashed.select(col("_lh"), col(idCol)).distinct()
      .groupBy(col("_lh")).agg(count(lit(1)).as("_df"))
    hashed.join(docFreq, "_lh")
      .withColumn("_keep", col("_df") < maxDocFreq)
      .groupBy(col(idCol))
      .agg(
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("_keep"), 0L).otherwise(1L)).as("n_dropped"),
        // collect_list skips the nulls the `when` leaves for dropped lines;
        // array_sort on (i, l) structs orders by idx (unique per doc)
        array_join(transform(
          array_sort(collect_list(when(col("_keep"),
            struct(col(idxCol).as("i"), col(lineCol).as("l"))))),
          x => x.getField("l")), "\n").as("clean_text"))
  }

  /** Split documents into overlapping token windows — the sequence-packing
    * step before tokenization: (id, chunk_idx, n_toks, chunk). `window`
    * tokens per chunk, a new chunk every `stride` tokens (overlap =
    * window - stride). Linear, shuffle-free: chunks explode in place from
    * each row, so a 100 TB corpus chunks at scan speed. */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
                  window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1, "window and stride must be >= 1")
    // per-row cost (tokenize + window explode) dwarfs the scan; a
    // narrow single-row-group input would serialize it on one core
    // (q237's index build measured as a 4.5 s 2-task stage) — no-op on
    // an already-wide scan, see graft.plans.Spread
    chunkTokenArrays(docs, idCol, textCol, window, stride)
      .withColumn("chunk", array_join(col("chunk_toks"), " "))
      .drop("chunk_toks")
  }

  /** [[chunkTokens]] with the chunk as a TOKEN ARRAY (`chunk_toks`, no
    * array_join): the form for consumers that immediately re-tokenize the
    * chunk (q237 builds postings and query spans from the tokens) —
    * rendering the joined string only for a downstream split() pays one
    * string build plus one re-parse per chunk for nothing. Tokens carry no
    * spaces (they come from split on " "), so
    * `split(array_join(chunk_toks, " "), " ") == chunk_toks` exactly and
    * the two forms are interchangeable. */
  def chunkTokenArrays(docs: DataFrame, idCol: String, textCol: String,
                       window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1, "window and stride must be >= 1")
    graft.plans.Spread(docs)
      .select(col(idCol), split(col(textCol), " ").as("_toks"))
      .select(col(idCol), col("_toks"),
        posexplode(sequence(lit(0), greatest(size(col("_toks")) - 1, lit(0)),
          lit(stride))).as(Seq("chunk_idx", "_start")))
      .select(col(idCol), col("chunk_idx"),
        least(lit(window), size(col("_toks")) - col("_start")).as("n_toks"),
        slice(col("_toks"), col("_start") + 1, lit(window)).as("chunk_toks"))
  }

  /** Corpus-wide paragraph-level exact dedup (the CCNet shape: dedupe at
    * sub-document granularity, keep documents): documents are segmented
    * into non-overlapping `paraTokens`-token "paragraphs"; across the WHOLE
    * corpus only the first occurrence of each paragraph survives (first =
    * smallest (id, paragraph index)); documents are reconstructed from
    * their surviving paragraphs. Returns one row per document:
    * (id, n_paras, n_kept, clean_text).
    *
    * Scale shape: the first-occurrence pass shuffles 16-byte md5 paragraph
    * hashes with a partial-aggregable min(struct) — never paragraph text;
    * the winner table joins back on the hash (no broadcast hint — the
    * paragraph vocabulary of a 100 TB corpus outgrows any broadcast, AQE
    * decides); reconstruction is one shuffle on the document id. */
  def paragraphDedup(docs: DataFrame, idCol: String, textCol: String,
                     paraTokens: Int): DataFrame = {
    val paras = chunkTokens(docs, idCol, textCol, paraTokens, paraTokens)
      .select(col(idCol), col("chunk_idx"), col("chunk"),
        md5(col("chunk")).as("_h"))
    val firsts = paras.groupBy(col("_h")).agg(
      min(struct(col(idCol).as("id"), col("chunk_idx").as("ci"))).as("_f"))
    paras.join(firsts, "_h")
      .withColumn("_keep",
        col(idCol) === col("_f.id") && col("chunk_idx") === col("_f.ci"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_paras"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("_keep"),
            struct(col("chunk_idx").as("i"), col("chunk").as("c"))))),
          x => x.getField("c")), " ").as("clean_text"))
  }

  /** Deterministic greedy sequence packing: documents in `orderCol` order
    * are laid head-to-tail into fixed `budget`-token training sequences
    * (documents may straddle a boundary — the standard pretraining packing
    * where the tokenizer stream is cut every `budget` tokens). Returns per
    * document: token count, tokens before it in the stream (`cum_before`),
    * the sequence it starts in (`seq_id`) and its offset there.
    *
    * Scale shape: a naive `sum().over(Window.orderBy(...))` is a GLOBAL
    * window — one partition, one task, the classic scale-killer. Instead a
    * two-level prefix sum: within-block cumulative sums run in parallel
    * (window partitioned by block = orderCol div `blockSize`), block
    * totals — #blocks rows, thousands at 100 TB — take the only global
    * window, and block offsets join back on the block id. Identical
    * result, no corpus-wide single-task sort. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budget: Int, blockSize: Long = 4096L): DataFrame = {
    require(budget >= 1 && blockSize >= 1, "budget and blockSize must be >= 1")
    val base = docs.select(col(idCol).as("id"),
      graft.functions.TextFunctions.tokenStats(col(textCol))
        .getField("ws_tokens").cast("long").as("n_toks"))
    blockedPrefixSum(base, floor(col("id") / blockSize).cast("long"),
        Seq(col("id")), col("n_toks"))
      .select(col("id"), col("n_toks"), col("cum_before"))
      .withColumn("seq_id", floor(col("cum_before") / budget).cast("long"))
      .withColumn("seq_offset", col("cum_before") % budget)
  }

  /** Scale-safe exclusive prefix sum of `valCol` over the total order
    * (`blockCol` asc, then `order`): adds a `cum_before` column. The caller
    * must pick `blockCol` MONOTONE in the intended total order (equal-order
    * rows may never land in different blocks) — e.g. `id div blockSize`
    * for an id order, or a coarse quantized score for a score order.
    *
    * Two levels: within-block cumulative sums run in parallel (window
    * partitioned by block); only the per-block TOTALS — thousands of rows
    * at 100 TB — take a global window; offsets join back on the block id.
    * Identical to the naive global window, without its single-task sort. */
  def blockedPrefixSum(df: DataFrame, blockCol: Column, order: Seq[Column],
                       valCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.withColumn("_blk", blockCol).withColumn("_v", valCol)
    // ROWS, not the default RANGE frame: rows tied on the order keys must
    // each see only the rows physically before them, or cum_before absorbs
    // the peers' values and is no exclusive prefix sum for any total order.
    val wIn = Window.partitionBy(col("_blk")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBlk = base.withColumn("_cum_in", sum(col("_v")).over(wIn))
    val blkTot = base.groupBy(col("_blk")).agg(sum(col("_v")).as("_tot"))
    val wBlk = Window.orderBy(col("_blk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = blkTot
      .withColumn("_off", sum(col("_tot")).over(wBlk) - col("_tot"))
      .select(col("_blk"), col("_off"))
    inBlk.join(offsets, "_blk")
      .withColumn("cum_before", col("_off") + col("_cum_in") - col("_v"))
      .drop("_blk", "_v", "_cum_in", "_off")
  }

  /** Snapshot upsert-merge — the corpus-refresh MERGE a crawl pipeline runs
    * per snapshot: new content wins, and every key is labeled with what
    * happened to it (`insert` new-only, `update` both-but-changed, `carry`
    * both-and-identical, `retire` old-only). Returns one row per key:
    * (keyCol, action, content_hash) where content_hash is the md5 of the
    * SURVIVING content (the new side except for retire rows).
    *
    * Scale shape: both sides are reduced to (key, md5) BEFORE the join, so
    * the full-outer shuffle carries 16-byte hashes, never document bodies —
    * the same never-shuffle-raw-text rule the dedup family follows. One
    * shuffle per side + the join. Callers that need the merged BODIES join
    * this ledger back to the new snapshot by key (hash-equi join, AQE
    * decides broadcast). */
  def upsertSnapshot(oldDf: DataFrame, newDf: DataFrame,
                     keyCol: String, contentCol: String): DataFrame = {
    val o = oldDf.select(col(keyCol).as("_k"), md5(col(contentCol)).as("_oh"))
    val n = newDf.select(col(keyCol).as("_k"), md5(col(contentCol)).as("_nh"))
    o.join(n, Seq("_k"), "full_outer")
      .select(col("_k").as(keyCol),
        when(col("_oh").isNull, lit("insert"))
          .when(col("_nh").isNull, lit("retire"))
          .when(col("_oh") === col("_nh"), lit("carry"))
          .otherwise(lit("update")).as("action"),
        coalesce(col("_nh"), col("_oh")).as("content_hash"))
  }
}
