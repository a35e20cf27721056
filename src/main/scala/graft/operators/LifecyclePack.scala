package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.sources.Tables

/** Corpus lifecycle: snapshot-over-snapshot upsert merges and the
  * deterministic interleaved training order a mixed-source corpus is
  * served in.
  */
object LifecyclePack extends QueryPack {

  /** Offset for q108's phantom old-snapshot docs. Far above any real
    * doc_id at every scale factor (the DedupPack.CopyOffset convention) —
    * a colliding offset would silently put duplicate keys in the old side
    * and break upsertSnapshot's one-row-per-key contract. */
  val PhantomOffset = 1000000L

  /** q236 data-constrained epoch plan: the global budget is
    * EpochBudgetX × the corpus's unique tokens, allocation is
    * proportional to DOC counts (so sources with short docs land at
    * higher epoch counts and the plan has a spread), repetition value
    * decays by [[EpochDecay]] per epoch (δ = 0.5 keeps every power
    * exact in binary), and epochs cap at [[EpochCap]]. */
  val EpochBudgetX = 4L
  val EpochDecay = 0.5
  val EpochCap = 8L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Data-constrained training plan (the "how much is repeating my data
    // worth" table, after Muennighoff et al.'s data-constrained scaling):
    // per source, unique tokens (distinct content only — exact-dup
    // copies add nothing), the share of a 4×-unique-tokens budget the
    // source receives, the epoch count that implies, and the EFFECTIVE
    // tokens under geometric per-epoch decay — eff = u·((1−δ^f)/(1−δ)
    // + frac·δ^f) with f = ⌊epochs⌋ capped. Every input to the formula
    // is an exact long (unique tokens, integer-DIV allocation) and δ =
    // 0.5 makes δ^f exact in both engines, so the doubles agree
    // bit-for-bit. Scale: one dedup-shaped aggregation (content hash →
    // per-source sums) + a |sources|-row plan table; the window runs
    // over the reduced aggregate only.
    "q236_epoch_value_plan" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
        .select(col("source"), Dedup.contentHash(col("text")).as("ch"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("n_toks"))
      val uniq = docs.groupBy("source", "ch")
        .agg(count(lit(1)).as("n_copies"), first(col("n_toks")).as("n_toks"))
      val perSrc = uniq.groupBy("source")
        .agg(count(lit(1)).as("n_uniq_docs"), sum("n_copies").as("n_docs"),
          sum("n_toks").as("u_toks"))
      val wTot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val planned = perSrc
        .withColumn("total_u", sum("u_toks").over(wTot))
        .withColumn("total_docs", sum("n_docs").over(wTot))
        .withColumn("alloc_toks", expr(
          s"($EpochBudgetX * total_u * n_docs) DIV total_docs"))
        .withColumn("epochs_raw",
          col("alloc_toks").cast("double") / col("u_toks"))
        .withColumn("f", least(floor(col("epochs_raw")).cast("long"),
          lit(EpochCap)))
        .withColumn("frac", when(col("f") >= EpochCap, lit(0.0))
          .otherwise(col("epochs_raw") - col("f")))
        .withColumn("eff_toks",
          col("u_toks") * ((lit(1.0) - pow(lit(EpochDecay), col("f")))
            / (1.0 - EpochDecay)
            + col("frac") * pow(lit(EpochDecay), col("f"))))
      val P = graft.functions.Portable
      planned.select(col("source"), col("n_docs"), col("n_uniq_docs"),
          col("u_toks"), col("alloc_toks"),
          P.snap6(col("epochs_raw")).as("epochs"),
          floor(col("eff_toks")).cast("long").as("eff_toks"),
          when(col("alloc_toks") === 0, lit(null).cast("double"))
            .otherwise(P.snap6(col("eff_toks") / col("alloc_toks")))
            .as("utilization"))
        .orderBy("source")
    }),

    // Snapshot MERGE: the previous snapshot is simulated from the same
    // table (two-thirds of the docs, every fifth of those with older
    // content, plus phantom docs that vanished from the new crawl), so
    // every action class has members and both engines derive the identical
    // old side. The merge itself shuffles only (key, md5) — see
    // CorpusOps.upsertSnapshot.
    "q108_snapshot_merge" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents").select("doc_id", "text")
      val old = docs.filter(col("doc_id") % 3 =!= 2)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(lit("OLD:"), col("text")))
            .otherwise(col("text")).as("text"))
        .unionAll(docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + PhantomOffset).as("doc_id"), col("text")))
      CorpusOps.upsertSnapshot(old, docs, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Per-source percentile calibration — the data-mixing fairness step:
    // raw quality scores are NOT comparable across sources (a clean wiki
    // dump and a raw crawl have different score distributions), so each
    // source is ranked against ITSELF and the keep rule is "top 20% of
    // every source" (percent_rank >= 0.8). Scores are snapped to 6
    // decimals before ranking — the engine's score and the oracle's SQL
    // twin agree exactly at that precision (q21's invariant), and
    // percent_rank over (score6, doc_id) is then a pure integer-ratio
    // computation in both engines. One window + one aggregation, both
    // partitioned by source — no global shuffle.
    "q111_source_calibration" -> ((s, dir) => {
      val scored = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          graft.functions.Portable.snap6(
            graft.functions.TextFunctions.qualityScore(col("text"),
              TextPack.stopwords)).as("q6"))
      val w = Window.partitionBy("source").orderBy(col("q6"), col("doc_id"))
      scored.withColumn("pr", percent_rank().over(w))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pr") >= 0.8, 1L).otherwise(0L)).as("n_kept"),
          min(when(col("pr") >= 0.8, col("q6"))).as("min_kept_q"))
        .orderBy("source")
    }),

    // Token-budget pareto curve: rank the corpus by quality, cut it into
    // deciles, and report how many tokens each additional decile buys —
    // the planning table behind "how far down the quality ladder must we
    // reach for N tokens". The GLOBAL rank comes from
    // CorpusOps.blockedPrefixSum over (-q6, doc_id) — per-score-block
    // aggregates + a tiny offset table, not a single-partition window;
    // only the final 10-row decile table sees an unpartitioned window.
    "q118_budget_curve" -> ((s, dir) => {
      val scored = Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.Portable.snap6(
            graft.functions.TextFunctions.qualityScore(col("text"),
              TextPack.stopwords)).as("q6"),
          size(graft.functions.TextFunctions.tokens(col("text")))
            .cast("long").as("n_toks"))
      val ranked = CorpusOps.blockedPrefixSum(scored, -col("q6"),
          Seq(col("doc_id")), lit(1L))
        .withColumn("rank", col("cum_before") + 1L)
      // count-only scan: deriving n from `scored` would tokenize and
      // score the whole corpus a second time just to count rows
      val n = broadcast(Tables.table(s, dir, "documents")
        .agg(count(lit(1)).as("n")))
      // avg_q in integer micro-units: q6 sits on the 1e-6 grid, so a
      // decile's exact average can land ON the snap6 floor boundary
      // (observed: 0.778982 exactly at sf0.001) — a float-order ulp then
      // flips the floor. Summing the exact micro-longs first makes the
      // average one deterministic division.
      val byDecile = ranked.crossJoin(n)
        .withColumn("decile", expr("CAST(((rank - 1) * 10) DIV n AS BIGINT)"))
        .withColumn("q_micro", round(col("q6") * 1e6, 0).cast("long"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
          sum(col("q_micro")).as("q_micro_sum"))
        .withColumn("avg_q",
          graft.functions.Portable.snap6(col("q_micro_sum").cast("double") /
            (col("n_docs").cast("double") * 1e6)))
        .drop("q_micro_sum")
      val w = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDecile.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .select("decile", "n_docs", "n_tokens", "cum_tokens", "avg_q")
        .orderBy("decile")
    }),

    // Interleaved training order: round-robin across sources (rank-within-
    // source is the major key), realized WITHOUT a single-partition global
    // window — the global position comes from CorpusOps.blockedPrefixSum
    // (per-block aggregate + tiny offset table), the same scale-safe prefix
    // sum sequence packing uses. Per-source ranks partition by source;
    // block sizes cap at the source count.
    // Deterministic range layout + manifest: shard boundaries are EXACT
    // quartiles (snapped to 9 decimals, the q107 convention) rather than
    // Spark's repartitionByRange reservoir sample — sampled boundaries
    // change run to run, which poisons diffable exports and incremental
    // reprocessing; explicit cutpoints are the 100 TB answer (compute
    // once, reuse across runs). Output is the per-shard manifest (count,
    // min, max) a range-pruning reader consumes: a scan for
    // n_chars BETWEEN a AND b touches only shards whose [min,max]
    // intersects.
    "q143_range_layout" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      // one percentile buffer for all three cut points (array form)
      val cuts = d.agg(
          expr("percentile(n_chars, array(0.25D, 0.50D, 0.75D))").as("_c"))
        .select(round(col("_c")(0), 9).as("c1"),
          round(col("_c")(1), 9).as("c2"),
          round(col("_c")(2), 9).as("c3"))
      d.crossJoin(broadcast(cuts))
        .withColumn("shard",
          when(col("n_chars") < col("c1"), 0L)
            .when(col("n_chars") < col("c2"), 1L)
            .when(col("n_chars") < col("c3"), 2L).otherwise(3L))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"),
          sum("n_chars").as("chars"))
        .orderBy("shard")
    }),

    "q110_interleave" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents").select("doc_id", "source")
      val wSrc = Window.partitionBy("source").orderBy("doc_id")
      val ranked = docs.withColumn("rn", row_number().over(wSrc))
      CorpusOps.blockedPrefixSum(ranked, col("rn"),
          Seq(col("source"), col("doc_id")), lit(1L))
        .select(col("doc_id"), col("source"), col("rn"),
          (col("cum_before") + 1L).as("pos"))
        .orderBy("pos")
    })
  )

  def oracles: Map[String, String] = Map(

    "q236_epoch_value_plan" -> {
      val P = graft.functions.Portable
      s"""WITH d AS (SELECT source, ${DedupPack.contentHashSql("text")} AS ch,
         |             CAST(len(${TextPack.toksSql("text")}) AS BIGINT)
         |               AS n_toks
         |           FROM documents),
         |u AS (SELECT source, ch, count(*) AS n_copies, min(n_toks) AS n_toks
         |      FROM d GROUP BY 1, 2),
         |ps AS (SELECT source, count(*) AS n_uniq_docs,
         |              sum(n_copies) AS n_docs, sum(n_toks) AS u_toks
         |       FROM u GROUP BY 1),
         |t AS (SELECT sum(u_toks) AS total_u, sum(n_docs) AS total_docs
         |      FROM ps),
         |p AS (SELECT ps.*, ($EpochBudgetX * total_u * n_docs) // total_docs
         |             AS alloc_toks
         |      FROM ps CROSS JOIN t),
         |e AS (SELECT *, CAST(alloc_toks AS DOUBLE) / u_toks AS epochs_raw
         |      FROM p),
         |f AS (SELECT *, least(CAST(floor(epochs_raw) AS BIGINT), $EpochCap)
         |             AS fe FROM e),
         |g AS (SELECT *, CASE WHEN fe >= $EpochCap THEN 0.0
         |                     ELSE epochs_raw - fe END AS frac FROM f),
         |h AS (SELECT *, u_toks * ((1.0 - pow($EpochDecay, fe))
         |               / ${1.0 - EpochDecay}
         |               + frac * pow($EpochDecay, fe)) AS eff FROM g)
         |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
         |       CAST(n_uniq_docs AS BIGINT) AS n_uniq_docs,
         |       CAST(u_toks AS BIGINT) AS u_toks,
         |       CAST(alloc_toks AS BIGINT) AS alloc_toks,
         |       ${P.snap6Sql("epochs_raw")} AS epochs,
         |       CAST(floor(eff) AS BIGINT) AS eff_toks,
         |       CASE WHEN alloc_toks = 0 THEN NULL
         |            ELSE ${P.snap6Sql("eff / alloc_toks")} END AS utilization
         |FROM h ORDER BY source""".stripMargin
    },

    "q108_snapshot_merge" ->
      """WITH old AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 5 = 0 THEN 'OLD:' || text ELSE text END AS text
        |  FROM documents WHERE doc_id % 3 <> 2
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text
        |  FROM documents WHERE doc_id % 7 = 0),
        |o AS (SELECT doc_id, md5(text) AS oh FROM old),
        |n AS (SELECT doc_id, md5(text) AS nh FROM documents)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |       CASE WHEN o.oh IS NULL THEN 'insert'
        |            WHEN n.nh IS NULL THEN 'retire'
        |            WHEN o.oh = n.nh THEN 'carry'
        |            ELSE 'update' END AS action,
        |       coalesce(n.nh, o.oh) AS content_hash
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,

    "q111_source_calibration" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, text, ${TextPack.toksSql("text")} AS toks
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, source,
         |         ${graft.functions.Portable.snap6Sql(graft.functions.TextFunctions.qualityScoreSql(TextPack.stopwords))} AS q6
         |  FROM t),
         |r AS (
         |  SELECT source, q6,
         |         percent_rank() OVER (PARTITION BY source
         |                              ORDER BY q6, doc_id) AS pr
         |  FROM s)
         |SELECT source, count(*) AS n_docs,
         |       CAST(count(*) FILTER (WHERE pr >= 0.8) AS BIGINT) AS n_kept,
         |       min(CASE WHEN pr >= 0.8 THEN q6 END) AS min_kept_q
         |FROM r GROUP BY source ORDER BY source""".stripMargin,

    "q118_budget_curve" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, ${TextPack.toksSql("text")} AS toks
         |  FROM documents),
         |s AS (
         |  SELECT doc_id,
         |         ${graft.functions.Portable.snap6Sql(graft.functions.TextFunctions.qualityScoreSql(TextPack.stopwords))} AS q6,
         |         CAST(len(toks) AS BIGINT) AS n_toks
         |  FROM t),
         |r AS (
         |  SELECT q6, n_toks,
         |         row_number() OVER (ORDER BY q6 DESC, doc_id) AS rank,
         |         count(*) OVER () AS n
         |  FROM s),
         |g AS (
         |  SELECT CAST(((rank - 1) * 10) // n AS BIGINT) AS decile,
         |         count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |         ${graft.functions.Portable.snap6Sql(
                     "CAST(sum(CAST(round(q6 * 1000000.0) AS BIGINT)) AS DOUBLE)" +
                     " / (CAST(count(*) AS DOUBLE) * 1000000.0)")} AS avg_q
         |  FROM r GROUP BY 1)
         |SELECT decile, n_docs, n_tokens,
         |       CAST(sum(n_tokens) OVER (ORDER BY decile
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |            AS BIGINT) AS cum_tokens,
         |       avg_q
         |FROM g ORDER BY decile""".stripMargin,

    "q143_range_layout" ->
      """WITH cuts AS (
        |  SELECT round(quantile_cont(n_chars, 0.25), 9) AS c1,
        |         round(quantile_cont(n_chars, 0.50), 9) AS c2,
        |         round(quantile_cont(n_chars, 0.75), 9) AS c3
        |  FROM documents)
        |SELECT CASE WHEN n_chars < c1 THEN 0
        |            WHEN n_chars < c2 THEN 1
        |            WHEN n_chars < c3 THEN 2 ELSE 3 END AS shard,
        |       count(*) AS n_docs,
        |       CAST(min(n_chars) AS BIGINT) AS min_chars,
        |       CAST(max(n_chars) AS BIGINT) AS max_chars,
        |       CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents CROSS JOIN cuts
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q110_interleave" ->
      """SELECT doc_id, source, CAST(rn AS INT) AS rn,
        |       CAST(row_number() OVER (ORDER BY rn, source, doc_id) AS BIGINT) AS pos
        |FROM (SELECT doc_id, source,
        |             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        |      FROM documents)
        |ORDER BY pos""".stripMargin
  )
}
