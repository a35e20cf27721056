package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.sources.Tables

/** General relational surface: hash aggregation, top-k, event-time windows,
  * JSON extraction, ranking/analytic window functions.
  *
  * The reference has no SQL surface — its aggregations are hand-rolled
  * reduces (SURVEY.md §2.4) and it has no window/sort/top-k operators at all
  * (§2.5-2.7). These queries define that surface for the Spark engine, all
  * as single-shuffle Catalyst plans with map-side partial aggregation.
  */
object AnalyticsPack extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Hash aggregate with partial/final split (TPC-H Q1 flavor).
    "q06_lineitem_agg" -> ((s, dir) => {
      Tables.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Top-k: total rating per item, deterministic tiebreak, limit 10.
    "q11_topk_items" -> ((s, dir) => {
      Ratings.ratings(s, dir)
        .groupBy(col("item_id"))
        .agg(sum(col("rating")).as("total"), count(lit(1)).as("n"))
        .orderBy(col("total").desc, col("item_id"))
        .limit(10)
    }),

    // Event-time tumbling window aggregation (batch twin of the streaming
    // windowed agg; Structured Streaming version in graft.streaming).
    "q12_event_windows" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
        .orderBy("window_start", "event_type")
    }),

    // Semi-structured extraction: props is a JSON object column.
    "q13_json_extract" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(round(avg(col("k")), 6).as("avg_k"),
          sum(col("k")).cast("long").as("sum_k"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // Ranking window function: top-3 orders per customer by total price.
    "q14_rank_per_customer" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.table(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rk"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_custkey", "rk")
    }),

    // Sessionization: per-user sessions split on >30 min event gaps —
    // lag + cumulative-sum session ids, one shuffle on user_id. The
    // streaming twin (session_window + watermark) lives in
    // StreamingWindowSpec; this batch form is the oracle-checked one.
    "q37_sessions" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      // fractional epoch seconds on BOTH engines. Parity note: the parquet
      // column is TIMESTAMP(NANOS); Spark reads it as long and truncates to
      // micros (Tables.events, ts div 1000) and DuckDB's plain TIMESTAMP
      // read truncates to micros the same way (verified: epoch_ns % 1000 =
      // 0 after read), so both compare identical microsecond values
      val epochS = col("ts").cast("double")
      val newSession = when(
        epochS - lag(epochS, 1).over(byUser) > 1800.0, 1).otherwise(0)
      Tables.events(s, dir)
        .withColumn("new_s", newSession)
        .withColumn("session_no", sum(col("new_s")).over(byUser))
        .groupBy(col("user_id"), col("session_no"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("session_value"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("max_session_events"),
          round(sum(col("session_value")), 4).as("total_value"))
        .orderBy("user_id")
    }),

    // Sessionization via Spark's NATIVE session_window (q37 is the
    // hand-rolled lag+cumsum twin): one groupBy producing the merged
    // per-user sessions, the same operator that runs unchanged as a
    // watermarked streaming query — THE reason to prefer it over the
    // window-function form at scale (no per-user total ordering; state
    // merges incrementally). Boundary semantics differ from q37 by one
    // edge: session_window merges only OVERLAPPING [ts, ts+gap) windows,
    // so a gap of EXACTLY 30 min starts a new session (the oracle uses
    // >=, where q37's hand-rolled twin used >). Output boundaries ride
    // as exact epoch microseconds — no float compare.
    "q156_session_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("session_value"))
        .select(col("user_id"),
          unix_micros(col("sw.start")).as("session_start_us"),
          unix_micros(col("sw.end")).as("session_end_us"),
          col("n_events"), col("session_value"))
        .orderBy("user_id", "session_start_us")
    }),

    // Last-touch attribution: each purchase credits the user's most
    // recent STRICTLY-EARLIER marketing touch (click/view). The frame is
    // RANGE over epoch micros ending at -1, not ROWS at -1: a ROWS frame
    // would still include a touch sharing the purchase's exact timestamp
    // (it is a preceding row), and a same-instant touch must not be
    // credited. Because RANGE peers have no defined row order, the pick
    // inside the frame is a MAX over an order-encoded key (zero-padded
    // micros : event_id : type) — deterministic in any engine — rather
    // than last(). One window over the user partition; integer cents.
    "q139_attribution" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(expr("unix_micros(ts)"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val touchKey = concat(
        lpad(expr("CAST(unix_micros(ts) AS STRING)"), 20, "0"), lit(":"),
        lpad(col("event_id").cast("string"), 12, "0"), lit(":"),
        col("event_type"))
      Tables.events(s, dir)
        .withColumn("tk",
          max(when(col("event_type").isin("click", "view"), touchKey))
            .over(w))
        .withColumn("touch", element_at(split(col("tk"), ":"), 3))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("none")).as("touch"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("cents"))
        .orderBy("touch")
    }),

    // SCD2 interval build: collapse each user's event-type runs into
    // validity intervals [valid_from, valid_to) — the slowly-changing-
    // dimension history a warehouse derives from a change stream. Two
    // windows over the user partition (lag to detect changes, lead on
    // the COLLAPSED rows to close intervals); durations summed in exact
    // integer microseconds; open intervals (the current state) counted
    // separately.
    "q140_scd2" -> ((s, dir) => {
      val byU = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val changes = Tables.events(s, dir)
        .withColumn("prev", lag(col("event_type"), 1).over(byU))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
          expr("unix_micros(ts)").as("from_us"))
      val iv = changes.withColumn("to_us", lead(col("from_us"), 1).over(byU))
      iv.groupBy("event_type")
        .agg(count(lit(1)).as("n_intervals"),
          sum(when(col("to_us").isNull, 1L).otherwise(0L)).as("n_open"),
          sum(when(col("to_us").isNotNull, col("to_us") - col("from_us"))
            .otherwise(0L)).as("dur_us"))
        .orderBy("event_type")
    }),

    // Temporal dimension join — the warehouse classic: each fact row
    // joined to the dimension VERSION valid at the fact's event time
    // (fact.ts ∈ [valid_from, valid_to)). Dimension = SCD2 state
    // intervals (q140's construction) over the user's NON-purchase
    // events — "what was the user doing when they purchased"; facts =
    // purchase events. The validity predicate is a range, which would
    // plan a per-user nested loop; instead the fact rides
    // RangeJoin.binnedIntervalJoin as a zero-width interval [t, t+1),
    // so the plan is a (user, day-bin) hash join. Open (current)
    // versions are capped at corpus-max-ts+1 via a 1-row aggregate — a
    // scalar broadcast, never a data-sized one. Non-purchase intervals
    // tile each user's timeline from the first such event, so every
    // purchase after it matches exactly one version; the census
    // aggregates purchases by the state they landed in.
    "q170_temporal_dim_join" -> ((s, dir) => {
      val byU = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val ev = Tables.events(s, dir)
      val changes = ev
        .filter(col("event_type") =!= "purchase")
        .withColumn("prev", lag(col("event_type"), 1).over(byU))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        .select(col("user_id"), col("event_type").as("state"),
          col("ts"), col("event_id"),
          expr("unix_micros(ts)").as("from_us"))
      val maxTs = ev.agg((max(expr("unix_micros(ts)")) + 1L).as("cap"))
      val dim = changes
        .withColumn("to_us0", lead(col("from_us"), 1).over(byU))
        .crossJoin(broadcast(maxTs))
        .select(col("user_id"), col("state"), col("from_us"),
          coalesce(col("to_us0"), col("cap")).as("to_us"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("fact_id"),
          expr("unix_micros(ts)").as("t"),
          (expr("unix_micros(ts)") + 1L).as("t1"))
      RangeJoin.binnedIntervalJoin(dim, facts, "user_id",
          "from_us", "to_us", "t", "t1", binWidth = 86400000000L)
        .groupBy("state")
        .agg(count(lit(1)).as("n_purchases"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy("state")
    }),

    // Next-event training examples: the sequence-dataset builder that
    // turns an event log into (context window → label) rows for a
    // next-action model — per user, each event becomes a labeled example
    // whose features are the 3 preceding event types. Pure lag windows
    // over one shuffle by user; the context never materializes as an
    // array (3 scalar columns), so the output is straight scan-shaped
    // and the oracle pins every example exactly. At 100 TB this is one
    // pass; the per-user window is the parallel unit.
    "q179_next_event_dataset" -> ((s, dir) => {
      val byU = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("idx", row_number().over(byU).cast("long"))
        .withColumn("c1", lag(col("event_type"), 3).over(byU))
        .withColumn("c2", lag(col("event_type"), 2).over(byU))
        .withColumn("c3", lag(col("event_type"), 1).over(byU))
        .filter(col("c1").isNotNull)
        .select(col("user_id"), col("idx"), col("c1"), col("c2"), col("c3"),
          col("event_type").as("label"))
        .orderBy("user_id", "idx")
    }),

    // TPC-H Q5-shaped multi-join: fact chain customer ⋈ orders ⋈ lineitem
    // with the dimension chain supplier/nation/region riding BROADCASTS —
    // revenue per nation. The canonical star-join scale shape: the only
    // shuffles are the fact-fact joins on their keys; every dimension
    // join is map-side (plan-asserted in ScaleJoinsSpec).
    "q98_star_join" -> ((s, dir) => {
      val customer = Tables.table(s, dir, "customer")
      val orders = Tables.table(s, dir, "orders")
      val lineitem = Tables.table(s, dir, "lineitem")
      val supplier = Tables.table(s, dir, "supplier")
      val nation = Tables.table(s, dir, "nation")
      val region = Tables.table(s, dir, "region")
      customer
        .join(orders, col("c_custkey") === col("o_custkey"))
        .join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // The salted skew join, oracle-checked: its output must be EXACTLY
    // the plain join's (salting redistributes work, never rows). The
    // events fact joins a small per-user dimension on a key whose
    // distribution is skewed; the aggregation pins row-level parity.
    "q99_salted_join" -> ((s, dir) => {
      val events = Tables.events(s, dir)
        .select(col("user_id"), col("value"))
      val dim = Tables.table(s, dir, "customer")
        .filter(col("c_custkey") < 150)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      ScaleJoins.saltedJoin(events, dim, key = "user_id", salt = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("total_value"))
        .orderBy("c_mktsegment")
    }),

    // Skew-safe two-stage aggregation: 3-ish return flags over the whole
    // lineitem fact is the textbook hot-reducer shape; the salted
    // partial stage spreads each flag over 16 buckets, the final stage
    // re-sums 16 rows per flag. Money/quantity run in integer cents so
    // the two-stage re-association is exact, and the result equals the
    // plain one-stage GROUP BY bit-for-bit (the oracle IS the one-stage
    // form).
    "q133_salted_agg" -> ((s, dir) => {
      val li = Tables.table(s, dir, "lineitem")
        .select(col("l_returnflag"),
          round(col("l_quantity") * 100, 0).cast("long").as("qty_cents"),
          round(col("l_extendedprice") * 100, 0).cast("long")
            .as("price_cents"))
      ScaleJoins.saltedAgg(li, "l_returnflag",
          Map("qty_cents" -> col("qty_cents"),
            "price_cents" -> col("price_cents")),
          buckets = 16)
        .orderBy("l_returnflag")
    }),

    // Z-order clustering key: the Morton interleave of (l_partkey,
    // l_suppkey) plus its coarse layout cell — the multi-dimension
    // data-skipping layout (ZOrder.layoutWrite / boxScan prune on the
    // cell; pruning is plan-asserted in ZOrderSpec). The key itself is a
    // pure shift/or expression, oracle-checked bit-for-bit.
    "q89_zorder_key" -> ((s, dir) => {
      Tables.table(s, dir, "lineitem")
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"),
          ZOrder.zkey(col("l_partkey"), col("l_suppkey"), bits = 16).as("zkey"),
          ZOrder.cell(col("l_partkey"), col("l_suppkey"),
            bits = 16, coarseBits = 4).as("zcell"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Multi-level aggregation: rollup over (returnflag, linestatus) with
    // grouping-level indicator — partial aggregation covers all levels in
    // one pass (absent from the reference; part of the relational surface).
    "q41_rollup" -> ((s, dir) => {
      Tables.table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().cast("long").as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Set operations: INTERSECT / EXCEPT between customer key slices
    // (reference only ever unions — §2.7).
    "q42_setops" -> ((s, dir) => {
      val byNation = Tables.table(s, dir, "customer")
        .filter(col("c_nationkey") < 10).select(col("c_custkey"))
      val byBalance = Tables.table(s, dir, "customer")
        .filter(col("c_acctbal") > 0).select(col("c_custkey"))
      val both = byNation.intersect(byBalance)
        .withColumn("op", lit("intersect"))
      val only = byNation.except(byBalance)
        .withColumn("op", lit("except"))
      both.unionAll(only)
        .groupBy(col("op")).agg(count(lit(1)).as("n"),
          min(col("c_custkey")).as("min_key"), max(col("c_custkey")).as("max_key"))
        .orderBy("op")
    }),

    // Exact interpolated percentiles of order totals per order-priority —
    // percentile() in Spark and quantile_cont() in DuckDB share the
    // linear-interpolation definition, so the results hash-match.
    "q43_percentiles" -> ((s, dir) => {
      // ONE percentile buffer per group: the array form computes all three
      // points from a single value map — three separate percentile() aggs
      // each buffered every group value (3x agg memory and insert cost).
      Tables.table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile(o_totalprice, array(0.5D, 0.9D, 0.99D))").as("_ps"),
          count(lit(1)).as("n"))
        .select(col("o_orderpriority"),
          round(col("_ps")(0), 4).as("p50"),
          round(col("_ps")(1), 4).as("p90"),
          round(col("_ps")(2), 4).as("p99"),
          col("n"))
        .orderBy("o_orderpriority")
    }),

    // Approximate quantiles with an accuracy gate — the q54-HLL pattern
    // applied to percentiles: exact percentile() at 100 TB materializes
    // every group's values (full sort); approx_percentile is the
    // mergeable-sketch scale path. Production runs ONLY the sketch; this
    // gate query runs both and pins the sketch inside an exact-percentile
    // band (the approx VALUE itself is merge-order dependent and must not
    // be an output column — only the deterministic gate is).
    "q66_approx_quantiles" -> ((s, dir) => {
      val acc = 10000 // rank error <= 1/acc
      // ONE exact buffer + ONE sketch per group: the old per-point form
      // ran SEVEN exact percentile() aggs (each holding a full copy of the
      // group's values) and three independent approx sketches; the array
      // forms compute every point from one value map / one sketch.
      val exactPs = Seq(0.495, 0.5, 0.505, 0.895, 0.905, 0.985, 0.995)
      val ex = expr("percentile(o_totalprice, array(" +
        exactPs.map(p => s"${p}D").mkString(", ") + "))")
      val ap = expr(
        s"approx_percentile(o_totalprice, array(0.5D, 0.9D, 0.99D), $acc)")
      def gate(ai: Int, loI: Int, hiI: Int) =
        (col("_ap")(ai) >= col("_ex")(loI)) && (col("_ap")(ai) <= col("_ex")(hiI))
      Tables.table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), ex.as("_ex"), ap.as("_ap"))
        .select(col("o_orderpriority"), col("n"),
          round(col("_ex")(1), 4).as("p50_exact"),
          gate(0, 0, 2).as("p50_ok"),
          gate(1, 3, 4).as("p90_ok"),
          gate(2, 5, 6).as("p99_ok"))
        .orderBy("o_orderpriority")
    }),

    // As-of join: deterministic probe times derived from order keys, each
    // matched to the user's most recent event at-or-before the probe — the
    // union-timeline operator (AsOfJoin), not a join explosion.
    "q47_asof_join" -> ((s, dir) => {
      val probes = Tables.table(s, dir, "orders")
        .filter(col("o_orderkey") % 40 === 0)
        .select(col("o_orderkey").as("probe_id"),
          (col("o_custkey") % 150).as("user_id"),
          expr("timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, o_orderkey % 2592000)").as("pts"))
      val events = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      AsOfJoin.asOf(probes, events, key = "user_id", pts = "pts",
        ts = "ts", ordCol = "event_id", payload = Seq("event_id", "value"))
        .select(col("probe_id"), col("user_id"),
          col("asof_event_id"), round(col("asof_value"), 4).as("asof_value"))
        .orderBy("probe_id")
    }),

    // Sweep-line interval concurrency: each event opens an interval of
    // `value` minutes; the maximum number of simultaneously-open
    // intervals per event type falls out of ONE sort — explode each
    // interval to (+1 at start, -1 at end), running-sum in time order.
    // The classic O(n log n) answer to a question the naive
    // interval-overlap self-join makes quadratic. Endpoint tie rule is
    // part of the contract: at the same instant, ends close BEFORE
    // starts open (delta ascending), so back-to-back intervals never
    // double-count.
    "q148_concurrency" -> ((s, dir) => {
      val iv = Tables.events(s, dir)
        .select(col("event_type"),
          expr("unix_micros(ts)").as("s"),
          (expr("unix_micros(ts)")
            + (round(col("value") * 100, 0).cast("long") * 600000L)).as("e"),
          col("event_id"))
      val marks = iv.select(col("event_type"), col("s").as("t"),
          lit(1).as("d"), col("event_id"))
        .unionAll(iv.select(col("event_type"), col("e").as("t"),
          lit(-1).as("d"), col("event_id")))
      val w = Window.partitionBy("event_type")
        .orderBy(col("t"), col("d"), col("event_id"))
      marks.withColumn("open", sum(col("d")).over(w))
        .groupBy("event_type")
        .agg(max(col("open")).as("max_concurrent"),
          count(lit(1)).as("n_endpoints"))
        .orderBy("event_type")
    }),

    // Bag-semantics set ops: INTERSECT ALL / EXCEPT ALL keep
    // MULTIPLICITIES (min / difference of per-value counts) — the corner
    // where the DISTINCT variants (q42) silently lie about duplicated
    // data. Run over the deliberately-duplicated nationkey column.
    "q149_setops_all" -> ((s, dir) => {
      val a = Tables.table(s, dir, "customer")
        .filter(col("c_custkey") % 2 === 0).select(col("c_nationkey"))
      val b = Tables.table(s, dir, "customer")
        .filter(col("c_custkey") % 3 === 0).select(col("c_nationkey"))
      val inter = a.intersectAll(b).withColumn("op", lit("intersect_all"))
      val exc = a.exceptAll(b).withColumn("op", lit("except_all"))
      inter.unionAll(exc)
        .groupBy("op")
        .agg(count(lit(1)).as("n"),
          count_distinct(col("c_nationkey")).as("n_distinct"))
        .orderBy("op")
    }),

    // Forward as-of with a match tolerance: for each probe, the EARLIEST
    // event at-or-after it, but only within 1 hour — the "next reading
    // after the incident, if timely" lookup (pandas merge_asof
    // direction='forward' + tolerance). Same single-shuffle union
    // timeline as q47, scanned on the negated axis.
    "q147_asof_forward" -> ((s, dir) => {
      val probes = Tables.table(s, dir, "orders")
        .filter(col("o_orderkey") % 40 === 0)
        .select(col("o_orderkey").as("probe_id"),
          (col("o_custkey") % 150).as("user_id"),
          expr("timestamp'2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, o_orderkey % 2592000)").as("pts"))
      val events = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      AsOfJoin.asOf(probes, events, key = "user_id", pts = "pts",
          ts = "ts", ordCol = "event_id", payload = Seq("event_id", "value"),
          forward = true, tolerance = Some(3600L * 1000000L))
        .select(col("probe_id"), col("user_id"),
          col("asof_event_id"), round(col("asof_value"), 4).as("asof_value"))
        .orderBy("probe_id")
    }),

    // Range join: events against deterministic 4-hour maintenance windows
    // (one per January day) via the binned equi-join — no nested-loop.
    "q48_range_join" -> ((s, dir) => {
      val windows = graft.sources.Tables.idRange(s, 30)
        .select(col("id").as("window_id"),
          expr("timestamp'2024-01-01 08:00:00' + make_interval(0,0,0, CAST(id - 1 AS INT))").as("w_start"),
          expr("timestamp'2024-01-01 12:00:00' + make_interval(0,0,0, CAST(id - 1 AS INT))").as("w_end"))
      val events = Tables.events(s, dir)
        .select(col("ts"), col("event_type"), col("value"))
      RangeJoin.binnedRangeJoin(events, windows, "ts", "w_start", "w_end")
        .groupBy(col("window_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("total_value"))
        .orderBy("window_id")
    }),

    // Analytic window frame: running revenue per customer over order date.
    "q15_running_total" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.table(s, dir, "orders")
        .filter(col("o_custkey") % 100 === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 4).as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    })
  )

  def oracles: Map[String, String] = Map(
    "q06_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |       ROUND(AVG(l_quantity), 6) AS avg_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q11_topk_items" ->
      s"""WITH r AS (${Ratings.ratingsSql})
         |SELECT item_id, SUM(rating) AS total, CAST(COUNT(*) AS BIGINT) AS n
         |FROM r GROUP BY 1 ORDER BY total DESC, item_id LIMIT 10""".stripMargin,

    "q12_event_windows" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |       event_type,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(SUM(value), 4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q13_json_extract" ->
      """SELECT event_type,
        |       ROUND(AVG(CAST(json_extract(props, '$.k') AS INTEGER)), 6) AS avg_k,
        |       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q14_rank_per_customer" ->
      """SELECT o_custkey, o_orderkey, rk, ROUND(o_totalprice, 2) AS price
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
        |      FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,

    "q47_asof_join" ->
      """WITH probes AS (
        |  SELECT o_orderkey AS probe_id, o_custkey % 150 AS user_id,
        |         TIMESTAMP '2024-01-01 00:00:00'
        |           + (o_orderkey % 2592000) * INTERVAL 1 SECOND AS pts
        |  FROM orders WHERE o_orderkey % 40 = 0),
        |ranked AS (
        |  SELECT p.probe_id, p.user_id, e.event_id, e.value,
        |         ROW_NUMBER() OVER (PARTITION BY p.probe_id
        |                            ORDER BY e.ts DESC, e.event_id DESC) AS rn
        |  FROM probes p LEFT JOIN events e
        |    ON e.user_id = p.user_id AND e.ts <= p.pts)
        |SELECT probe_id, user_id,
        |       event_id AS asof_event_id, ROUND(value, 4) AS asof_value
        |FROM ranked WHERE rn = 1 ORDER BY probe_id""".stripMargin,

    "q148_concurrency" ->
      """WITH iv AS (
        |  SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS s,
        |         CAST(epoch_us(ts) AS BIGINT)
        |           + CAST(round(value * 100) AS BIGINT) * 600000 AS e,
        |         event_id
        |  FROM events),
        |marks AS (
        |  SELECT event_type, s AS t, 1 AS d, event_id FROM iv
        |  UNION ALL
        |  SELECT event_type, e AS t, -1 AS d, event_id FROM iv),
        |sweep AS (
        |  SELECT event_type,
        |         sum(d) OVER (PARTITION BY event_type
        |                      ORDER BY t, d, event_id) AS open
        |  FROM marks)
        |SELECT event_type, CAST(max(open) AS BIGINT) AS max_concurrent,
        |       count(*) AS n_endpoints
        |FROM sweep GROUP BY 1 ORDER BY 1""".stripMargin,

    "q149_setops_all" ->
      """WITH a AS (SELECT c_nationkey FROM customer WHERE c_custkey % 2 = 0),
        |b AS (SELECT c_nationkey FROM customer WHERE c_custkey % 3 = 0),
        |u AS (
        |  SELECT 'intersect_all' AS op, c_nationkey
        |  FROM (SELECT c_nationkey FROM a INTERSECT ALL
        |        SELECT c_nationkey FROM b)
        |  UNION ALL
        |  SELECT 'except_all' AS op, c_nationkey
        |  FROM (SELECT c_nationkey FROM a EXCEPT ALL
        |        SELECT c_nationkey FROM b))
        |SELECT op, count(*) AS n,
        |       CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_distinct
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    "q147_asof_forward" ->
      """WITH probes AS (
        |  SELECT o_orderkey AS probe_id, o_custkey % 150 AS user_id,
        |         TIMESTAMP '2024-01-01 00:00:00'
        |           + (o_orderkey % 2592000) * INTERVAL 1 SECOND AS pts
        |  FROM orders WHERE o_orderkey % 40 = 0),
        |ranked AS (
        |  SELECT p.probe_id, p.user_id, e.event_id, e.value,
        |         ROW_NUMBER() OVER (PARTITION BY p.probe_id
        |                            ORDER BY e.ts ASC, e.event_id DESC) AS rn
        |  FROM probes p LEFT JOIN events e
        |    ON e.user_id = p.user_id AND e.ts >= p.pts
        |   AND epoch_us(e.ts) - epoch_us(p.pts) <= 3600000000)
        |SELECT probe_id, user_id,
        |       event_id AS asof_event_id, ROUND(value, 4) AS asof_value
        |FROM ranked WHERE rn = 1 ORDER BY probe_id""".stripMargin,

    "q48_range_join" ->
      """WITH w AS (
        |  SELECT range AS window_id,
        |         TIMESTAMP '2024-01-01 08:00:00' + (range - 1) * INTERVAL 1 DAY AS w_start,
        |         TIMESTAMP '2024-01-01 12:00:00' + (range - 1) * INTERVAL 1 DAY AS w_end
        |  FROM range(1, 31))
        |SELECT window_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       ROUND(SUM(value), 4) AS total_value
        |FROM events JOIN w ON ts >= w_start AND ts < w_end
        |GROUP BY window_id ORDER BY window_id""".stripMargin,

    "q98_star_join" ->
      """SELECT n_name,
        |       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q99_salted_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
        |       ROUND(SUM(value), 4) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |WHERE c_custkey < 150
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q139_attribution" ->
      """WITH t AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
        |         max(CASE WHEN event_type IN ('click', 'view')
        |             THEN lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
        |               || ':' || lpad(CAST(event_id AS VARCHAR), 12, '0')
        |               || ':' || event_type END)
        |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
        |                 RANGE BETWEEN UNBOUNDED PRECEDING
        |                           AND 1 PRECEDING) AS tk
        |  FROM events)
        |SELECT coalesce(string_split(tk, ':')[3], 'none') AS touch,
        |       count(*) AS n,
        |       CAST(sum(cents) AS BIGINT) AS cents
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q140_scd2" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         CAST(epoch_us(ts) AS BIGINT) AS from_us
        |  FROM o WHERE prev IS NULL OR prev <> event_type),
        |iv AS (
        |  SELECT event_type, from_us,
        |         lead(from_us) OVER (PARTITION BY user_id
        |                             ORDER BY ts, event_id) AS to_us
        |  FROM c)
        |SELECT event_type, count(*) AS n_intervals,
        |       CAST(sum(CASE WHEN to_us IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_open,
        |       CAST(sum(CASE WHEN to_us IS NOT NULL THEN to_us - from_us
        |                     ELSE 0 END) AS BIGINT) AS dur_us
        |FROM iv GROUP BY 1 ORDER BY 1""".stripMargin,

    "q170_temporal_dim_join" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev
        |  FROM events WHERE event_type <> 'purchase'),
        |c AS (
        |  SELECT user_id, event_type AS state, ts, event_id,
        |         CAST(epoch_us(ts) AS BIGINT) AS from_us
        |  FROM o WHERE prev IS NULL OR prev <> event_type),
        |cap AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) + 1 AS cap FROM events),
        |dim AS (
        |  SELECT user_id, state, from_us,
        |         coalesce(lead(from_us) OVER (PARTITION BY user_id
        |                                      ORDER BY ts, event_id),
        |                  (SELECT cap FROM cap)) AS to_us
        |  FROM c),
        |f AS (
        |  SELECT user_id, event_id AS fact_id,
        |         CAST(epoch_us(ts) AS BIGINT) AS t
        |  FROM events WHERE event_type = 'purchase')
        |SELECT dim.state, count(*) AS n_purchases,
        |       CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_users
        |FROM f JOIN dim ON dim.user_id = f.user_id
        |              AND f.t >= dim.from_us AND f.t < dim.to_us
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q179_next_event_dataset" ->
      """WITH w AS (
        |  SELECT user_id,
        |         CAST(row_number() OVER u AS BIGINT) AS idx,
        |         lag(event_type, 3) OVER u AS c1,
        |         lag(event_type, 2) OVER u AS c2,
        |         lag(event_type, 1) OVER u AS c3,
        |         event_type AS label
        |  FROM events
        |  WINDOW u AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, idx, c1, c2, c3, label FROM w
        |WHERE c1 IS NOT NULL ORDER BY user_id, idx""".stripMargin,

    "q133_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |            AS BIGINT) AS price_cents,
        |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT))
        |            AS BIGINT) AS qty_cents
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q89_zorder_key" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         |       ${ZOrder.zkeySql("l_partkey", "l_suppkey", 16)} AS zkey,
         |       ${ZOrder.zkeySql("(l_partkey >> 12)", "(l_suppkey >> 12)", 4)} AS zcell
         |FROM lineitem WHERE l_orderkey % 50 = 0
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q41_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q42_setops" ->
      """WITH a AS (SELECT c_custkey FROM customer WHERE c_nationkey < 10),
        |b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 0),
        |ops AS (
        |  SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |  UNION ALL
        |  SELECT 'except' AS op, c_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
        |SELECT op, CAST(COUNT(*) AS BIGINT) AS n,
        |       MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
        |FROM ops GROUP BY op ORDER BY op""".stripMargin,

    "q66_approx_quantiles" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
        |       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q43_percentiles" ->
      """SELECT o_orderpriority,
        |       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |       ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q156_session_window" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, value,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
        |                   >= 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked)
        |SELECT user_id,
        |       epoch_us(min(ts)) AS session_start_us,
        |       epoch_us(max(ts)) + 1800000000 AS session_end_us,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       ROUND(sum(value), 4) AS session_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    "q37_sessions" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id, value,
        |         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800
        |              THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, value,
        |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_no
        |  FROM marked),
        |per_session AS (
        |  SELECT user_id, session_no, COUNT(*) AS n_events,
        |         ROUND(SUM(value), 4) AS session_value
        |  FROM sess GROUP BY 1, 2)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |       CAST(MAX(n_events) AS BIGINT) AS max_session_events,
        |       ROUND(SUM(session_value), 4) AS total_value
        |FROM per_session GROUP BY 1 ORDER BY user_id""".stripMargin,

    "q15_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total
        |FROM orders WHERE o_custkey % 100 = 1
        |ORDER BY o_custkey, o_orderkey""".stripMargin
  )
}
