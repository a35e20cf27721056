package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames.
  *
  * The interesting design problem is not the recurrence — it is making an
  * ITERATIVE distributed computation (a) reproducible across engines and
  * partitionings and (b) survivable at scale:
  *
  *  - **Fixed-point arithmetic.** Ranks are carried as BIGINT nano-units
  *    (1e9 = rank 1.0) and contributions use integer division. Integer
  *    addition is associative, so the per-node contribution sum is
  *    IDENTICAL no matter how Spark partitions the shuffle or in what
  *    order DuckDB's aggregate sees rows — float summation order, the
  *    classic cross-engine flake in iterative jobs, never enters the
  *    computation. The sub-nano floor loss per edge is bounded by
  *    iters * max_indegree ulps — irrelevant at 1e9 resolution.
  *  - **Lineage truncation.** Each iteration's plan embeds the previous
  *    one; after a few dozen iterations the plan tree (and its codegen)
  *    dominates runtime and a lost executor replays the whole chain. With
  *    `checkpointEvery > 0`, every k-th rank table is localCheckpoint-ed,
  *    cutting the lineage to one iteration. Tests and the oracle-checked
  *    contract query run with checkpointing off so the plan stays pure.
  */
object Graph {

  /** 1.0 of rank in fixed-point units. */
  val Unit: Long = 1000000000L

  /** Damped PageRank, fixed iteration count, dangling mass dropped (the
    * simplified formulation: r'(v) = (1-d)/n + d * Σ_{u→v} r(u)/deg(u)).
    * `edges` must be a deduplicated (src, dst) list; self-loops allowed
    * but conventionally removed by the caller. Damping is expressed as a
    * percent so the damped term stays in integer arithmetic.
    *
    * Returns (v, rank_fp BIGINT, rank DOUBLE): rank = rank_fp / 1e9.
    *
    * Scale shape per iteration: one shuffle join ranks×edges on src, one
    * aggregation shuffle on dst, one left join back to the node set —
    * all equi-joins on the node id. The node set and out-degree table are
    * computed once, outside the loop. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampingPct: Int = 85,
               checkpointEvery: Int = 0,
               materialize: Boolean = true): DataFrame =
    pageRankImpl(edges, srcCol, dstCol, iters, dampingPct,
      checkpointEvery, materialize, seeds = Nil)

  /** Personalized PageRank: the teleport mass lands ONLY on the seed set
    * (uniformly), so ranks measure proximity to the seeds instead of
    * global importance — the "related items" / topic-conditioned variant.
    * Same fixed-point arithmetic and iteration shape as [[pageRank]];
    * non-seed nodes start (and teleport) at zero. */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: Seq[Long], iters: Int,
                           dampingPct: Int = 85,
                           checkpointEvery: Int = 0,
                           materialize: Boolean = true): DataFrame = {
    require(seeds.nonEmpty, "personalized PageRank needs a seed set")
    pageRankImpl(edges, srcCol, dstCol, iters, dampingPct,
      checkpointEvery, materialize, seeds)
  }

  /** Fixed-point unit for HITS scores: smaller than [[Unit]] because the
    * un-normalized sums are rescaled by `* HitsUnit DIV max` each half-step
    * — with 1e9 units a Σ over a large in-degree times the scale factor
    * would overflow BIGINT; at 1e6 the product stays ≤ ~1e13 for degrees
    * up to 1e7. */
  val HitsUnit: Long = 1000000L

  /** HITS hubs & authorities, fixed iterations, max-normalized each
    * half-step in BIGINT fixed point (authority = Σ hub of in-neighbors,
    * hub = Σ authority of out-neighbors; the max-rescale replaces the
    * usual L2 normalization — same fixed point ordering, integer-exact).
    * Same determinism argument as [[pageRank]]: integer sums are
    * associative and max is order-free, so results reproduce across
    * engines and partitionings. Returns (v, hub_fp, auth_fp, hub, auth)
    * with the doubles = fp / HitsUnit. */
  /** Synchronous label propagation — community detection for corpus
    * curation (domain clusters, link farms, boilerplate families). The
    * graph is symmetrized (edges made undirected, deduplicated); every
    * node starts labeled with its own id and each iteration adopts the
    * label most frequent among its neighbors, ties broken by SMALLEST
    * label. Both the tie-break and the synchronous schedule make the
    * result a pure function of (edges, iters) — no randomness, so the
    * q135 oracle replays the identical fixed point (sync LPA can
    * oscillate on bipartite-ish structures; a FIXED iteration count makes
    * even that reproducible).
    *
    * Returns (v, lab). Scale shape per iteration: one join labels×edges
    * on the node id + one (node, label) count + one rank-1 window on the
    * node — all shuffles on node ids, same as pageRank; the symmetrized
    * edge set is checkpointed once outside the loop. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int, materialize: Boolean = true): DataFrame = {
    require(iters >= 1)
    def pin(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint() else df
    val dir = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val und = pin(dir
      .union(dir.select(col("dst").as("src"), col("src").as("dst")))
      .distinct())
    val nodes = pin(und.select(col("src").as("v")).distinct())
    var labels = nodes.select(col("v"), col("v").as("lab"))
    for (_ <- 1 to iters) {
      val counts = und.join(labels, und("dst") === labels("v"))
        .groupBy(und("src"), col("lab")).agg(count(lit(1)).as("c"))
      // winner via ONE min_by aggregation (map-side partials) instead of a
      // rank window: same (most frequent, then smallest) label, no
      // per-node sort of the full (label, count) list
      val best = counts.groupBy(col("src").as("v"))
        .agg(min_by(col("lab"), struct(-col("c"), col("lab"))).as("lab"))
      labels = nodes.join(best, Seq("v"), "left")
        .select(col("v"), coalesce(col("lab"), col("v")).as("lab"))
    }
    labels
  }

  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int, materialize: Boolean = true): DataFrame = {
    require(iters >= 1)
    def pin(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint() else df
    val e = pin(edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val nodes = pin(e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct())
    var hubs = nodes.select(col("v"), lit(HitsUnit).as("h"))
    var auths = nodes.select(col("v"), lit(0L).as("a"))
    for (_ <- 1 to iters) {
      // pin every per-iteration frame EAGERLY: each raw table is consumed
      // TWICE (its max — a broadcast, which materializes on its own
      // thread and with a LAZY pin would recompute the whole upstream
      // chain concurrently with the main job — plus the normalize join)
      // and each score table feeds both the next half-step and the final
      // join. roll() releases the superseded round's blocks as each new
      // frame lands, so a long session pins O(1) tables, not O(iters).
      def step(plan: DataFrame, dead: DataFrame*): DataFrame =
        if (materialize) graft.plans.Checkpoints.roll(plan, dead: _*)
        else plan
      val prevHubs = hubs
      val prevAuths = auths
      // only the normalized score tables are checkpointed (one eager job
      // per half-step); the raw aggregate is recomputed by its two
      // consumers WITHIN that job — one extra pass over the persisted
      // edge table, cheaper than a third checkpoint per half-step
      val aRaw = e.join(hubs, e("src") === hubs("v"))
        .groupBy(col("dst").as("v2")).agg(sum(col("h")).as("raw"))
        .select(col("v2").as("v"), col("raw"))
      val aMax = broadcast(aRaw.agg(max(col("raw")).as("mx")))
      auths = step(nodes.join(aRaw, Seq("v"), "left").crossJoin(aMax)
        .select(col("v"),
          expr(s"(coalesce(raw, CAST(0 AS BIGINT)) * $HitsUnit) DIV mx").as("a")),
        prevAuths)
      val hRaw = e.join(auths, e("dst") === auths("v"))
        .groupBy(col("src").as("v2")).agg(sum(col("a")).as("raw"))
        .select(col("v2").as("v"), col("raw"))
      val hMax = broadcast(hRaw.agg(max(col("raw")).as("mx")))
      hubs = step(nodes.join(hRaw, Seq("v"), "left").crossJoin(hMax)
        .select(col("v"),
          expr(s"(coalesce(raw, CAST(0 AS BIGINT)) * $HitsUnit) DIV mx").as("h")),
        prevHubs)
    }
    // the edge table is dead once the final scores are materialized; the
    // node table still backs the returned join, so it stays
    if (materialize) graft.plans.Checkpoints.release(e)
    nodes.join(hubs, "v").join(auths, "v")
      .select(col("v"), col("h").as("hub_fp"), col("a").as("auth_fp"),
        round(col("h").cast("double") / HitsUnit.toDouble, 6).as("hub"),
        round(col("a").cast("double") / HitsUnit.toDouble, 6).as("auth"))
  }

  private def pageRankImpl(edges: DataFrame, srcCol: String, dstCol: String,
                           iters: Int, dampingPct: Int,
                           checkpointEvery: Int,
                           materialize: Boolean,
                           seeds: Seq[Long]): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    // The loop-invariant tables (edges, node set, out-degrees) are
    // referenced by EVERY iteration; left as plain plans they re-derive
    // from the source scan once per reference — a 5-iteration plan scans
    // the edge source ~15 times (self-join attribute re-aliasing defeats
    // exchange reuse). An EAGER localCheckpoint materializes each table
    // once, up front, so every iteration reads cached edge/degree blocks
    // — the Pregel cache-the-graph shape — and the independent first-use
    // stages (nodes and degrees both derive from the edge table) cannot
    // race to compute the same RDD concurrently, which is what a lazy
    // pin allows. The blocks release with the RDD when the query's
    // references drop.
    def pin(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint() else df
    val e = pin(edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val nodes = pin(e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct())
    val nRow = broadcast(nodes.agg(count(lit(1)).as("n")))
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // the degree join is LOOP-INVARIANT: materialize (src, dst, deg) once
    // instead of re-joining deg inside every iteration — each round then
    // pays exactly one join (ranks) + one aggregation, the Pregel floor
    val eDeg = pin(e.join(deg, "src")
      .select(col("src"), col("dst"), col("deg")))
    // e's last consumer is eDeg's checkpoint job (nodes pinned above, deg
    // folded into eDeg) — release it or the run pins TWO |E|-sized tables
    // for every iteration (r19 ADVICE)
    if (materialize) graft.plans.Checkpoints.release(e)
    // base teleport share (1-d)/n, in fixed point, floor division. The
    // numerator is precomputed in Scala: spelled as `15 * 1000000000` it
    // would be INT32 arithmetic in both engines (silent wrap in Spark's
    // non-ANSI mode, overflow error in DuckDB); the out-of-int-range
    // literal parses as BIGINT everywhere.
    val teleportNum = (100L - dampingPct) * Unit
    // personalized: teleport (and the initial distribution) is uniform
    // over the SEED SET only; the seed predicate is a literal IN list
    // (the seed set is a query parameter, O(|query|), never data-sized)
    val isSeed =
      if (seeds.isEmpty) lit(true) else col("v").isInCollection(seeds)
    val base =
      if (seeds.isEmpty) expr(s"$teleportNum DIV (100 * n)")
      else when(isSeed, lit(teleportNum / (100L * seeds.size))).otherwise(0L)
    val init =
      if (seeds.isEmpty) expr(s"$Unit DIV n")
      else when(isSeed, lit(Unit / seeds.size)).otherwise(0L)
    var ranks = nodes.crossJoin(nRow)
      .select(col("v"), init.as("r"))
    var prevCp: DataFrame = null // last every-k checkpoint, superseded below
    for (i <- 1 to iters) {
      val contrib = eDeg.join(ranks, eDeg("src") === ranks("v"))
        .select(col("dst").as("v"), expr("r DIV deg").as("c"))
      val inbound = contrib.groupBy("v").agg(sum(col("c")).as("in_fp"))
      ranks = nodes.join(inbound, Seq("v"), "left")
        .crossJoin(nRow)
        .select(col("v"),
          (base + expr(s"($dampingPct * coalesce(in_fp, CAST(0 AS BIGINT))) DIV 100")).as("r"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0) {
        // roll: eager checkpoint + release the checkpoint it supersedes —
        // without the release a long session pins one rank table per k
        // rounds for the life of the SparkContext
        ranks = graft.plans.Checkpoints.roll(ranks,
          Option(prevCp).toSeq: _*)
        prevCp = ranks
      }
    }
    ranks.select(col("v"), col("r").as("rank_fp"),
      round(col("r").cast("double") / Unit.toDouble, 6).as("rank"))
  }

  /** Multi-source BFS hop distances on a directed edge list: for every
    * node, the minimum number of edges from any seed (0 for the seeds
    * themselves, `unreachable` for nodes no seed can reach in `maxHops`).
    *
    * Implemented as `maxHops` rounds of Bellman-Ford-style relaxation —
    * dist_k(v) = min(dist_{k-1}(v), min over (u,v) edges of
    * dist_{k-1}(u) + 1) — rather than a frontier queue: the relax step is
    * one equi-join shuffle (dist × edges on src) plus one min-aggregation
    * shuffle per round, the Pregel step expressed relationally, and min
    * over integers is order-free, so the result is identical across
    * engines and shuffle partitionings. A frontier-delta variant would
    * move less data on high-diameter graphs, but the full relaxation is
    * the same O(|E|) per round and keeps every round a pure
    * join-aggregate that AQE can plan. Distances are capped at
    * `unreachable`, so the sentinel is sum-safe (no overflow games).
    * Per-iteration frames are pinned exactly like [[hits]] — each dist
    * table feeds the next round AND the final projection, and unpinned
    * plans re-derive the whole upstream per reference. */
  def bfs(edges: DataFrame, srcCol: String, dstCol: String,
          seeds: Seq[Long], maxHops: Int, unreachable: Int = 99,
          materialize: Boolean = true): DataFrame = {
    require(seeds.nonEmpty, "BFS needs a seed set")
    require(maxHops >= 1 && maxHops < unreachable)
    def pin(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint() else df
    val e = pin(edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val nodes = pin(e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct())
    var dist = nodes.select(col("v"),
      when(col("v").isInCollection(seeds), 0)
        .otherwise(unreachable).as("d"))
    for (_ <- 1 to maxHops) {
      val relaxed = e.join(dist, e("src") === dist("v"))
        .select(col("dst").as("v"),
          least(col("d") + 1, lit(unreachable)).as("d"))
      val next = dist.select(col("v"), col("d")).union(relaxed)
        .groupBy("v").agg(min(col("d")).as("d"))
      // roll: eager checkpoint + release of hop k-1's blocks (pinned
      // lazily, they would otherwise accumulate one table per hop)
      dist = if (materialize) graft.plans.Checkpoints.roll(next, dist)
             else next
    }
    // only the final hop's table backs the returned frame; the edge and
    // node invariants are dead once it is materialized
    if (materialize) { graft.plans.Checkpoints.release(e)
                       graft.plans.Checkpoints.release(nodes) }
    dist.select(col("v"), col("d").cast("int").as("d"))
  }
}
