package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.sources.Tables

/** Graph / sequence analytics over the events table: behavioral Markov
  * transitions and link-graph PageRank. The graph is derived
  * deterministically from events (nodes = id residues), so both engines
  * build the identical edge list from the same parquet.
  */
object GraphPack extends QueryPack {

  /** Node count basis for the synthetic link graph (id residues mod N). */
  val Nodes = 40
  val Iters = 5
  val DampingPct = 85
  /** Seed set for the personalized variant (q121). */
  val PprSeeds = Seq(0L, 1L, 2L)
  /** HITS iteration count (q123). */
  val HitsIters = 3

  /** Label-propagation iteration count (q135). */
  val LpaIters = 4

  /** BFS seed set + hop budget (q159). */
  val BfsSeeds = Seq(0L, 1L, 2L)
  val BfsHops = 6

  private def edges(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "events")
      .select((col("user_id") % Nodes).as("src"), (col("event_id") % Nodes).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // First-order Markov transition matrix of user behavior: for each
    // (prev, cur) event-type pair, the count and the conditional
    // probability P(cur | prev). The lag window partitions by user —
    // thousands of small partitions, no single-partition window. The
    // probability is a ratio of two counts (long/long), so it is exact
    // in both engines.
    "q103_event_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val seq = Tables.table(s, dir, "events")
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
      val cnt = seq.groupBy(col("prev"), col("event_type").as("cur"))
        .agg(count(lit(1)).as("cnt"))
      val wp = Window.partitionBy("prev")
      cnt.withColumn("prob",
          round(col("cnt").cast("double") / sum(col("cnt")).over(wp), 6))
        .orderBy("prev", "cur")
    }),

    // Ordered funnel: view → click-after-view → purchase-after-click, the
    // sequential-pattern conversion report. Each stage is one grouped min
    // over the stage's events joined to the previous stage's first-hit
    // time — three aggregations and two equi-joins on user_id, no window.
    // All outputs are integer counts and exact count ratios.
    "q119_funnel" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select("user_id", "event_type", "ts")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("tv"))
      val c = ev.filter(col("event_type") === "click").join(v, "user_id")
        .filter(col("ts") > col("tv"))
        .groupBy("user_id").agg(min(col("ts")).as("tc"))
      val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
        .filter(col("ts") > col("tc"))
        .groupBy("user_id").agg(min(col("ts")).as("tp"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
        .select(col("n_view"), col("n_click"), col("n_purchase"),
          round(col("n_click").cast("double") / col("n_view"), 6)
            .as("view_to_click"),
          round(col("n_purchase").cast("double") / col("n_click"), 6)
            .as("click_to_purchase"))
    }),

    // Retention cohorts: users grouped by first-activity date, activity
    // counted per (cohort, day offset). Two aggregations (first-touch per
    // user, distinct active days) + one equi-join on user_id; the matrix
    // is O(days²) rows regardless of event volume. Retention is an exact
    // ratio against the day-0 cohort size.
    "q120_cohorts" -> ((s, dir) => {
      // Tables.events, not .table: the raw parquet ts is TIMESTAMP(NANOS)
      // read as long; date bucketing needs the real timestamp conversion
      val ev = Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"))
      val first = ev.groupBy("user_id").agg(min(col("d")).as("cohort"))
      val active = ev.distinct()
      val cells = active.join(first, "user_id")
        .groupBy(col("cohort"), datediff(col("d"), col("cohort")).as("day_offset"))
        .agg(count(lit(1)).as("n_active"))
      val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
      cells.join(sizes, "cohort")
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          col("day_offset"), col("n_active"), col("cohort_size"),
          round(col("n_active").cast("double") / col("cohort_size"), 6)
            .as("retention"))
        .orderBy("cohort", "day_offset")
    }),

    // Damped PageRank over the deduplicated (user→event) residue graph,
    // 5 fixed iterations in BIGINT fixed-point (see [[Graph.pageRank]] for
    // why integer arithmetic is the only summation that reproduces across
    // engines AND shuffle partitionings). Per-iteration cost: two
    // equi-join shuffles + one aggregation — the canonical Pregel step
    // expressed relationally.
    "q106_pagerank" -> ((s, dir) => {
      Graph.pageRank(edges(s, dir), "src", "dst", Iters, DampingPct)
        .select(col("v").as("node"), col("rank_fp"), col("rank"))
        .orderBy("node")
    }),

    // Graph-structure audit: node/edge counts, degree extremes, dangling
    // and source-only nodes, and edge reciprocity (the share of edges
    // whose reverse also exists — a crawl-graph health signal). Degrees
    // via two aggregations + a full outer join on the node id; the
    // reciprocity check is a self-equi-join on (dst, src). All-integer
    // outputs plus one exact ratio.
    // Community detection by synchronous label propagation: 4 fixed
    // iterations, min-label tie-break — deterministic, so the oracle
    // replays the identical label fixed point via unrolled CTEs. The
    // graph is 4 dense 10-node blocks plus exactly one bridge per block
    // boundary (nodes 0-10, 10-20, 20-30, 30-0): connected components
    // would merge everything into one blob; LPA's majority vote keeps
    // the 4 dense communities — exactly why a curation pipeline uses it
    // over components for domain-cluster / link-farm detection. The
    // bridge set is a fixed TOPOLOGY (one edge per block boundary, not a
    // data-thinned sample), so the census depends only on which user/
    // event residues exist at the scale factor — tiny SFs simply
    // materialize fewer blocks. Output is the community census (label,
    // size, member id range).
    "q135_label_prop" -> ((s, dir) => {
      val ev = Tables.table(s, dir, "events")
        .select(col("user_id"), col("event_id"))
      val base = ev.select(expr("user_id % 40").as("src"),
        expr("((user_id % 40) DIV 10) * 10 + event_id % 10").as("dst"))
      val bridges = ev.filter(expr("(user_id % 40) % 10 = 0"))
        .select(expr("user_id % 40").as("src"),
          expr("(user_id % 40 + 10) % 40").as("dst"))
      val g = base.unionAll(bridges).filter(col("src") =!= col("dst"))
      Graph.labelPropagation(g, "src", "dst", LpaIters)
        .groupBy(col("lab").as("community"))
        .agg(count(lit(1)).as("sz"), min("v").as("min_v"),
          max("v").as("max_v"))
        .orderBy("community")
    }),

    "q122_degree_audit" -> ((s, dir) => {
      val e = edges(s, dir).localCheckpoint() // five consumers below
      val outD = e.groupBy(col("src").as("v")).agg(count(lit(1)).as("out_deg"))
      val inD = e.groupBy(col("dst").as("v")).agg(count(lit(1)).as("in_deg"))
      val deg = outD.join(inD, Seq("v"), "full_outer")
        .select(col("v"), coalesce(col("out_deg"), lit(0L)).as("o"),
          coalesce(col("in_deg"), lit(0L)).as("i"))
      val recip = e.join(
        e.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"))
      deg.agg(count(lit(1)).as("n_nodes"),
          sum(col("o")).as("n_edges"),
          sum(when(col("o") === 0, 1L).otherwise(0L)).as("n_dangling"),
          sum(when(col("i") === 0, 1L).otherwise(0L)).as("n_source_only"),
          max(col("o")).as("max_out"), max(col("i")).as("max_in"))
        .crossJoin(broadcast(recip.agg(count(lit(1)).as("n_recip"))))
        .select(col("n_nodes"), col("n_edges"), col("n_dangling"),
          col("n_source_only"), col("max_out"), col("max_in"), col("n_recip"),
          round(col("n_recip").cast("double") / col("n_edges"), 6)
            .as("reciprocity"))
    }),

    // Triangle count + global clustering coefficient over the
    // UNDIRECTED residue graph. Triangles via the ordered-wedge join
    // (a<b<c, two equi-joins — cost Σ deg², the standard distributed
    // shape); wedges in closed form from undirected degrees. Integer
    // counts and one exact ratio.
    "q124_triangles" -> ((s, dir) => {
      val und = edges(s, dir)
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct().localCheckpoint() // three consumers below
      val wedge = und.as("e1").join(und.as("e2"), col("e1.b") === col("e2.a"))
        .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
      val tri = wedge.join(und.select(col("a"), col("b").as("c")), Seq("a", "c"))
        .agg(count(lit(1)).as("n_triangles"))
      val deg = und.select(col("a").as("v"))
        .unionAll(und.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val wedges = deg.agg(sum(col("d") * (col("d") - 1) / 2)
        .cast("long").as("n_wedges"))
      und.agg(count(lit(1)).as("n_und_edges"))
        .crossJoin(broadcast(tri))
        .crossJoin(broadcast(wedges))
        .select(col("n_und_edges"), col("n_triangles"), col("n_wedges"),
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)
            .as("clustering"))
    }),

    // HITS hubs & authorities: 3 fixed iterations, max-normalized each
    // half-step in BIGINT fixed point (Graph.hits) — the second classic
    // iterative ranking, sharing PageRank's determinism argument.
    "q123_hits" -> ((s, dir) => {
      Graph.hits(edges(s, dir), "src", "dst", HitsIters)
        .select(col("v").as("node"), col("hub_fp"), col("auth_fp"),
          col("hub"), col("auth"))
        .orderBy("node")
    }),

    // Personalized PageRank: teleport restricted to a 3-node seed set —
    // ranks become proximity-to-seeds, the "related items" query. Same
    // fixed-point recurrence; the seed predicate is an O(|query|) literal
    // IN list evaluated in the scan stage.
    "q121_personalized_pagerank" -> ((s, dir) => {
      Graph.personalizedPageRank(edges(s, dir), "src", "dst",
          PprSeeds, Iters, DampingPct)
        .select(col("v").as("node"), col("rank_fp"), col("rank"))
        .orderBy("node")
    }),

    // Multi-source BFS hop distances: minimum edges from the seed set to
    // every node, Bellman-Ford relaxation for BfsHops rounds (one
    // equi-join + one min-agg shuffle per round — the Pregel step
    // relationally; integer min is order-free, so the fixed point
    // reproduces across engines and partitionings). Unreached nodes
    // carry the 99 sentinel. The classic crawl-frontier / link-distance
    // audit: "how many hops from the seed domains is each host?"
    "q159_bfs_reach" -> ((s, dir) => {
      Graph.bfs(edges(s, dir), "src", "dst", BfsSeeds, BfsHops)
        .select(col("v").as("node"), col("d").as("dist"))
        .orderBy("node")
    })
  )

  def oracles: Map[String, String] = Map(

    "q103_event_transitions" ->
      """WITH seq AS (
        |  SELECT event_type AS cur,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |cnt AS (
        |  SELECT prev, cur, count(*) AS cnt FROM seq
        |  WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT prev, cur, cnt,
        |       round(CAST(cnt AS DOUBLE) /
        |             sum(cnt) OVER (PARTITION BY prev), 6) AS prob
        |FROM cnt ORDER BY prev, cur""".stripMargin,

    "q119_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS tv FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS tc
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.tv GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS tp
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.tc GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click,
        |       (SELECT count(*) FROM p) AS n_purchase,
        |       round(CAST((SELECT count(*) FROM c) AS DOUBLE)
        |           / (SELECT count(*) FROM v), 6) AS view_to_click,
        |       round(CAST((SELECT count(*) FROM p) AS DOUBLE)
        |           / (SELECT count(*) FROM c), 6) AS click_to_purchase""".stripMargin,

    "q120_cohorts" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort FROM ev GROUP BY 1),
        |cells AS (
        |  SELECT f.cohort, CAST(ev.d - f.cohort AS INT) AS day_offset,
        |         count(*) AS n_active
        |  FROM ev JOIN f ON f.user_id = ev.user_id GROUP BY 1, 2),
        |sizes AS (SELECT cohort, count(*) AS cohort_size FROM f GROUP BY 1)
        |SELECT CAST(c.cohort AS VARCHAR) AS cohort, c.day_offset,
        |       c.n_active, s.cohort_size,
        |       round(CAST(c.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
        |FROM cells c JOIN sizes s ON s.cohort = c.cohort
        |ORDER BY cohort, day_offset""".stripMargin,

    "q135_label_prop" -> {
      val iterCtes = (1 to LpaIters).map { k =>
        s"""c$k AS (SELECT e.src AS v, l${k - 1}.lab, count(*) AS c
           |       FROM e JOIN l${k - 1} ON l${k - 1}.v = e.dst GROUP BY 1, 2),
           |b$k AS (SELECT v, lab FROM (
           |         SELECT v, lab,
           |                row_number() OVER (PARTITION BY v
           |                  ORDER BY c DESC, lab) AS rn
           |         FROM c$k) WHERE rn = 1),
           |l$k AS (SELECT nodes.v, coalesce(b$k.lab, nodes.v) AS lab
           |       FROM nodes LEFT JOIN b$k ON b$k.v = nodes.v)""".stripMargin
      }.mkString(",\n")
      s"""WITH d AS (
         |  SELECT user_id % 40 AS src,
         |         ((user_id % 40) // 10) * 10 + event_id % 10 AS dst
         |  FROM events
         |  UNION ALL
         |  SELECT user_id % 40 AS src, (user_id % 40 + 10) % 40 AS dst
         |  FROM events WHERE (user_id % 40) % 10 = 0),
         |e AS (SELECT DISTINCT src, dst FROM
         |       (SELECT src, dst FROM d WHERE src <> dst
         |        UNION ALL SELECT dst, src FROM d WHERE src <> dst)),
         |nodes AS (SELECT DISTINCT src AS v FROM e),
         |l0 AS (SELECT v, v AS lab FROM nodes),
         |$iterCtes
         |SELECT lab AS community, count(*) AS sz,
         |       min(v) AS min_v, max(v) AS max_v
         |FROM l$LpaIters GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q122_degree_audit" ->
      s"""WITH e AS (
         |  SELECT DISTINCT user_id % $Nodes AS src, event_id % $Nodes AS dst
         |  FROM events WHERE user_id % $Nodes <> event_id % $Nodes),
         |o AS (SELECT src AS v, count(*) AS o FROM e GROUP BY 1),
         |i AS (SELECT dst AS v, count(*) AS i FROM e GROUP BY 1),
         |deg AS (
         |  SELECT coalesce(o.v, i.v) AS v,
         |         coalesce(o.o, 0) AS o, coalesce(i.i, 0) AS i
         |  FROM o FULL OUTER JOIN i ON o.v = i.v),
         |r AS (SELECT count(*) AS n_recip
         |      FROM e a JOIN e b ON b.src = a.dst AND b.dst = a.src)
         |SELECT count(*) AS n_nodes,
         |       CAST(sum(o) AS BIGINT) AS n_edges,
         |       CAST(sum(CASE WHEN o = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_dangling,
         |       CAST(sum(CASE WHEN i = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_source_only,
         |       CAST(max(o) AS BIGINT) AS max_out,
         |       CAST(max(i) AS BIGINT) AS max_in,
         |       (SELECT n_recip FROM r) AS n_recip,
         |       round(CAST((SELECT n_recip FROM r) AS DOUBLE)
         |           / CAST(sum(o) AS BIGINT), 6) AS reciprocity
         |FROM deg""".stripMargin,

    "q124_triangles" ->
      s"""WITH e AS (
         |  SELECT DISTINCT user_id % $Nodes AS src, event_id % $Nodes AS dst
         |  FROM events WHERE user_id % $Nodes <> event_id % $Nodes),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM e),
         |tri AS (SELECT count(*) AS n_triangles
         |        FROM und e1
         |        JOIN und e2 ON e2.a = e1.b
         |        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
         |deg AS (SELECT v, count(*) AS d
         |        FROM (SELECT a AS v FROM und UNION ALL SELECT b FROM und)
         |        GROUP BY 1),
         |w AS (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg)
         |SELECT (SELECT count(*) FROM und) AS n_und_edges,
         |       tri.n_triangles, w.n_wedges,
         |       round(3.0 * tri.n_triangles / w.n_wedges, 6) AS clustering
         |FROM tri CROSS JOIN w""".stripMargin,

    "q123_hits" -> {
      val u = Graph.HitsUnit
      // two CTE pairs per iteration, mirroring Graph.hits' half-steps
      val iterCtes = (1 to HitsIters).map { k =>
        s"""ar$k AS (SELECT e.dst AS v, CAST(sum(h${k - 1}.h) AS BIGINT) AS raw
           |          FROM e JOIN h${k - 1} ON h${k - 1}.v = e.src GROUP BY 1),
           |a$k AS (SELECT nodes.v,
           |          (coalesce(ar$k.raw, 0) * $u) // (SELECT max(raw) FROM ar$k) AS a
           |        FROM nodes LEFT JOIN ar$k ON ar$k.v = nodes.v),
           |hr$k AS (SELECT e.src AS v, CAST(sum(a$k.a) AS BIGINT) AS raw
           |          FROM e JOIN a$k ON a$k.v = e.dst GROUP BY 1),
           |h$k AS (SELECT nodes.v,
           |          (coalesce(hr$k.raw, 0) * $u) // (SELECT max(raw) FROM hr$k) AS h
           |        FROM nodes LEFT JOIN hr$k ON hr$k.v = nodes.v)"""
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT user_id % $Nodes AS src, event_id % $Nodes AS dst
         |  FROM events WHERE user_id % $Nodes <> event_id % $Nodes),
         |nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
         |h0 AS (SELECT v, CAST($u AS BIGINT) AS h FROM nodes),
         |$iterCtes
         |SELECT nodes.v AS node,
         |       h$HitsIters.h AS hub_fp, a$HitsIters.a AS auth_fp,
         |       round(CAST(h$HitsIters.h AS DOUBLE) / $u.0, 6) AS hub,
         |       round(CAST(a$HitsIters.a AS DOUBLE) / $u.0, 6) AS auth
         |FROM nodes
         |JOIN h$HitsIters ON h$HitsIters.v = nodes.v
         |JOIN a$HitsIters ON a$HitsIters.v = nodes.v
         |ORDER BY node""".stripMargin
    },

    "q121_personalized_pagerank" -> {
      val unit = Graph.Unit
      // the SAME Scala integer divisions the operator performs, so the
      // literals cannot drift from Graph.personalizedPageRank's arithmetic
      val seedBase = (100L - DampingPct) * unit / (100L * PprSeeds.size)
      val seedInit = unit / PprSeeds.size
      val inList = PprSeeds.mkString(", ")
      val iterCtes = (1 to Iters).map { k =>
        s"""r$k AS (
           |  SELECT nodes.v,
           |         CASE WHEN nodes.v IN ($inList) THEN $seedBase ELSE 0 END +
           |         ($DampingPct * coalesce(s.inb, 0)) // 100 AS r
           |  FROM nodes
           |  LEFT JOIN (
           |    SELECT e.dst AS v, CAST(sum(r${k - 1}.r // deg.deg) AS BIGINT) AS inb
           |    FROM e
           |    JOIN r${k - 1} ON r${k - 1}.v = e.src
           |    JOIN deg ON deg.src = e.src
           |    GROUP BY 1) s ON s.v = nodes.v)"""
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT user_id % $Nodes AS src, event_id % $Nodes AS dst
         |  FROM events WHERE user_id % $Nodes <> event_id % $Nodes),
         |nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |r0 AS (SELECT v, CASE WHEN v IN ($inList) THEN $seedInit ELSE 0 END AS r
         |       FROM nodes),
         |$iterCtes
         |SELECT v AS node, r AS rank_fp,
         |       round(CAST(r AS DOUBLE) / $unit.0, 6) AS rank
         |FROM r$Iters ORDER BY node""".stripMargin
    },

    "q106_pagerank" -> {
      val unit = Graph.Unit
      val teleport = (100L - DampingPct) * unit
      // one CTE per iteration: rK derives from rK-1 with the same
      // fixed-point recurrence the Spark operator runs
      val iterCtes = (1 to Iters).map { k =>
        s"""r$k AS (
           |  SELECT nodes.v,
           |         $teleport // (100 * nn.n) +
           |         ($DampingPct * coalesce(s.inb, 0)) // 100 AS r
           |  FROM nodes CROSS JOIN nn
           |  LEFT JOIN (
           |    -- DuckDB sum(BIGINT) widens to HUGEINT, which pandas reads
           |    -- as float64 — cast back so the compare sees integers
           |    SELECT e.dst AS v, CAST(sum(r${k - 1}.r // deg.deg) AS BIGINT) AS inb
           |    FROM e
           |    JOIN r${k - 1} ON r${k - 1}.v = e.src
           |    JOIN deg ON deg.src = e.src
           |    GROUP BY 1) s ON s.v = nodes.v)"""
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT user_id % $Nodes AS src, event_id % $Nodes AS dst
         |  FROM events WHERE user_id % $Nodes <> event_id % $Nodes),
         |nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |r0 AS (SELECT v, $unit // nn.n AS r FROM nodes CROSS JOIN nn),
         |$iterCtes
         |SELECT v AS node, r AS rank_fp,
         |       round(CAST(r AS DOUBLE) / $unit.0, 6) AS rank
         |FROM r$Iters ORDER BY node""".stripMargin
    },

    "q159_bfs_reach" -> {
      // one CTE per relaxation round: dK = min(dK-1, dK-1 over an edge +1),
      // the identical recurrence the Spark loop runs
      val seedList = BfsSeeds.mkString(", ")
      val iterCtes = (1 to BfsHops).map { k =>
        s"""d$k AS (
           |  SELECT v, min(d) AS d FROM (
           |    SELECT v, d FROM d${k - 1}
           |    UNION ALL
           |    SELECT e.dst AS v, least(d${k - 1}.d + 1, 99) AS d
           |    FROM e JOIN d${k - 1} ON d${k - 1}.v = e.src)
           |  GROUP BY v)"""
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT user_id % $Nodes AS src, event_id % $Nodes AS dst
         |  FROM events WHERE user_id % $Nodes <> event_id % $Nodes),
         |nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
         |d0 AS (SELECT v, CASE WHEN v IN ($seedList) THEN 0 ELSE 99 END AS d
         |       FROM nodes),
         |$iterCtes
         |SELECT v AS node, CAST(d AS INTEGER) AS dist
         |FROM d$BfsHops ORDER BY node""".stripMargin
    }
  )
}
