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
    }
  )
}
