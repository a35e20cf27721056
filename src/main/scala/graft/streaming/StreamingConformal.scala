package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming face of the q227 Mondrian conformal gate
  * ([[graft.operators.Governance.conformalThreshold]]): the batch job
  * calibrates a per-group threshold q̂ offline; this monitor watches the
  * LIVE feed and maintains, per group, how many fresh rows the
  * guarantee actually covered. A drifting upstream shows up as
  * empirical coverage sinking below the promised 1 − α — the
  * distribution-free drift alarm a curation pipeline wires to paging.
  *
  * Thresholds arrive as a static (grp, qv) table — a stream-static
  * inner join, so only calibrated groups are monitored (matching the
  * batch operator's output domain) and a NULL qv keeps the batch
  * convention q̂ = +∞: every row covered, coverage trivially 1. State
  * is two longs per GROUP (n_test, n_covered), mergeable integer adds —
  * any micro-batch split folds to the identical frontier the batch
  * aggregation computes (StreamingConformalSpec pins the parity
  * against the q227 contract values).
  */
object StreamingConformal {

  case class ScoredRow(grp: String, id: Long, v: Long, qv: Option[Long])
  case class Coverage(grp: String, n_test: Long, n_covered: Long)

  /** scores: STREAMING (grp, id, v e6-score long);
    * thresholds: static (grp, qv nullable long) — q̂ in e6 units. */
  def coverage(spark: SparkSession, scores: DataFrame,
               thresholds: DataFrame): Dataset[Coverage] = {
    import spark.implicits._
    scores.join(broadcast(thresholds), Seq("grp"))
      .select(col("grp"), col("id"), col("v"), col("qv"))
      .as[ScoredRow]
      .groupByKey(_.grp)
      .mapGroupsWithState[Coverage, Coverage](GroupStateTimeout.NoTimeout) {
        case (grp, rows, state: GroupState[Coverage]) =>
          val prev = state.getOption.getOrElse(Coverage(grp, 0L, 0L))
          var n = prev.n_test; var cov = prev.n_covered
          rows.foreach { r =>
            n += 1
            if (r.qv.forall(r.v <= _)) cov += 1
          }
          val next = Coverage(grp, n, cov)
          state.update(next)
          next
      }
  }
}
