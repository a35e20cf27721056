package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Correctness + plan shape of the binned range join. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(86400000L + m * 60000L)

  test("binned range join equals the naive range join, once per match") {
    val points = (0 until 500).map(i => (ts(i * 7 % 600), i)).toDF("t", "pid")
    val intervals = Seq(
      (1L, ts(0), ts(90)),     // spans 2 hour-bins
      (2L, ts(60), ts(61)),    // 1-minute interval inside one bin
      (3L, ts(120), ts(480)),  // 6 hours, many bins
      (4L, ts(60), ts(120))    // bin-aligned end (exclusive)
    ).toDF("iid", "s", "e")
    val binned = RangeJoin.binnedRangeJoin(points, intervals, "t", "s", "e")
      .select("pid", "iid").as[(Int, Long)].collect().sorted.toSeq
    val naive = points.join(intervals, col("t") >= col("s") && col("t") < col("e"))
      .select("pid", "iid").as[(Int, Long)].collect().sorted.toSeq
    assert(binned === naive)
    assert(binned.distinct === binned, "no duplicate matches")
  }

  test("binned range join plans as a hash join, not nested loop") {
    val points = (0 until 100).map(i => (ts(i), i)).toDF("t", "pid")
    val intervals = Seq((1L, ts(0), ts(50))).toDF("iid", "s", "e")
    val plan = RangeJoin.binnedRangeJoin(points, intervals, "t", "s", "e")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join must not nested-loop:\n${plan.take(1500)}")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
  }
}
