package graft

class SparkEntrySpec extends SparkSpec {

  test("entry returns >0 rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has columns aligned with its oracle presence") {
    // each oracleSql key must exist in queries
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle without query: $k")
    }
  }

  test("all queries run non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("no query plans a cartesian product (fleet-wide scale guardrail)") {
    // CartesianProductExec means BOTH join sides were too large to
    // broadcast and there were no equi-keys — the one physical join that
    // cannot survive a 100x scale-up. Scalar cross joins (1-row count
    // frames, e.g. q45's in-plan N) become BroadcastNestedLoopJoin and are
    // fine; the documented all-pairs baselines (q35) broadcast their query
    // side. Nothing in the engine should ever fall back to cartesian.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf0).queryExecution.sparkPlan
        val hasCart = plan.collect {
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        }.nonEmpty
        if (hasCart) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian product planned in: $offenders")
  }
}
