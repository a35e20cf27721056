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

  test("q129 histogram binning equals the rank-order ntile it replaces") {
    // the contract plan bins from the length histogram (no total sort);
    // this audit pins it row-for-row against the direct ntile definition
    // at small sf — the semantics the oracle SQL still states
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.table(spark, sf0, "documents")
    val exact = docs
      .select(col("doc_id"), col("n_chars"))
      .withColumn("bin",
        ntile(10).over(Window.orderBy(col("n_chars"), col("doc_id")))
          .cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"),
        sum("n_chars").as("chars"))
      .orderBy("bin")
      .collect().toSeq
    val contract = SparkEntry.queries("q129_quantile_bins")(spark, sf0)
      .collect().toSeq
    assert(contract === exact)
  }

  test("no unpartitioned window reads a full-size input (fleet guardrail)") {
    // A Window with an empty partition spec is a single-reducer total
    // sort — the one plan shape that cannot survive a 100x scale-up when
    // its input is corpus-sized. Legitimate uses in this engine all run
    // over REDUCED tables (histograms, vocabularies, per-group top-k
    // frames): mechanically, an Aggregate or Limit must appear somewhere
    // BELOW the window in the physical plan, proving the window's input
    // cardinality is group-count/limit-bounded, not row-count-bounded.
    import org.apache.spark.sql.execution.SparkPlan
    def reduced(p: SparkPlan): Boolean = {
      val isReducing =
        p.isInstanceOf[org.apache.spark.sql.execution.aggregate.BaseAggregateExec] ||
          p.nodeName.contains("Limit") ||
          p.nodeName.contains("TakeOrdered") ||
          p.nodeName.contains("WindowGroupLimit")
      isReducing || p.children.exists(reduced)
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf0).queryExecution.sparkPlan
        plan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty && !w.children.exists(reduced) =>
            s"$name: ${w.nodeName}"
        }
    }
    assert(offenders.isEmpty,
      s"unpartitioned window over full-size input in: $offenders")
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
