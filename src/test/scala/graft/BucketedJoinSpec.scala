package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sources.Tables

/** Proves the bucketed-layout contract (Layout.writeBucketed): two tables
  * co-bucketed on the join key sort-merge-join with ZERO shuffle exchange,
  * and the exchange-free plan returns exactly the shuffled join's rows.
  * This is the shuffle-once-at-write-time investment a daily 100 TB
  * fact⋈dim pipeline amortizes; here it's pinned mechanically on the
  * physical plan. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  // exchanges are inserted by EnsureRequirements during executedPlan
  // preparation (sparkPlan predates them), and AQE wraps executedPlan in
  // an opaque AdaptiveSparkPlanExec — so the check runs with AQE off
  private def shuffles(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }.size

  test("co-bucketed tables join with zero exchange, same rows as shuffled") {
    val orders = Tables.table(spark, sf1, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.table(spark, sf1, "customer")
      .select("c_custkey", "c_mktsegment")
    val broadcastThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force sort-merge: a broadcast join has no exchange trivially and
      // would prove nothing about the bucketed layout
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Layout.writeBucketed(orders, "b_orders", "o_custkey", buckets = 8)
      Layout.writeBucketed(cust.withColumnRenamed("c_custkey", "o_custkey"),
        "b_cust", "o_custkey", buckets = 8)

      // join AND aggregation on the BUCKET KEY both ride the layout:
      // zero exchanges anywhere in the plan
      val bucketed = spark.table("b_orders")
        .join(spark.table("b_cust"), "o_custkey")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("v"),
          max("c_mktsegment").as("seg"))
      assert(shuffles(bucketed) === 0,
        s"expected exchange-free plan:\n${bucketed.queryExecution.executedPlan}")

      val plain = orders
        .join(cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("v"),
          max("c_mktsegment").as("seg"))
      assert(shuffles(plain) > 0, "control: the unbucketed plan shuffles")

      val a = bucketed.orderBy("o_custkey").collect().toSeq
      val b = plain.orderBy("o_custkey").collect().toSeq
      assert(a === b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastThr)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    val broadcastThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Layout.writeBucketed(Seq((1L, "a"), (2L, "b")).toDF("k", "x"),
        "b_m8", "k", buckets = 8)
      Layout.writeBucketed(Seq((1L, 10.0), (3L, 30.0)).toDF("k", "y"),
        "b_m4", "k", buckets = 4)
      val j = spark.table("b_m8").join(spark.table("b_m4"), "k")
      // one side re-shuffles (or re-buckets); the result must stay right
      assert(j.collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2))).toSeq === Seq((1L, "a", 10.0)))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastThr)
      spark.sql("DROP TABLE IF EXISTS b_m8")
      spark.sql("DROP TABLE IF EXISTS b_m4")
    }
  }
}
