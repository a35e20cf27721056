package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ratings, ScaleJoins}

/** Plan-level and value-level checks for the 100 TB join strategies. */
class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join, with the salt column gone") {
    val fact = Ratings.ratings(spark, sf0)
    val dim = Ratings.itemFactors(spark, sf0)
      .select(col("item_id"), element_at(col("itf"), 1).as("f1"))
    val plain = fact.join(dim, "item_id")
      .select(col("item_id"), col("user_id"), col("rating"), col("f1"))
    val salted = ScaleJoins.saltedJoin(fact, dim, "item_id", salt = 8)
      .select(col("item_id"), col("user_id"), col("rating"), col("f1"))
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join spreads a hot key across salt sub-keys") {
    val hot = Seq.fill(1000)((1L, "x")).toDF("k", "payload")
    val dim = Seq((1L, 9.9)).toDF("k", "w")
    val joined = ScaleJoins.saltedJoin(hot, dim, "k", salt = 4)
    assert(joined.count() === 1000)
    // the salt assignment itself must hit >1 bucket for skew to spread;
    // hash(content) over identical rows is constant, so vary the payload
    val varied = (1 to 1000).map(i => (1L, s"p$i")).toDF("k", "payload")
    val salts = varied.withColumn("_salt",
      pmod(hash(struct(col("k"), col("payload"))), lit(4)))
      .select("_salt").distinct().count()
    assert(salts > 1)
  }

  test("co-bucketed tables join without a shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      ScaleJoins.colocatedWrite(
        Ratings.ratings(spark, sf0), "fact_bkt", "item_id", buckets = 4)
      ScaleJoins.colocatedWrite(
        Ratings.itemFactors(spark, sf0), "dim_bkt", "item_id", buckets = 4)
      val joined = spark.table("fact_bkt").join(spark.table("dim_bkt"), "item_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === Ratings.ratings(spark, sf0)
        .join(Ratings.itemFactors(spark, sf0), "item_id").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS fact_bkt")
      spark.sql("DROP TABLE IF EXISTS dim_bkt")
    }
  }

  test("runtime bloom filter is injected into the probe side of a selective join") {
    import graft.sources.Tables
    val keys = Seq("spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      ScaleJoins.enableRuntimeBloomFilter(spark)
      // force a shuffle join: broadcast would hide the probe-side benefit
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = Tables.table(spark, sf1, "lineitem").select("l_partkey", "l_quantity")
      val dim = Tables.table(spark, sf1, "part")
        .filter(col("p_partkey") % 97 === 0)
        .select("p_partkey", "p_name")
      val joined = fact.join(dim, fact("l_partkey") === dim("p_partkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter") || plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      // value parity: the filter is a pure pruning optimization
      val expected = Tables.table(spark, sf1, "lineitem")
        .join(Tables.table(spark, sf1, "part").filter(col("p_partkey") % 97 === 0),
          col("l_partkey") === col("p_partkey")).count()
      assert(joined.count() === expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q98 star join: every dimension join is a broadcast, never a shuffle") {
    val plan = SparkEntry.queries("q98_star_join")(spark, sf1)
      .queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 3,
      s"supplier/nation/region must ride broadcasts, found $broadcasts:\n${plan.take(1500)}")
  }

  test("skew profile surfaces the heaviest keys with shares") {
    val df = (Seq.fill(70)(1L) ++ Seq.fill(20)(2L) ++ Seq.fill(10)(3L))
      .toDF("k")
    val prof = ScaleJoins.skewProfile(df, col("k"), topN = 2)
      .as[(Long, Long, Double)].collect()
    assert(prof.head === ((1L, 70L, 0.7)))
    assert(prof(1) === ((2L, 20L, 0.2)))
  }
}
