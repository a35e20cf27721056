package graft

import org.apache.spark.sql.functions._

import graft.operators.{ScaleJoins, Selection}

/** Unit semantics of the skew-safe two-stage aggregation and the exact-k
  * stratified sample; cross-engine exactness via q133/q134 oracles. */
class SaltedAggSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals the plain one-stage groupBy exactly") {
    val df = Seq.tabulate(1000)(i =>
      (if (i % 10 == 0) "cold" else "hot", i.toLong, (i * 3).toLong))
      .toDF("k", "a", "b")
    val salted = ScaleJoins.saltedAgg(df, "k",
        Map("sa" -> col("a"), "sb" -> col("b")), buckets = 8)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("a").as("sa"), sum("b").as("sb"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(salted === plain)
  }

  test("saltedAgg: fully-identical hot-key rows still aggregate exactly") {
    // content-only salting would map all of these to ONE bucket; either
    // way the sums must be exact (each row counted once)
    val df = Seq.fill(5000)(("hot", 7L)).toDF("k", "v")
    val out = ScaleJoins.saltedAgg(df, "k", Map("sv" -> col("v")), buckets = 8)
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("hot", 5000L, 35000L)))
  }

  test("saltedAgg rejects a sums key that collides with the count column") {
    val df = Seq(("x", 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      ScaleJoins.saltedAgg(df, "k", Map("n" -> col("v")), buckets = 2)
    }
  }

  test("saltedAgg plan has the two-stage shape: salt key in the partial stage") {
    val df = Seq(("x", 1L)).toDF("k", "v")
    val plan = ScaleJoins.saltedAgg(df, "k", Map("sv" -> col("v")), buckets = 4)
      .queryExecution.optimizedPlan.toString
    // two nested Aggregates: inner one groups on the synthetic salt
    assert(plan.contains("__graft_agg_salt"))
    assert("(?s)Aggregate.*Aggregate".r.findFirstIn(plan).isDefined)
  }

  test("exactKSample: exactly min(k, |stratum|) per stratum, deterministic") {
    val df = (1L to 100L).map(i => (i, if (i <= 90) "big" else "small"))
      .toDF("id", "s")
    val out = Selection.exactKSample(df, "id", "s", k = 10)
    val sizes = out.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(sizes === Map("big" -> 10L, "small" -> 10L))

    val small = Selection.exactKSample(df.filter(col("s") === "small"),
      "id", "s", k = 50)
    assert(small.count() === 10L) // stratum smaller than k: all rows kept

    val a = out.select("id").as[Long].collect().sorted.toSeq
    val b = Selection.exactKSample(df, "id", "s", k = 10)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("exactKSample: ranks are 1..k within each stratum") {
    val df = (1L to 30L).map(i => (i, (i % 3).toString)).toDF("id", "s")
    val out = Selection.exactKSample(df, "id", "s", k = 5)
      .groupBy("s").agg(min("rank").as("lo"), max("rank").as("hi"),
        count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect()
    out.foreach { case (_, lo, hi, n) =>
      assert(lo === 1L); assert(hi === 5L); assert(n === 5L)
    }
  }
}
