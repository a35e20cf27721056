package graft

import org.apache.spark.sql.functions._

import graft.operators.Fuzzy

/** Unit behavior of the blocked Levenshtein join; cross-engine exactness
  * is covered by the FuzzyPack oracle (q127). */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private val block = element_at(split(col("name"), " "), -1)

  test("blockedLevenshtein: finds near pairs inside a block") {
    val df = Seq("red bolt", "rad bolt", "blue bolt", "red ring")
      .toDF("p_name")
    val out = Fuzzy.blockedLevenshtein(df, "p_name", block, maxDist = 1)
      .select("name_a", "name_b", "dist")
      .as[(String, String, Int)].collect().toSet
    assert(out === Set(("rad bolt", "red bolt", 1)))
  }

  test("blockedLevenshtein: pairs in different blocks are never compared") {
    // distance 1 but different last token -> different block -> no pair
    val df = Seq("red bolt", "red bolts").toDF("p_name")
    val out = Fuzzy.blockedLevenshtein(df, "p_name", block, maxDist = 3)
    assert(out.count() === 0)
  }

  test("blockedLevenshtein: duplicates collapse and self-pairs are excluded") {
    val df = Seq("red bolt", "red bolt", "rod bolt").toDF("p_name")
    val out = Fuzzy.blockedLevenshtein(df, "p_name", block, maxDist = 2)
      .as[(String, String, String, Int)].collect()
    assert(out.length === 1) // distinct names first, a < b once
    assert(out.head._4 === 1)
  }

  test("blockedLevenshtein: plan is an equi-join on the block, no cartesian") {
    val df = Seq("red bolt", "rad bolt").toDF("p_name")
    val plan = Fuzzy.blockedLevenshtein(df, "p_name", block, maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
