package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.expressions.AcAutomaton
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick blocklist screen (graft_ac_hits, q155). The automaton
  * tests compare against the reference semantics
  * `patterns.filter(text.contains)` on adversarial inputs: overlapping
  * occurrences, patterns that are substrings/suffixes of each other
  * (failure-transition outputs), and repeated hits.
  */
class AcHitsSpec extends SparkSpec {

  private def ref(text: String, pats: Seq[String]): Seq[Int] =
    pats.zipWithIndex.filter { case (p, _) => text.contains(p) }.map(_._2)

  private def ac(text: String, pats: Seq[String]): Seq[Int] =
    AcAutomaton.build(pats).search(UTF8String.fromString(text))
      .toIntArray().toSeq

  test("automaton matches the contains() reference on adversarial cases") {
    // suffix outputs via failure links: "he" ends inside "she"
    val p1 = Seq("he", "she", "his", "hers")
    for (t <- Seq("ushers", "she", "ahishers", "xyz", "h", "")) {
      assert(ac(t, p1) === ref(t, p1), s"text=$t")
    }
    // overlapping occurrences of distinct patterns
    val p2 = Seq("slow scan", "an slo", "scan")
    for (t <- Seq("scan slow scan", "a slow scanner", "an slow", "scan slo")) {
      assert(ac(t, p2) === ref(t, p2), s"text=$t")
    }
    // pattern equal to another's prefix, and repeated hits dedup
    val p3 = Seq("ab", "abc", "b", "abab")
    for (t <- Seq("ababab", "abc", "ab", "ba", "cabcab")) {
      assert(ac(t, p3) === ref(t, p3), s"text=$t")
    }
    // multi-byte UTF-8 (byte-level matching must not split code points
    // incorrectly for valid needles)
    val p4 = Seq("naïve", "ïv", "é")
    for (t <- Seq("a naïve café", "naive cafe", "ïv")) {
      assert(ac(t, p4) === ref(t, p4), s"text=$t")
    }
  }

  test("randomized parity against the contains() reference") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcab" // tiny alphabet forces dense overlaps
    def word(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 200) {
      val pats = (1 to (1 + rnd.nextInt(6))).map(_ => word(1 + rnd.nextInt(4)))
        .distinct
      val text = word(rnd.nextInt(30))
      assert(ac(text, pats) === ref(text, pats),
        s"text=$text pats=${pats.mkString("|")}")
    }
  }

  test("column + SQL surfaces: sorted ids, null propagation, empty array") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = Seq(
      (1L, "the hash join was a slow scan"),
      (2L, "nothing to see"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val got = df.select(col("id"),
      TextFunctions.acHits(col("text"), TextPackBlocklist.pats).as("h"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Int](1))).toMap
    val t1 = "the hash join was a slow scan"
    assert(got(1L) === ref(t1, TextPackBlocklist.pats))
    assert(got(2L) === Seq.empty)
    assert(got(3L) == null)
    val viaSql = spark.sql(
      "SELECT graft_ac_hits('x hash join y', array('hash join', 'zz'))")
      .head().getSeq[Int](0)
    assert(viaSql === Seq(0))
  }
}

private object TextPackBlocklist {
  val pats: Seq[String] = graft.operators.TextPack.blocklist
}
