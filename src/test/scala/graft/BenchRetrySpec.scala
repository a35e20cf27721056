package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bounded-retry policy (VERDICT r7 tasks 1–3) is harness-critical:
  * the official bench artifact must survive a degraded-host window with
  * no judge in the loop. These tests pin its pure parts — anchor parsing,
  * the retry threshold, and the /proc/stat reading — so a regression
  * shows up here instead of in a once-per-round driver artifact. */
class BenchRetrySpec extends AnyFunSuite {

  test("parseAnchors reads name-value lines, skipping comments and garbage") {
    val f = java.io.File.createTempFile("anchor", ".txt")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f)
    try w.print(
      """# comment line
        |q01_mse 2.774
        |q02_codec 1.951
        |
        |not-a-pair
        |q03_bad notanumber
        |q04 1 extra
        |""".stripMargin)
    finally w.close()
    val m = Bench.parseAnchors(f.getAbsolutePath)
    assert(m == Map("q01_mse" -> 2.774, "q02_codec" -> 1.951))
  }

  test("parseAnchors of a missing file is empty, not an exception") {
    assert(Bench.parseAnchors("/nonexistent/anchors.txt").isEmpty)
  }

  test("the committed BENCH_ANCHOR.txt covers the whole contract fleet") {
    val m = Bench.parseAnchors("BENCH_ANCHOR.txt")
    val missing = SparkEntry.queries.keySet -- m.keySet
    assert(missing.isEmpty,
      s"queries without a bench anchor (retry pass can't gauge them): " +
        missing.toSeq.sorted.mkString(", "))
    assert(m.values.forall(v => v > 0 && v < 120),
      "anchor values must be positive sub-deadline seconds")
  }

  test("retryThreshold is max(3s, 3x anchor); absent anchor means no threshold") {
    assert(Bench.retryThreshold(Some(0.35)).contains(3.0)) // floor
    assert(Bench.retryThreshold(Some(5.0)).contains(15.0)) // 3x
    assert(Bench.retryThreshold(None).isEmpty)
  }

  test("cpuSteal sums only the first 8 /proc/stat fields (no guest double-count)") {
    val (steal, total) = Bench.cpuSteal()
    if (total >= 0) { // Linux
      assert(steal >= 0 && steal <= total)
      // re-read: monotone non-decreasing counters
      val (steal2, total2) = Bench.cpuSteal()
      assert(steal2 >= steal && total2 >= total)
      // the 8-field sum must be strictly smaller than a full-line sum
      // whenever guest jiffies are nonzero, and equal otherwise; either
      // way it can never exceed it
      val f = {
        val src = scala.io.Source.fromFile("/proc/stat")
        try src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        finally src.close()
      }
      assert(f.take(8).sum <= f.sum)
    }
  }
}
