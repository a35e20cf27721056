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

  test("parseAnchors survives non-ASCII comment bytes (UTF-8 read)") {
    val f = java.io.File.createTempFile("anchor-utf8", ".txt")
    f.deleteOnExit()
    val w = new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(f), java.nio.charset.StandardCharsets.UTF_8)
    try w.write("# provenance — r10 clean run\nq01_mse 1.25\n")
    finally w.close()
    assert(Bench.parseAnchors(f.getAbsolutePath) == Map("q01_mse" -> 1.25))
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

  test("the committed anchor total is a plausible clean run, not a degraded one") {
    // The retry policy's teeth are exactly as sharp as the anchors: an
    // anchor file regenerated from a degraded run would multiply every
    // threshold by the degradation and let real regressions slide (the r8
    // stale-anchor finding: 3 reworked queries carried 5-8x-loose
    // anchors). Gate: the anchor totals must stay within 2x of the
    // BASELINE.md 451.7 s round-7 anchor run — the same 2x bar the bench
    // gate itself uses.
    val m = Bench.parseAnchors("BENCH_ANCHOR.txt")
    val total = m.values.sum
    assert(total > 50.0, f"anchor total $total%.1f s implausibly small")
    assert(total <= 2 * 451.67,
      f"anchor total $total%.1f s exceeds 2x the 451.67 s BASELINE anchor — " +
        "this anchor file was regenerated from a degraded run; re-record")
  }

  test("warmRetryNeeded: missing, suspect, over-anchor, or slower-than-cold warms") {
    // no successful warm at all (first cold failed, retry rescued it)
    assert(Bench.warmRetryNeeded(-1.0, 2.0, Some(1.0), suspect = false))
    // measured behind a lingering deadline-kill
    assert(Bench.warmRetryNeeded(1.0, 2.0, Some(1.0), suspect = true))
    // over the same max(3s, 3x anchor) bar as a cold
    assert(Bench.warmRetryNeeded(3.5, 4.0, Some(1.0), suspect = false))
    assert(!Bench.warmRetryNeeded(2.9, 4.0, Some(1.0), suspect = false))
    // steady-state slower than cold (the BENCH_r08 951.9s-warm signature),
    // but only above the 3 s jitter floor
    assert(Bench.warmRetryNeeded(3.2, 3.1, Some(2.0), suspect = false))
    assert(!Bench.warmRetryNeeded(0.5, 0.4, Some(2.0), suspect = false))
    // clean warm below cold and anchor: no retry
    assert(!Bench.warmRetryNeeded(1.0, 2.0, Some(1.0), suspect = false))
    // no anchor: only the missing/suspect/slower-than-cold clauses apply
    assert(!Bench.warmRetryNeeded(10.0, 20.0, None, suspect = false))
    assert(Bench.warmRetryNeeded(25.0, 20.0, None, suspect = false))
  }

  test("finalRetryNeeded: still-failed, still-over-threshold, or suspect headlines") {
    // retry also failed → one last end-of-run chance
    assert(Bench.finalRetryNeeded(coldOk = false, -2.0, Some(1.0), suspect = false))
    // headline still above 3x anchor after the main retry
    assert(Bench.finalRetryNeeded(coldOk = true, 4.0, Some(1.0), suspect = false))
    assert(!Bench.finalRetryNeeded(coldOk = true, 2.5, Some(1.0), suspect = false))
    // winning pass itself measured under contamination
    assert(Bench.finalRetryNeeded(coldOk = true, 1.0, Some(1.0), suspect = true))
    // no anchor: only failure/suspect trigger
    assert(!Bench.finalRetryNeeded(coldOk = true, 100.0, None, suspect = false))
    assert(Bench.finalRetryNeeded(coldOk = false, -1.0, None, suspect = false))
  }

  test("degradedRetryNeeded: own-flagged windows retry past the 3s floor " +
      "when the anchor corroborates (or no anchor exists)") {
    // r13 task 6 + r14 ADVICE: an execution whose OWN probes flagged the
    // window is re-measured when it cleared the 3 s jitter floor AND its
    // anchor shows the measurement actually moved — a cold at or under
    // its anchor was demonstrably not inflated, so re-measuring it
    // cannot correct the headline and only burns budget
    assert(Bench.degradedRetryNeeded(4.0, Some(2.0), ownWindow = true))
    // between 1.0x and 1.5x anchor: the own tier fires where the
    // nearWave tier (1.5x bar) would not — window evidence itself is
    // the corroboration
    assert(Bench.degradedRetryNeeded(12.0, Some(10.0), ownWindow = true))
    assert(!Bench.degradedRetryNeeded(12.0, Some(10.0),
      ownWindow = false, nearWave = true))
    // at or under the anchor: demonstrably not inflated — no retry
    // (this exact case burned a full execution pre-r15)
    assert(!Bench.degradedRetryNeeded(3.1, Some(100.0), ownWindow = true))
    assert(!Bench.degradedRetryNeeded(10.0, Some(10.0), ownWindow = true))
    // anchor-less queries keep the floor-only behavior
    assert(Bench.degradedRetryNeeded(3.1, None, ownWindow = true))
    // the 3 s floor: sub-3s re-measures cannot move the headline
    assert(!Bench.degradedRetryNeeded(2.9, Some(0.3), ownWindow = true))
    assert(!Bench.degradedRetryNeeded(2.9, None, ownWindow = true))
    // clean window, no wave nearby: never fires, however slow the cold
    // (that is the blanket 3x threshold's job)
    assert(!Bench.degradedRetryNeeded(100.0, Some(2.0), ownWindow = false))
  }

  test("degradedRetryNeeded: wave-adjacent executions need the 1.5x anchor bar") {
    // the r13 official q78/q116/q117 case: own probes clean, but the
    // execution ran within ±60 s of a window flagged elsewhere — the
    // anchor must corroborate the slowdown reached the query
    assert(Bench.degradedRetryNeeded(4.0, Some(2.0),
      ownWindow = false, nearWave = true))
    // under the 1.5x bar: the wave did not reach the query
    assert(!Bench.degradedRetryNeeded(2.9, Some(2.0),
      ownWindow = false, nearWave = true))
    // 3s floor holds for tiny anchors
    assert(!Bench.degradedRetryNeeded(2.9, Some(0.3),
      ownWindow = false, nearWave = true))
    assert(Bench.degradedRetryNeeded(3.1, Some(0.3),
      ownWindow = false, nearWave = true))
    // anchor-less queries never fire on adjacency alone
    assert(!Bench.degradedRetryNeeded(100.0, None,
      ownWindow = false, nearWave = true))
    // own-flag + adjacency with the cold under its anchor: neither tier
    // fires (own needs cold > anchor, nearWave needs cold > 1.5x)
    assert(!Bench.degradedRetryNeeded(3.1, Some(100.0),
      ownWindow = true, nearWave = true))
    // own-flag wins over adjacency's stricter 1.5x bar once the anchor
    // corroborates at all
    assert(Bench.degradedRetryNeeded(12.0, Some(10.0),
      ownWindow = true, nearWave = true))
  }

  test("inWave: interval overlap against ±margin-expanded degraded windows") {
    val s = 1000000000L // 1 s in ns
    val waves = Seq((100 * s, 110 * s), (300 * s, 305 * s))
    val m = 60 * s
    // inside a wave
    assert(Bench.inWave(102 * s, 104 * s, waves, m))
    // within the ±60 s expansion on either side
    assert(Bench.inWave(45 * s, 50 * s, waves, m))   // ends 50s before wave 1
    assert(Bench.inWave(160 * s, 168 * s, waves, m)) // starts 50s after it
    assert(Bench.inWave(360 * s, 362 * s, waves, m)) // 55s after wave 2
    // spanning a whole wave
    assert(Bench.inWave(95 * s, 120 * s, waves, m))
    // clear of both expansions
    assert(!Bench.inWave(200 * s, 220 * s, waves, m))
    assert(!Bench.inWave(30 * s, 35 * s, waves, m))
    assert(!Bench.inWave(400 * s, 410 * s, waves, m))
    // a clean run records no waves: never fires, so the rule provably
    // changes nothing in clean windows
    assert(!Bench.inWave(0, Long.MaxValue / 2, Seq.empty, m))
  }

  test("midRunRegateNeeded: three consecutive degraded windows, not blips") {
    // BENCH_r11's warm sweep ran entirely inside a mid-run degradation
    // wave (366 s vs 160 s clean) — the gate must fire on a sustained
    // wave but never on an isolated probe blip (a healthy run with
    // scattered single flags must not pause)
    assert(!Bench.midRunRegateNeeded(0))
    assert(!Bench.midRunRegateNeeded(1))
    assert(!Bench.midRunRegateNeeded(2))
    assert(Bench.midRunRegateNeeded(3))
    assert(Bench.midRunRegateNeeded(4)) // budget spent → gate was a no-op
    // the caller resets the streak on any clean execution, so an
    // alternating degraded/clean pattern keeps the count under 3 —
    // simulate that contract here
    val flags = Seq(true, false, true, true, false, true, true, true)
    val maxStreak = flags.foldLeft((0, 0)) { case ((cur, mx), d) =>
      val c = if (d) cur + 1 else 0; (c, math.max(mx, c))
    }
    assert(maxStreak._1 == 3 && Bench.midRunRegateNeeded(maxStreak._1))
    assert(!Bench.midRunRegateNeeded(2)) // the alternating prefix never fires
  }

  test("cpuBusy and selfJiffies read consistent monotone counters") {
    val (b0, t0) = Bench.cpuBusy()
    val s0 = Bench.selfJiffies()
    if (t0 >= 0) { // Linux
      assert(b0 >= 0 && b0 <= t0)
      // burn a little CPU so self advances measurably
      var x = 0L; var i = 0
      while (i < 50000000) { x ^= i; i += 1 }
      assert(x != Long.MinValue)
      val (b1, t1) = Bench.cpuBusy()
      val s1 = Bench.selfJiffies()
      assert(b1 >= b0 && t1 >= t0 && s1 >= s0)
      // this process's burn is part of the guest's busy jiffies
      assert(b1 - b0 >= 0)
    }
  }

  test("hostmark returns a positive bounded spin time and tightens with JIT") {
    val first = Bench.hostmark()
    assert(first > 0)
    // after a few warm-up reads the compiled spin sits well under a
    // second on any plausible host; the warmed minimum is the figure the
    // bench compares windows against
    val warmed = (1 to 8).map(_ => Bench.hostmark()).min
    assert(warmed > 0 && warmed < 1000.0,
      s"warmed hostmark $warmed ms out of range")
    // no upper bound vs `first`: on exactly the degraded hosts this probe
    // exists to detect, the host can slow 2.5-10x BETWEEN the first read
    // and the follow-ups, so warmed > first is a legitimate reading, not
    // a probe bug (round-10 ADVICE — the old `warmed <= 2*first+1` assert
    // was flaky under the documented slowdown waves)
  }

  test("loadedStealPct burns briefly and returns a bounded percentage") {
    val t0 = System.nanoTime
    val pct = Bench.loadedStealPct(threads = 2, ms = 100)
    val elapsed = (System.nanoTime - t0) / 1e6
    assert(pct == -1.0 || (pct >= 0.0 && pct <= 100.0))
    assert(elapsed < 5000, s"probe took ${elapsed}ms — must stay bounded")
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
