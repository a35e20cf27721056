package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the anchor-bias policy (VERDICT r10 task 5, r12 task 3):
  * BENCH_ANCHOR.txt must be exactly the declared statistic (its
  * "# stat:" header line) over the declared per-run observation basis
  * (its "# basis:" header line) of the committed clean source runs
  * (its "# source:" header lines).
  *
  * Statistic history: round 9-10 anchors were per-query MINIMA over
  * clean runs — maximal teeth, but the anchor sum sat ~15 % below the
  * best single achievable run, guaranteeing a background retry rate
  * even in clean windows (BENCH_r10: 39/242 retried, 16 %). Round 11
  * switched to MEDIAN: replaying the four recorded clean runs against
  * both anchor sets, min-anchors flag 4-27 queries per run as
  * degraded-retry-eligible (1.5x bar) and up to 5 as hard
  * over-threshold (3x bar), median anchors 1-17 and ≤3 — roughly half
  * the churn, while a real 3x regression still trips the threshold on
  * every run.
  *
  * Basis history: through round 12 the per-run observation was the
  * headline cold (the run's "queries" map — min over recorded passes,
  * retry wins included). Retry wins execute against a warmer JVM/page
  * cache than any honest cold pass, so a query whose headline wins
  * were retries gets an anchor below every achievable first throw and
  * is then re-measured in EVERY subsequent run (q100_training_mix:
  * anchor 0.981 from 0.97-1.8 s retry wins vs stable 3.5-4.3 s first
  * throws across all six r11+r12 clean runs). Round 13 switched the
  * basis to FIRST-ON-RETRY: a run's observation for q is its first
  * throw (the "first" map) when the run's headline win was a retry
  * (q present in the run's "retry" map), else the headline cold. A
  * first throw contaminated by genuine transient noise is out-voted
  * by the median across runs (r12c's q23/q239/q241 noise retries moved
  * their medians by 0.000), so the substitution is safe per-run.
  *
  * This spec makes the policy mechanical: regenerate with
  * tools/anchor.py, which emits the machine-readable header this spec
  * re-derives the file from (tools/round_close.py runs the same
  * derivation JVM-free). */
class AnchorPolicySpec extends AnyFunSuite {

  /** "# stat: s", "# basis: b" and "# source: p" header lines of the
    * anchor file. A pre-r13 file with no basis line reads as the old
    * headline basis. */
  private def provenance(path: String): (String, String, Seq[String]) = {
    val src = scala.io.Source.fromFile(path)(scala.io.Codec.UTF8)
    try {
      val lines = src.getLines().toList
      val stat = lines.collectFirst {
        case l if l.startsWith("# stat:") => l.stripPrefix("# stat:").trim
      }.getOrElse("")
      val basis = lines.collectFirst {
        case l if l.startsWith("# basis:") => l.stripPrefix("# basis:").trim
      }.getOrElse("headline")
      val sources = lines.collect {
        case l if l.startsWith("# source:") => l.stripPrefix("# source:").trim
      }
      (stat, basis, sources)
    } finally src.close()
  }

  /** A named flat string→double map of a BENCH_DETAIL json ("queries",
    * "first", "retry" — no nested braces, so a regex extraction is
    * exact). "retry" may be empty ({}) in a fully-clean run. Tolerates
    * whitespace after the colons: Bench.scala writes compact JSON but
    * pregate.py --stamp rewrites the file with python's default
    * '": "' separators (first hit: the stamped r18 anchor sources). */
  private def mapOf(text: String, name: String): Map[String, Double] = {
    val m = ("\"" + name + "\"\\s*:\\s*\\{([^}]*)\\}").r.findFirstMatchIn(text)
      .getOrElse(fail(s"no $name map in the source run"))
    val body = m.group(1).trim
    if (body.isEmpty) Map.empty
    else body.split(",").iterator.map { kv =>
      val Array(k, v) = kv.split(":", 2)
      k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble
    }.toMap
  }

  /** Per-run honest observations of a source run under the basis. */
  private def observationsOf(path: String,
      basis: String): Map[String, Double] = {
    val src = scala.io.Source.fromFile(path)(scala.io.Codec.UTF8)
    val text = try src.mkString finally src.close()
    val queries = mapOf(text, "queries")
    basis match {
      case "headline" => queries
      case "first-on-retry" =>
        val first = mapOf(text, "first")
        val retry = mapOf(text, "retry")
        queries.map { case (k, v) =>
          if (retry.contains(k) && first.contains(k)) {
            // Bench clamps a FAILED first pass to a negative value; a
            // retry-rescued run has n_failed=0 and a positive headline,
            // so without this guard a negative observation would poison
            // the anchor median/min (round-14 ADVICE, medium)
            assert(first(k) > 0,
              s"$path: first pass of $k failed (${first(k)}) — a " +
                "retry-rescued run is not a clean anchor source")
            k -> first(k)
          } else k -> v
        }
      case other => fail(s"unknown anchor basis '$other' — extend this " +
        "match (and the policy assertion below) deliberately")
    }
  }

  test("BENCH_ANCHOR.txt declares its statistic, basis and source runs") {
    val (stat, basis, sources) = provenance("BENCH_ANCHOR.txt")
    assert(stat == "median",
      s"anchor stat is '$stat' — the round-11 policy decision is median " +
        "(see BASELINE.md); a deliberate change must update this spec")
    assert(basis == "first-on-retry",
      s"anchor basis is '$basis' — the round-13 policy decision is " +
        "first-on-retry (retry wins are warm-biased; see BASELINE.md); " +
        "a deliberate change must update this spec")
    assert(sources.nonEmpty, "anchor file lists no '# source:' runs")
    sources.foreach(p => assert(new java.io.File(p).isFile,
      s"anchor source run $p is not committed alongside the anchors"))
  }

  test("every committed anchor is exactly the declared stat over its sources") {
    val (stat, basis, sources) = provenance("BENCH_ANCHOR.txt")
    val runs = sources.map(observationsOf(_, basis))
    val anchors = Bench.parseAnchors("BENCH_ANCHOR.txt")
    assert(anchors.nonEmpty)
    def expected(vs: Seq[Double]): Double = stat match {
      case "min" => vs.min
      case "median" => // mean of middle two for even n
        val s = vs.sorted
        val n = s.length
        if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
      // exhaustive on purpose (r11 ADVICE): a typo'd or new "# stat:"
      // value must fail here, not be silently validated as median
      case other => fail(s"unknown anchor stat '$other' — extend this " +
        "match (and the policy assertion above) deliberately")
    }
    val drifted = anchors.flatMap { case (name, a) =>
      val vs = runs.flatMap(_.get(name))
      if (vs.isEmpty) Some(s"$name: in anchors but in no source run")
      else {
        val e = expected(vs)
        // anchors are printed at 3 decimals
        if (math.abs(e - a) > 0.0005 + 1e-9)
          Some(f"$name: anchor $a vs $stat ${e}%.3f of ${vs.mkString(",")}")
        else None
      }
    }
    assert(drifted.isEmpty,
      "anchor file drifted from its declared statistic — regenerate with " +
        s"tools/anchor.py:\n${drifted.mkString("\n")}")
    // and nothing measured is missing an anchor (covered fleet)
    val uncovered = runs.flatMap(_.keySet).toSet -- anchors.keySet
    assert(uncovered.isEmpty,
      s"queries in source runs without an anchor: ${uncovered.toSeq.sorted}")
  }

  test("every source run's scale factor matches the declared '# sf:' header") {
    // the mixed-sf refusal in tools/anchor.py only guards GENERATION; a
    // hand-edited anchor file mixing sf sources must fail re-derivation
    // too (round-14 ADVICE). Basenames compared: detail files record sf
    // as a machine-local absolute path, the header commits the portable
    // basename (e.g. "sf0.1").
    val src = scala.io.Source.fromFile("BENCH_ANCHOR.txt")(scala.io.Codec.UTF8)
    val lines = try src.getLines().toList finally src.close()
    val declSf = lines.collectFirst {
      case l if l.startsWith("# sf:") => l.stripPrefix("# sf:").trim
    }.getOrElse("")
    assert(declSf.nonEmpty, "anchor file declares no '# sf:' header")
    assert(!declSf.contains("/"),
      s"'# sf:' header '$declSf' is a machine-local path — commit the " +
        "portable basename (regenerate with tools/anchor.py)")
    val (_, _, sources) = provenance("BENCH_ANCHOR.txt")
    // \s*: pregate-stamped details use python's '": "' separators
    val sfRe = "\"sf\"\\s*:\\s*\"([^\"]*)\"".r
    sources.foreach { p =>
      val s = scala.io.Source.fromFile(p)(scala.io.Codec.UTF8)
      val text = try s.mkString finally s.close()
      val runSf = sfRe.findFirstMatchIn(text)
        .map(m => m.group(1).stripSuffix("/").split("/").last)
        .getOrElse("?")
      assert(runSf == declSf,
        s"anchor source $p ran at sf '$runSf' but the file declares " +
          s"'$declSf' — mixed-scale anchors would defang every threshold")
    }
  }

  test("first-on-retry refuses a retry-rescued run (negative first throw)") {
    // q_a's first pass FAILED (clamped to -2.0 by Bench) and the retry
    // rescued the headline: n_failed=0, every refusal check passes, yet
    // substituting first(q_a) would inject -2.0 into the anchor median
    // (round-14 ADVICE, medium). The basis must fail loudly instead.
    val text = """{"queries":{"q_a":1.0,"q_b":2.0},""" +
      """"first":{"q_a":-2.0,"q_b":2.0},"retry":{"q_a":1.0}}"""
    val tmp = java.io.File.createTempFile("anchor-negfirst", ".json")
    tmp.deleteOnExit()
    val w = new java.io.PrintWriter(tmp, "UTF-8")
    try w.write(text) finally w.close()
    val e = intercept[org.scalatest.exceptions.TestFailedException] {
      observationsOf(tmp.getPath, "first-on-retry")
    }
    assert(e.getMessage.contains("retry-rescued"))
    // the headline basis is unaffected (it never reads "first")
    assert(observationsOf(tmp.getPath, "headline") ==
      Map("q_a" -> 1.0, "q_b" -> 2.0))
  }

  test("first-on-retry substitutes the first throw only for retry wins") {
    // synthetic source-run text: q_a won on a retry (headline 1.0,
    // first throw 4.0), q_b's headline IS its first throw
    val text = """{"queries":{"q_a":1.0,"q_b":2.0},""" +
      """"first":{"q_a":4.0,"q_b":2.0},"retry":{"q_a":1.0}}"""
    val tmp = java.io.File.createTempFile("anchor-basis", ".json")
    tmp.deleteOnExit()
    val w = new java.io.PrintWriter(tmp, "UTF-8")
    try w.write(text) finally w.close()
    val obs = observationsOf(tmp.getPath, "first-on-retry")
    assert(obs == Map("q_a" -> 4.0, "q_b" -> 2.0))
    // the old basis ignores retry provenance
    assert(observationsOf(tmp.getPath, "headline") ==
      Map("q_a" -> 1.0, "q_b" -> 2.0))
    // an empty retry map ({}) parses as no substitutions
    val clean = """{"queries":{"q_a":1.0},"first":{"q_a":1.0},"retry":{}}"""
    val tmp2 = java.io.File.createTempFile("anchor-basis2", ".json")
    tmp2.deleteOnExit()
    val w2 = new java.io.PrintWriter(tmp2, "UTF-8")
    try w2.write(clean) finally w2.close()
    assert(observationsOf(tmp2.getPath, "first-on-retry") == Map("q_a" -> 1.0))
  }
}
