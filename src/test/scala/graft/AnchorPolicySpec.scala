package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the anchor-bias policy (VERDICT r10 task 5): BENCH_ANCHOR.txt
  * must be exactly the declared statistic (its "# stat:" header line)
  * over the committed clean source runs (its "# source:" header lines).
  * Round 9-10 anchors were per-query MINIMA over clean runs — maximal
  * teeth, but the anchor sum sat ~15 % below the best single achievable
  * run, guaranteeing a background retry rate even in clean windows
  * (BENCH_r10: 39/242 retried, 16 %). Round 11 switched to MEDIAN:
  * replaying the four recorded clean runs against both anchor sets,
  * min-anchors flag 4-27 queries per run as degraded-retry-eligible
  * (1.5x bar) and up to 5 as hard over-threshold (3x bar), median
  * anchors 1-17 and ≤3 — roughly half the churn, while a real 3x
  * regression still trips the threshold on every run. This spec makes
  * the policy mechanical: regenerate with tools/anchor.py, which emits
  * the machine-readable header this spec re-derives the file from. */
class AnchorPolicySpec extends AnyFunSuite {

  /** "# stat: s" and "# source: p" header lines of the anchor file. */
  private def provenance(path: String): (String, Seq[String]) = {
    val src = scala.io.Source.fromFile(path)(scala.io.Codec.UTF8)
    try {
      val lines = src.getLines().toList
      val stat = lines.collectFirst {
        case l if l.startsWith("# stat:") => l.stripPrefix("# stat:").trim
      }.getOrElse("")
      val sources = lines.collect {
        case l if l.startsWith("# source:") => l.stripPrefix("# source:").trim
      }
      (stat, sources)
    } finally src.close()
  }

  /** The "queries" map of a BENCH_DETAIL json: flat string→double, no
    * nested braces, so a regex extraction is exact. */
  private def queriesOf(path: String): Map[String, Double] = {
    val src = scala.io.Source.fromFile(path)(scala.io.Codec.UTF8)
    val text = try src.mkString finally src.close()
    val m = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(text)
      .getOrElse(fail(s"no queries map in $path"))
    m.group(1).split(",").iterator.map { kv =>
      val Array(k, v) = kv.split(":", 2)
      k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble
    }.toMap
  }

  test("BENCH_ANCHOR.txt declares its statistic and source runs") {
    val (stat, sources) = provenance("BENCH_ANCHOR.txt")
    assert(stat == "median",
      s"anchor stat is '$stat' — the round-11 policy decision is median " +
        "(see BASELINE.md); a deliberate change must update this spec")
    assert(sources.nonEmpty, "anchor file lists no '# source:' runs")
    sources.foreach(p => assert(new java.io.File(p).isFile,
      s"anchor source run $p is not committed alongside the anchors"))
  }

  test("every committed anchor is exactly the declared stat over its sources") {
    val (stat, sources) = provenance("BENCH_ANCHOR.txt")
    val runs = sources.map(queriesOf)
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
}
