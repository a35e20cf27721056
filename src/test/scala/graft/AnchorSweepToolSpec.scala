package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs the python unit tests for `tools/anchor.py` and `tools/sweep.py`
  * as part of the standard sbt gate, the way RoundCloseSpec twins
  * round_close.py's selftest. These two scripts carry the bench
  * evidence chain — anchor.py generates the retry thresholds
  * Bench.scala reads, sweep.py is the per-round regression gate — and
  * their refusal paths (mixed sf, failed/degraded/retry-rescued
  * sources, the 2x-BASELINE bars) plus sweep's flag semantics must be
  * regression-checked mechanically, not just exercised ad hoc at round
  * close. AnchorPolicySpec separately re-derives the COMMITTED anchor
  * file; this spec covers the generator and the sweep themselves. */
class AnchorSweepToolSpec extends AnyFunSuite {

  test("anchor.py + sweep.py selftest passes (evidence-chain gates)") {
    val (code, out) = PyGate.run("tools/test_anchor_sweep.py")
    assert(code == 0, s"tools/test_anchor_sweep.py failed:\n$out")
  }
}
