package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs the python selftest for `tools/pregate.py` inside the sbt gate,
  * the way RoundCloseSpec/AnchorSweepToolSpec twin their scripts. The
  * pre-gate is the recording discipline for clean bench evidence
  * (BASELINE.md r16 policy bullet): a broken gate that silently passes
  * on a noisy host would let storm-inflated runs into the `_clean` set
  * and from there into the anchors, so its refusal paths are pinned
  * mechanically like the rest of the evidence chain. */
class PregateToolSpec extends AnyFunSuite {

  test("pregate.py selftest passes (clean-run recording discipline)") {
    val (code, out) = PyGate.run("tools/test_pregate.py")
    assert(code == 0, s"tools/test_pregate.py failed:\n$out")
  }
}
