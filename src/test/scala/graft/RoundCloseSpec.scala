package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs the python selftest for `tools/round_close.py --fix` as part of
  * the standard sbt gate (VERDICT r13 task 1): the official driver
  * artifacts land AFTER the builder's last commit by construction, so
  * --fix is the only way a round close ever self-heals — and its one
  * hard safety property (refuse to touch any dirty path that is not a
  * driver artifact, committing NOTHING on refusal) must be regression-
  * checked mechanically, like CitationSpec twins check_citations.py. */
class RoundCloseSpec extends AnyFunSuite {

  test("round_close.py --fix selftest passes (refusal-safety contract)") {
    val (code, out) = PyGate.run("tools/test_round_close.py")
    assert(code == 0, s"tools/test_round_close.py failed:\n$out")
  }
}
