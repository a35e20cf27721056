#!/usr/bin/env python3
"""Unit tests for tools/anchor.py and tools/sweep.py.

These two scripts carry the bench evidence chain: anchor.py generates
the retry thresholds Bench.scala reads, sweep.py is the per-round
regression gate. AnchorPolicySpec re-derives the COMMITTED anchor file
(covering the happy-path derivation), but the refusal paths — the
gates that keep a degraded run from silently defanging the policy —
and sweep.py's flag logic were exercised only ad hoc until round 16.
Each test drives the real script as a subprocess over synthetic detail
files, the same way the round-close selftest drives round_close.py.
"""
import json
import os
import subprocess
import sys
import tempfile
import unittest

TOOLS = os.path.dirname(os.path.abspath(__file__))
ANCHOR = os.path.join(TOOLS, "anchor.py")
SWEEP = os.path.join(TOOLS, "sweep.py")


def detail(queries, first=None, retry=None, sf="/root/testdata/sf0.1",
           n_failed=0, steal_pct=0.1):
    return {"queries": queries, "first": first or {}, "retry": retry or {},
            "sf": sf, "n_failed": n_failed, "steal_pct": steal_pct}


class Base(unittest.TestCase):
    def setUp(self):
        self.dir = tempfile.TemporaryDirectory()
        self.addCleanup(self.dir.cleanup)

    def write(self, name, obj):
        p = os.path.join(self.dir.name, name)
        with open(p, "w") as f:
            json.dump(obj, f)
        return p

    def run_tool(self, script, *args):
        return subprocess.run([sys.executable, script, *args],
                              capture_output=True, text=True)


class AnchorTool(Base):
    def test_median_with_first_on_retry_substitution(self):
        # q1: plain colds 1.0/2.0/3.0 -> median 2.0. q2: the middle run's
        # 0.5 headline was a retry win, substituted by its 4.0 first
        # throw -> observations 2.0/4.0/2.0 -> median 2.0 (not 1.5).
        ps = [self.write("a.json", detail({"q1": 1.0, "q2": 2.0})),
              self.write("b.json", detail({"q1": 2.0, "q2": 0.5},
                                          first={"q2": 4.0},
                                          retry={"q2": 0.5})),
              self.write("c.json", detail({"q1": 3.0, "q2": 2.0}))]
        r = self.run_tool(ANCHOR, "abc1234", *ps)
        self.assertEqual(r.returncode, 0, r.stderr)
        anchors = dict(l.split() for l in r.stdout.splitlines()
                       if l and not l.startswith("#"))
        self.assertEqual(anchors["q1"], "2.000")
        self.assertEqual(anchors["q2"], "2.000")
        self.assertIn("# basis: first-on-retry", r.stdout)
        self.assertIn("1 retry-win headline(s) replaced", r.stdout)

    def test_refuses_mixed_scale_factors(self):
        ps = [self.write("a.json", detail({"q1": 1.0})),
              self.write("b.json", detail({"q1": 1.0},
                                          sf="/root/testdata/sf0.01"))]
        r = self.run_tool(ANCHOR, "abc1234", *ps)
        self.assertEqual(r.returncode, 1)
        self.assertIn("mixed scale factors", r.stderr)

    def test_missing_args_is_a_usage_error_not_a_crash(self):
        # no args crashed with IndexError; a lone commit arg printed a
        # header-only anchor file then died with a bare StopIteration;
        # a bare --stat crashed at argv[1] (r18 ADVICE)
        for args in ([], ["abc1234"], ["--stat"]):
            r = self.run_tool(ANCHOR, *args)
            self.assertEqual(r.returncode, 1, r.stdout + r.stderr)
            self.assertIn("usage:", r.stderr)
            self.assertNotIn("Traceback", r.stderr)
            self.assertEqual(r.stdout, "")

    def test_refuses_failed_queries(self):
        p = self.write("a.json", detail({"q1": -1.0}))
        r = self.run_tool(ANCHOR, "abc1234", p)
        self.assertEqual(r.returncode, 1)
        self.assertIn("failed queries", r.stderr)
        p2 = self.write("b.json", detail({"q1": 1.0}, n_failed=1))
        r2 = self.run_tool(ANCHOR, "abc1234", p2)
        self.assertEqual(r2.returncode, 1)

    def test_refuses_degraded_headline_total(self):
        p = self.write("a.json", detail({"q1": 950.0}))  # > 2x 451.67
        r = self.run_tool(ANCHOR, "abc1234", p)
        self.assertEqual(r.returncode, 1)
        self.assertIn("2x BASELINE anchor", r.stderr)

    def test_refuses_degraded_substituted_total(self):
        # headline passes the 2x bar, but the honest first throw was a
        # degraded 950 s rescued by a retry (round-14 ADVICE)
        p = self.write("a.json", detail({"q1": 10.0},
                                        first={"q1": 950.0},
                                        retry={"q1": 10.0}))
        r = self.run_tool(ANCHOR, "abc1234", p)
        self.assertEqual(r.returncode, 1)
        self.assertIn("first-on-retry total", r.stderr)

    def test_refuses_negative_substituted_first_throw(self):
        p = self.write("a.json", detail({"q1": 10.0},
                                        first={"q1": -1.0},
                                        retry={"q1": 10.0}))
        r = self.run_tool(ANCHOR, "abc1234", p)
        self.assertEqual(r.returncode, 1)
        self.assertIn("not a", r.stderr)  # "not a plausibly clean source"

    def test_warns_on_elevated_steal_sources(self):
        # round 16: three storm runs (run-average steal 1.3-1.9 %) passed
        # every refusal gate; the warning is the mechanical tripwire
        hot = self.write("hot.json", detail({"q1": 1.0}, steal_pct=1.5))
        cold = self.write("cold.json", detail({"q1": 1.0}, steal_pct=0.2))
        r = self.run_tool(ANCHOR, "abc1234", hot, cold)
        self.assertEqual(r.returncode, 0, r.stderr)
        self.assertIn("WARNING", r.stderr)
        self.assertIn("hot.json", r.stderr)
        self.assertNotIn("cold.json", r.stderr)
        # the warning must not contaminate the stdout anchor stream
        self.assertNotIn("WARNING", r.stdout)


class SweepTool(Base):
    def test_identical_runs_have_no_flags(self):
        base = self.write("b.json", detail({"q1": 4.0, "q2": 0.5}))
        new = self.write("n.json", detail({"q1": 4.0, "q2": 0.5}))
        r = self.run_tool(SWEEP, "--base", base, "--new", new)
        self.assertEqual(r.returncode, 0, r.stdout + r.stderr)
        self.assertIn("0 flag(s)", r.stdout)

    def test_flags_only_above_ratio_and_floor(self):
        # q1: 4 -> 7 s = 1.75x above the 3 s floor -> FLAG.
        # q2: 0.5 -> 2.9 s = 5.8x but under the floor -> no flag.
        # q3: 4 -> 5 s = 1.25x, under the 1.5x bar -> no flag.
        base = self.write("b.json",
                          detail({"q1": 4.0, "q2": 0.5, "q3": 4.0}))
        new = self.write("n.json",
                         detail({"q1": 7.0, "q2": 2.9, "q3": 5.0}))
        r = self.run_tool(SWEEP, "--base", base, "--new", new)
        self.assertEqual(r.returncode, 1)
        self.assertIn("[FLAG] q1", r.stdout)
        self.assertNotIn("q2:", r.stdout.replace("[new]", ""))
        self.assertNotIn("[FLAG] q3", r.stdout)

    def test_best_of_runs_absorbs_one_noisy_run(self):
        base = self.write("b.json", detail({"q1": 4.0}))
        noisy = self.write("n1.json", detail({"q1": 9.0}))
        quiet = self.write("n2.json", detail({"q1": 4.2}))
        r = self.run_tool(SWEEP, "--base", base, "--new", noisy, quiet)
        self.assertEqual(r.returncode, 0, r.stdout)

    def test_first_on_retry_substitution(self):
        # base honest cold 4.0; the new run's 1.0 headline was a retry
        # win whose first throw was 7.0 -> compared at 7.0 -> FLAG
        # (the r11/r12 sweeps would have compared 1.0 and seen nothing)
        base = self.write("b.json", detail({"q1": 4.0}))
        new = self.write("n.json", detail({"q1": 1.0}, first={"q1": 7.0},
                                          retry={"q1": 1.0}))
        r = self.run_tool(SWEEP, "--base", base, "--new", new)
        self.assertEqual(r.returncode, 1)
        self.assertIn("[FLAG] q1", r.stdout)
        self.assertIn("7.00s", r.stdout)

    def test_gone_query_fails_the_sweep(self):
        base = self.write("b.json", detail({"q1": 4.0, "q2": 4.0}))
        new = self.write("n.json", detail({"q1": 4.0}))
        r = self.run_tool(SWEEP, "--base", base, "--new", new)
        self.assertEqual(r.returncode, 1)
        self.assertIn("[gone] q2", r.stdout)

    def test_refuses_mixed_scale_factors(self):
        base = self.write("b.json", detail({"q1": 4.0}))
        new = self.write("n.json", detail({"q1": 4.0},
                                          sf="/root/testdata/sf0.01"))
        r = self.run_tool(SWEEP, "--base", base, "--new", new)
        self.assertEqual(r.returncode, 2)
        self.assertIn("mixed scale factors", r.stderr)

    def test_unreadable_or_malformed_input_is_a_data_error(self):
        # a typo'd path or a non-detail JSON must exit 2 with a message,
        # not a Python traceback
        good = self.write("good.json", detail({"q1": 1.0}))
        r = self.run_tool(SWEEP, "--base", "/nonexistent.json",
                          "--new", good)
        self.assertEqual(r.returncode, 2, r.stdout + r.stderr)
        self.assertIn("cannot load", r.stderr)
        self.assertNotIn("Traceback", r.stderr)
        notdetail = self.write("notdetail.json", {"metric": "x"})
        r = self.run_tool(SWEEP, "--base", notdetail, "--new", good)
        self.assertEqual(r.returncode, 2)
        self.assertIn("not a bench detail file", r.stderr)

    def test_refuses_a_failed_run(self):
        base = self.write("b.json", detail({"q1": 4.0}))
        new = self.write("n.json", detail({"q1": 4.0}, n_failed=1))
        r = self.run_tool(SWEEP, "--base", base, "--new", new)
        self.assertEqual(r.returncode, 2)
        self.assertIn("not a clean run", r.stderr)

    def test_refuses_retry_rescued_run(self):
        base = self.write("b.json", detail({"q1": 4.0}))
        new = self.write("n.json", detail({"q1": 4.0}, first={"q1": -1.0},
                                          retry={"q1": 4.0}))
        r = self.run_tool(SWEEP, "--base", base, "--new", new)
        self.assertEqual(r.returncode, 2)
        self.assertIn("retry-rescued", r.stderr)

    def test_flag_lines_carry_per_side_medians(self):
        # r16 VERDICT task 7: adjudicating a storm-day flag needs the
        # medians, not just the best-of minima. base runs 4.0/6.0 ->
        # best 4, median 5; new runs 7.0/9.0 -> best 7, median 8.
        b1 = self.write("b1.json", detail({"q1": 4.0}))
        b2 = self.write("b2.json", detail({"q1": 6.0}))
        n1 = self.write("n1.json", detail({"q1": 7.0}))
        n2 = self.write("n2.json", detail({"q1": 9.0}))
        r = self.run_tool(SWEEP, "--base", b1, b2, "--new", n1, n2)
        self.assertEqual(r.returncode, 1)
        self.assertIn("[FLAG] q1: 4.00s -> 7.00s", r.stdout)
        self.assertIn("medians 5.00s -> 8.00s", r.stdout)

    def test_summary_carries_run_steal_context(self):
        # ... and the steal context: which side ran under contention is
        # the first question on any storm-day flag
        base = self.write("b.json", detail({"q1": 4.0}, steal_pct=0.11))
        new = self.write("n.json", detail({"q1": 4.0}, steal_pct=1.53))
        r = self.run_tool(SWEEP, "--base", base, "--new", new)
        self.assertEqual(r.returncode, 0, r.stdout + r.stderr)
        self.assertIn("run steal %: base [0.11] new [1.53]", r.stdout)

    def test_missing_steal_field_prints_placeholder(self):
        # older detail files predate the steal_pct field — the sweep
        # must not crash or fabricate a number for them
        base = self.write("b.json", {"queries": {"q1": 4.0}, "n_failed": 0,
                                     "sf": "/root/testdata/sf0.1"})
        new = self.write("n.json", detail({"q1": 4.0}, steal_pct=0.2))
        r = self.run_tool(SWEEP, "--base", base, "--new", new)
        self.assertEqual(r.returncode, 0, r.stdout + r.stderr)
        self.assertIn("base [?]", r.stdout)

    def test_summary_echoes_pregate_verdicts(self):
        # r18 VERDICT task 7: the stamped launch-time pregate verdicts
        # appear in the header so the sweep also corroborates the
        # clean-set naming; unstamped runs (twins, sanity, pre-r18)
        # print '-' and a malformed stamp is not trusted
        d_q = detail({"q1": 4.0})
        d_q["pregate"] = {"verdict": "QUIET", "samples_jiffies": [3, 0]}
        d_n = detail({"q1": 4.0})
        d_n["pregate"] = {"verdict": "NOISY", "samples_jiffies": [900, 2]}
        d_bad = detail({"q1": 4.0})
        d_bad["pregate"] = {"verdict": "MAYBE"}
        b1 = self.write("b1.json", d_q)
        b2 = self.write("b2.json", detail({"q1": 4.0}))  # no stamp
        n1 = self.write("n1.json", d_n)
        n2 = self.write("n2.json", d_bad)
        r = self.run_tool(SWEEP, "--base", b1, b2, "--new", n1, n2)
        self.assertEqual(r.returncode, 0, r.stdout + r.stderr)
        self.assertIn("run pregate: base [QUIET, -] new [NOISY, -]",
                      r.stdout)


if __name__ == "__main__":
    unittest.main(verbosity=2)
