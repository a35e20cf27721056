#!/usr/bin/env python3
"""Selftest for tools/pregate.py (the ambient-steal pre-gate).

Drives the real script over recorded /proc/stat snapshots via
--stat-file, the same synthetic-input pattern test_anchor_sweep.py
uses — plus direct unit tests of the pure gate()/read_steal() core.
Run: python3 tools/test_pregate.py (also run by PregateToolSpec in
sbt test).
"""
import os
import subprocess
import sys
import tempfile
import unittest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import pregate  # noqa: E402

PREGATE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "pregate.py")


def stat_line(steal):
    return (f"cpu  100 0 200 30000 40 0 50 {steal} 0 0\n"
            "cpu0 1 0 2 300 4 0 5 6 0 0\n")


class PureCore(unittest.TestCase):
    def test_gate_quiet_and_noisy(self):
        self.assertEqual(pregate.gate([13, 0], 300, 10), (True, []))
        self.assertEqual(pregate.gate([13, 500], 300, 10), (False, [500]))
        # boundary: exactly at the bar is quiet (> not >=)
        self.assertEqual(pregate.gate([300], 300, 10), (True, []))

    def test_gate_threshold_scales_with_interval(self):
        # the threshold is a per-10s RATE: at --interval 5 the bar is
        # 150 jiffies, so a steady ~1.5% steal host (240/5s) must be
        # NOISY — an absolute threshold would have silently passed it
        self.assertEqual(pregate.gate([240, 235], 300, 5),
                         (False, [240, 235]))
        self.assertEqual(pregate.gate([140], 300, 5), (True, []))
        # and at a longer interval the bar loosens proportionally
        self.assertEqual(pregate.gate([580], 300, 20), (True, []))

    def test_read_steal_parses_field_9(self):
        with tempfile.NamedTemporaryFile("w", suffix=".stat",
                                         delete=False) as f:
            f.write(stat_line(871431))
            p = f.name
        self.addCleanup(os.unlink, p)
        self.assertEqual(pregate.read_steal(p), 871431)

    def test_read_steal_rejects_malformed(self):
        with tempfile.NamedTemporaryFile("w", suffix=".stat",
                                         delete=False) as f:
            f.write("intr 12345\n")
            p = f.name
        self.addCleanup(os.unlink, p)
        with self.assertRaises(ValueError):
            pregate.read_steal(p)


class EndToEnd(unittest.TestCase):
    def setUp(self):
        self.dir = tempfile.TemporaryDirectory()
        self.addCleanup(self.dir.cleanup)

    def snap(self, name, steal):
        p = os.path.join(self.dir.name, name)
        with open(p, "w") as f:
            f.write(stat_line(steal))
        return p

    def run_gate(self, *args):
        return subprocess.run([sys.executable, PREGATE, *args],
                              capture_output=True, text=True)

    def test_quiet_host_passes(self):
        ps = [self.snap("a", 1000), self.snap("b", 1013),
              self.snap("c", 1013)]
        r = self.run_gate("--samples", "2",
                          *sum((["--stat-file", p] for p in ps), []))
        self.assertEqual(r.returncode, 0, r.stdout + r.stderr)
        self.assertIn("QUIET", r.stdout)
        self.assertIn("[13, 0]", r.stdout)

    def test_storm_refuses(self):
        # second interval jumps 900 jiffies — the r16 storm shape
        ps = [self.snap("a", 1000), self.snap("b", 1010),
              self.snap("c", 1910)]
        r = self.run_gate("--samples", "2",
                          *sum((["--stat-file", p] for p in ps), []))
        self.assertEqual(r.returncode, 1)
        self.assertIn("NOISY", r.stdout)
        self.assertIn("wait out the storm", r.stdout)

    def test_wrong_snapshot_count_is_usage_error(self):
        ps = [self.snap("a", 1000), self.snap("b", 1010)]
        r = self.run_gate("--samples", "2",
                          *sum((["--stat-file", p] for p in ps), []))
        self.assertEqual(r.returncode, 2)
        self.assertIn("samples+1", r.stderr)

    def test_unreadable_stat_is_a_data_error_not_a_pass(self):
        r = self.run_gate("--samples", "1", "--stat-file", "/nonexistent",
                          "--stat-file", "/nonexistent")
        self.assertEqual(r.returncode, 2)
        self.assertIn("cannot read steal counter", r.stderr)

    def test_custom_threshold(self):
        ps = [self.snap("a", 1000), self.snap("b", 1050)]
        r = self.run_gate("--samples", "1", "--threshold", "40",
                          *sum((["--stat-file", p] for p in ps), []))
        self.assertEqual(r.returncode, 1)

    def test_short_interval_scales_the_bar(self):
        # 240 jiffies in a 5 s interval = ~1.5% of 32 cpus: must be
        # NOISY under the default 300/10s rate (bar 150/5s)
        ps = [self.snap("a", 1000), self.snap("b", 1240)]
        r = self.run_gate("--samples", "1", "--interval", "5",
                          *sum((["--stat-file", p] for p in ps), []))
        self.assertEqual(r.returncode, 1, r.stdout + r.stderr)
        self.assertIn("NOISY", r.stdout)

    def test_backwards_counter_is_a_data_error_not_quiet(self):
        # counter reset (reboot) or snapshots passed out of order: a
        # -900 delta hides a +900 storm — must refuse, not pass QUIET
        ps = [self.snap("a", 1910), self.snap("b", 1010)]
        r = self.run_gate("--samples", "1",
                          *sum((["--stat-file", p] for p in ps), []))
        self.assertEqual(r.returncode, 2)
        self.assertIn("backwards", r.stderr)


if __name__ == "__main__":
    unittest.main(verbosity=2)
