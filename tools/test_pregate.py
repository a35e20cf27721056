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


def stat_line(steal, n_cpus=32):
    # 32 per-cpu lines by default: the bench host's shape, from which
    # pregate derives its default threshold (r17 ADVICE)
    lines = [f"cpu  100 0 200 30000 40 0 50 {steal} 0 0\n"]
    for n in range(n_cpus):
        lines.append(f"cpu{n} 1 0 2 300 4 0 5 6 0 0\n")
    return "".join(lines)


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

    def test_count_cpus_and_default_threshold(self):
        with tempfile.NamedTemporaryFile("w", suffix=".stat",
                                         delete=False) as f:
            f.write(stat_line(0, n_cpus=4))
            p = f.name
        self.addCleanup(os.unlink, p)
        self.assertEqual(pregate.count_cpus(p), 4)
        # 300 on the 32-cpu bench host, proportional elsewhere
        self.assertEqual(pregate.default_threshold(32), 300)
        self.assertEqual(pregate.default_threshold(4), 38)
        self.assertEqual(pregate.default_threshold(1), 10)  # floor

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

    def snap(self, name, steal, n_cpus=32):
        p = os.path.join(self.dir.name, name)
        with open(p, "w") as f:
            f.write(stat_line(steal, n_cpus))
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

    def test_default_threshold_scales_with_host_cpus(self):
        # 50 jiffies/10s is quiet on 32 cpus (bar 300) but ~1.25% on a
        # 4-cpu host (bar 38): the derived default must flag it (r17
        # ADVICE — the hardcoded 300 meant ~7.5% there)
        ps = [self.snap("a", 1000, n_cpus=4),
              self.snap("b", 1050, n_cpus=4)]
        r = self.run_gate("--samples", "1",
                          *sum((["--stat-file", p] for p in ps), []))
        self.assertEqual(r.returncode, 1, r.stdout + r.stderr)
        self.assertIn("38/10s", r.stdout)
        self.assertIn("4 cpus", r.stdout)

    def test_nonpositive_interval_is_usage_error(self):
        # interval 0 would make the bar 0 with near-0 live deltas
        # (trivially QUIET); negative would make everything NOISY
        for bad in ("0", "-5"):
            r = self.run_gate("--interval", bad)
            self.assertEqual(r.returncode, 2, r.stdout + r.stderr)
            self.assertIn("--interval must be > 0", r.stderr)

    def test_record_writes_verdict_json(self):
        import json
        rec = os.path.join(self.dir.name, "rec.json")
        ps = [self.snap("a", 1000), self.snap("b", 1013),
              self.snap("c", 1013)]
        r = self.run_gate("--samples", "2", "--record", rec,
                          *sum((["--stat-file", p] for p in ps), []))
        self.assertEqual(r.returncode, 0, r.stdout + r.stderr)
        with open(rec) as f:
            d = json.load(f)
        self.assertEqual(d["verdict"], "QUIET")
        self.assertEqual(d["samples_jiffies"], [13, 0])
        self.assertEqual(d["threshold_per_10s"], 300)
        self.assertEqual(d["n_cpus"], 32)
        # freshness timestamp for --stamp's age cap
        import time
        self.assertAlmostEqual(d["recorded_at_epoch"], time.time(),
                               delta=120)
        # a NOISY verdict is recorded too (exit still 1)
        ps2 = [self.snap("d", 1000), self.snap("e", 1900)]
        r = self.run_gate("--samples", "1", "--record", rec,
                          *sum((["--stat-file", p] for p in ps2), []))
        self.assertEqual(r.returncode, 1)
        with open(rec) as f:
            self.assertEqual(json.load(f)["verdict"], "NOISY")

    def test_stamp_injects_record_into_detail(self):
        import json
        import time
        rec = os.path.join(self.dir.name, "rec.json")
        detail = os.path.join(self.dir.name, "detail.json")
        with open(rec, "w") as f:
            json.dump({"samples_jiffies": [13, 0], "verdict": "QUIET",
                       "recorded_at_epoch": time.time() - 500}, f)
        with open(detail, "w") as f:
            json.dump({"queries": {"q01": 1.0}, "steal_pct": 0.1}, f)
        r = self.run_gate("--stamp", rec, detail)
        self.assertEqual(r.returncode, 0, r.stdout + r.stderr)
        with open(detail) as f:
            d = json.load(f)
        self.assertEqual(d["pregate"]["verdict"], "QUIET")
        self.assertEqual(d["queries"], {"q01": 1.0})  # rest untouched
        # the record's age at stamp time is preserved in the artifact
        self.assertAlmostEqual(d["pregate"]["stamp_age_s"], 500, delta=120)
        # re-stamping is allowed but announced
        r = self.run_gate("--stamp", rec, detail)
        self.assertEqual(r.returncode, 0, r.stdout + r.stderr)
        self.assertIn("replacing existing pregate field", r.stdout)

    def test_stamp_refuses_stale_record(self):
        # a QUIET verdict from hours ago cannot corroborate this run's
        # launch window — reusing it would be corroboration laundering
        import json
        import time
        rec = os.path.join(self.dir.name, "stale.json")
        detail = os.path.join(self.dir.name, "detail2.json")
        with open(rec, "w") as f:
            json.dump({"samples_jiffies": [1, 0], "verdict": "QUIET",
                       "recorded_at_epoch": time.time() - 7 * 3600}, f)
        with open(detail, "w") as f:
            json.dump({"queries": {"q01": 1.0}}, f)
        r = self.run_gate("--stamp", rec, detail)
        self.assertEqual(r.returncode, 2, r.stdout + r.stderr)
        self.assertIn("stale", r.stderr)
        with open(detail) as f:
            self.assertNotIn("pregate", json.load(f))  # untouched
        # a future timestamp is a data error too
        with open(rec, "w") as f:
            json.dump({"samples_jiffies": [1, 0], "verdict": "QUIET",
                       "recorded_at_epoch": time.time() + 3600}, f)
        r = self.run_gate("--stamp", rec, detail)
        self.assertEqual(r.returncode, 2)
        self.assertIn("future", r.stderr)

    def test_stamp_refuses_untimestamped_record(self):
        # r18 ADVICE (medium): the pre-r18 compatibility path let anyone
        # bypass the 6h cap by deleting recorded_at_epoch from a stale
        # record. All pre-r18 artifacts are stamped and every record
        # since carries the timestamp, so an untimestamped record is now
        # refused outright (a bool timestamp is equally unusable)
        import json
        rec = os.path.join(self.dir.name, "old.json")
        detail = os.path.join(self.dir.name, "detail3.json")
        for epoch_field in ({}, {"recorded_at_epoch": True},
                            {"recorded_at_epoch": "yesterday"}):
            with open(rec, "w") as f:
                json.dump({"samples_jiffies": [2, 0], "verdict": "QUIET",
                           **epoch_field}, f)
            with open(detail, "w") as f:
                json.dump({"queries": {"q01": 1.0}}, f)
            r = self.run_gate("--stamp", rec, detail)
            self.assertEqual(r.returncode, 2, r.stdout + r.stderr)
            self.assertIn("recorded_at_epoch", r.stderr)
            with open(detail) as f:
                self.assertNotIn("pregate", json.load(f))  # untouched

    def test_stamp_refuses_bad_inputs(self):
        import json
        rec = os.path.join(self.dir.name, "rec.json")
        detail = os.path.join(self.dir.name, "detail.json")
        with open(rec, "w") as f:
            json.dump({"no": "verdict"}, f)
        with open(detail, "w") as f:
            json.dump({"queries": {}}, f)
        r = self.run_gate("--stamp", rec, detail)
        self.assertEqual(r.returncode, 2)
        self.assertIn("no QUIET/NOISY verdict", r.stderr)
        # a target without a queries map is not a bench detail file
        with open(rec, "w") as f:
            json.dump({"samples_jiffies": [1], "verdict": "QUIET"}, f)
        notdetail = os.path.join(self.dir.name, "other.json")
        with open(notdetail, "w") as f:
            json.dump({"metric": "x"}, f)
        r = self.run_gate("--stamp", rec, notdetail)
        self.assertEqual(r.returncode, 2)
        self.assertIn("not a bench detail file", r.stderr)
        r = self.run_gate("--stamp", rec)
        self.assertEqual(r.returncode, 2)

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
