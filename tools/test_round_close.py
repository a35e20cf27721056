#!/usr/bin/env python3
"""Selftest for round_close.py --fix (VERDICT r13 task 1).

The --fix contract: stage and commit EXACTLY the round's driver
artifacts (untracked BENCH_r<NN>.json / CORRECTNESS_r<NN>.json, modified
BENCH_DETAIL.json / LEAKCHECK.json) and refuse — committing nothing —
when any other path is dirty. The classification is pure
(classify_fix), so most of the contract is unit-tested with no git; one
end-to-end test drives the real script against the real repo with a
sentinel dirty file and asserts refusal + untouched state (safe: the
refusal path is exactly what it exercises).

Run: python3 tools/test_round_close.py   (also run by RoundCloseSpec in
sbt test so the contract is part of the standard gate).
"""
import os
import subprocess
import sys
import unittest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import round_close  # noqa: E402

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


# the only rounds the e2e refusal tests ever pass to --fix; a regression
# commit can therefore only touch these paths
_SELFTEST_ROUNDS = (97, 98, 99)
_SELFTEST_PATHS = frozenset(
    [f"BENCH_r{n}.json" for n in _SELFTEST_ROUNDS]
    + [f"CORRECTNESS_r{n}.json" for n in _SELFTEST_ROUNDS]
    + ["BENCH_DETAIL.json", "LEAKCHECK.json"])


def _restore_head(recorded_head):
    """If an e2e refusal test regressed and --fix actually committed, drop
    the laundered commit by hard-resetting to the head recorded before the
    test ran (round-16 ADVICE: the finally blocks previously only cleaned
    the files, leaving a bogus commit in history on regression). Guarded
    per round-17/18 ADVICE: only reset if every commit being dropped both
    carries the --fix commit message AND touches only the selftest rounds'
    artifact paths — real round-close commits share the subject (e.g.
    "round 18: track official driver bench/correctness artifacts") but
    commit BENCH_r<real-round>.json, which is outside the selftest set,
    so a legitimate commit landing mid-test survives."""
    head_now = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                              capture_output=True, text=True).stdout.strip()
    if head_now == recorded_head:
        return
    subjects = subprocess.run(
        ["git", "log", "--format=%s", f"{recorded_head}..HEAD"],
        cwd=REPO, capture_output=True, text=True).stdout.splitlines()
    touched = set(subprocess.run(
        ["git", "log", "--format=", "--name-only",
         f"{recorded_head}..HEAD"],
        cwd=REPO, capture_output=True, text=True).stdout.split())
    if subjects and touched and all(
            "track official driver bench/correctness artifacts" in s
            for s in subjects) and touched <= _SELFTEST_PATHS:
        subprocess.run(["git", "reset", "--hard", recorded_head],
                       cwd=REPO, capture_output=True)
    else:
        print(f"_restore_head: NOT resetting {head_now[:9]} -> "
              f"{recorded_head[:9]}: commits in between are not selftest "
              f"--fix commits (subjects {subjects!r}, paths "
              f"{sorted(touched)!r}); clean up by hand", file=sys.stderr)


class ClassifyFix(unittest.TestCase):
    def test_exactly_the_driver_artifacts_commit(self):
        lines = ["?? BENCH_r14.json", "?? CORRECTNESS_r14.json",
                 " M BENCH_DETAIL.json", " M LEAKCHECK.json"]
        to_commit, blockers = round_close.classify_fix(14, lines)
        self.assertEqual(sorted(to_commit),
                         ["BENCH_DETAIL.json", "BENCH_r14.json",
                          "CORRECTNESS_r14.json", "LEAKCHECK.json"])
        self.assertEqual(blockers, [])

    def test_subset_is_fine(self):
        to_commit, blockers = round_close.classify_fix(
            14, ["?? BENCH_r14.json"])
        self.assertEqual(to_commit, ["BENCH_r14.json"])
        self.assertEqual(blockers, [])

    def test_any_other_dirty_path_blocks(self):
        lines = ["?? BENCH_r14.json",
                 " M src/main/scala/graft/SparkEntry.scala"]
        to_commit, blockers = round_close.classify_fix(14, lines)
        self.assertEqual(to_commit, ["BENCH_r14.json"])
        self.assertEqual(blockers,
                         [" M src/main/scala/graft/SparkEntry.scala"])

    def test_wrong_round_artifact_blocks(self):
        # the PREVIOUS round's artifact appearing dirty is not ours to fix
        to_commit, blockers = round_close.classify_fix(
            14, ["?? BENCH_r13.json"])
        self.assertEqual(to_commit, [])
        self.assertEqual(blockers, ["?? BENCH_r13.json"])

    def test_detail_modified_only_not_untracked(self):
        # an UNTRACKED BENCH_DETAIL.json means the tracked one was deleted
        # or the repo layout changed — not the driver-overwrite case
        to_commit, blockers = round_close.classify_fix(
            14, ["?? BENCH_DETAIL.json"])
        self.assertEqual(to_commit, [])
        self.assertEqual(blockers, ["?? BENCH_DETAIL.json"])

    def test_deleted_or_renamed_artifacts_block(self):
        for line in (" D BENCH_DETAIL.json",
                     "R  LEAKCHECK.json -> LEAKCHECK2.json"):
            to_commit, blockers = round_close.classify_fix(14, [line])
            self.assertEqual(to_commit, [], line)
            self.assertEqual(blockers, [line], line)

    def test_official_artifact_modified_not_untracked_blocks(self):
        # a MODIFIED BENCH_r14.json means it was already committed once and
        # the driver (or someone) rewrote it — adjudicate by hand, the
        # second version overwriting tracked evidence is not auto-healable
        to_commit, blockers = round_close.classify_fix(
            14, [" M BENCH_r14.json"])
        self.assertEqual(to_commit, [])
        self.assertEqual(blockers, [" M BENCH_r14.json"])

    def test_clean_tree_is_a_noop(self):
        self.assertEqual(round_close.classify_fix(14, []), ([], []))

    def test_detail_without_the_driver_signature_blocks(self):
        # a modified BENCH_DETAIL.json/LEAKCHECK.json WITHOUT the round's
        # untracked BENCH_r<NN>.json is a builder's local bench that
        # overwrote the tracked file (forgotten copy-then-checkout), not
        # the driver — committing it would launder experimental numbers
        # into a driver-attributed evidence commit (round-14 ADVICE)
        for lines in (
                [" M BENCH_DETAIL.json"],
                [" M BENCH_DETAIL.json", " M LEAKCHECK.json"],
                ["?? CORRECTNESS_r14.json", " M LEAKCHECK.json"]):
            to_commit, blockers = round_close.classify_fix(14, lines)
            self.assertNotIn("BENCH_DETAIL.json", to_commit, lines)
            self.assertNotIn("LEAKCHECK.json", to_commit, lines)
        # the last case still claims the official artifact itself
        self.assertEqual(to_commit, ["CORRECTNESS_r14.json"])
        self.assertEqual(blockers, [" M LEAKCHECK.json"])

    def test_detail_with_the_driver_signature_commits(self):
        to_commit, blockers = round_close.classify_fix(
            14, ["?? BENCH_r14.json", " M BENCH_DETAIL.json"])
        self.assertEqual(sorted(to_commit),
                         ["BENCH_DETAIL.json", "BENCH_r14.json"])
        self.assertEqual(blockers, [])


class OfficialBenchValue(unittest.TestCase):
    """official_bench_value extracts the headline total from the three
    shapes the driver's wrapper has actually produced."""

    def _tmp(self, content):
        import tempfile
        f = tempfile.NamedTemporaryFile(
            "w", suffix=".json", delete=False)
        f.write(content)
        f.close()
        self.addCleanup(os.unlink, f.name)
        return f.name

    def test_parsed_dict(self):
        p = self._tmp('{"n": 14, "parsed": {"value": 268.212}}')
        self.assertEqual(round_close.official_bench_value(p), 268.212)

    def test_tail_fallback_takes_the_last_total_line(self):
        # the tail carries the stderr full line AND the stdout compact
        # line; both hold the same headline, the last wins
        p = self._tmp('{"parsed": null, "tail": "noise '
                      '{\\"metric\\":\\"total\\",\\"value\\":268.212,...} '
                      '{\\"metric\\":\\"total\\",\\"value\\":268.212,'
                      '\\"unit\\":\\"sec\\"}"}')
        self.assertEqual(round_close.official_bench_value(p), 268.212)

    def test_top_level_value(self):
        p = self._tmp('{"value": -1.0}')
        self.assertEqual(round_close.official_bench_value(p), -1.0)

    def test_malformed_parsed_value_falls_through(self):
        # a parsed dict whose value is unparsable must NOT disable the
        # mismatch gate — the top-level and tail forms may still carry
        # the headline (round-15 ADVICE)
        p = self._tmp('{"parsed": {"value": "n/a"}, "value": 268.212}')
        self.assertEqual(round_close.official_bench_value(p), 268.212)
        p = self._tmp('{"parsed": {"value": null}, "tail": '
                      '"{\\"metric\\":\\"total\\",\\"value\\":268.212}"}')
        self.assertEqual(round_close.official_bench_value(p), 268.212)
        # when no other form exists either, it is still undeterminable
        p = self._tmp('{"parsed": {"value": "n/a"}}')
        self.assertIsNone(round_close.official_bench_value(p))

    def test_undeterminable_is_none(self):
        self.assertIsNone(round_close.official_bench_value("/nonexistent"))
        self.assertIsNone(
            round_close.official_bench_value(self._tmp('{"n": 14}')))
        self.assertIsNone(
            round_close.official_bench_value(self._tmp('not json')))

    def test_non_object_top_level_is_none_not_a_crash(self):
        # valid JSON whose top level is an array has no .get — must be
        # undeterminable, not an AttributeError (round-16 ADVICE)
        self.assertIsNone(
            round_close.official_bench_value(self._tmp('[1, 2, 3]')))
        self.assertIsNone(
            round_close.official_bench_value(self._tmp('"a string"')))


class LeakcheckRefusal(unittest.TestCase):
    """leakcheck_refusal: the pure content-corroboration gate for
    LEAKCHECK.json (round-16 ADVICE hardening)."""

    def test_matching_int_stamp_passes(self):
        self.assertIsNone(round_close.leakcheck_refusal({"round": 16}, 16))

    def test_matching_string_stamp_passes(self):
        # a driver that stamps the round as a string is still this
        # round's file — normalize, don't falsely refuse
        self.assertIsNone(round_close.leakcheck_refusal({"round": "16"}, 16))

    def test_missing_stamp_passes_on_signature_alone(self):
        self.assertIsNone(round_close.leakcheck_refusal({"n_hits": 0}, 16))

    def test_mismatching_stamp_refuses_int_and_string(self):
        for stamp in (42, "42"):
            reason = round_close.leakcheck_refusal({"round": stamp}, 16)
            self.assertIsNotNone(reason, stamp)
            self.assertIn("round=42", reason)

    def test_non_object_top_level_refuses_cleanly(self):
        # a top-level array previously crashed --fix with an uncaught
        # AttributeError instead of the normal refusal message
        for doc in ([1, 2], "scan", 3.5, None):
            reason = round_close.leakcheck_refusal(doc, 16)
            self.assertIsNotNone(reason, repr(doc))
            self.assertIn("not an object", reason)

    def test_non_numeric_stamp_refuses_cleanly(self):
        reason = round_close.leakcheck_refusal({"round": "sixteen"}, 16)
        self.assertIsNotNone(reason)
        self.assertIn("not a round number", reason)


class FixCommitFailure(unittest.TestCase):
    def test_commit_error_unstages_and_returns_false(self):
        # a failing `git commit` (hook failure, missing identity) must
        # surface its stderr and leave the index as it found it — the
        # refusal contract extends to commit errors (round-14 ADVICE)
        artifact = os.path.join(REPO, "BENCH_r97.json")
        with open(artifact, "w") as f:
            f.write('{"parsed": {"value": 1.0}}')
        calls = []
        real_run = round_close.subprocess.run

        def fake_run(cmd, **kw):
            calls.append(cmd)
            if cmd[:2] == ["git", "status"]:
                return subprocess.CompletedProcess(
                    cmd, 0, stdout="?? BENCH_r97.json\n", stderr="")
            if cmd[:2] == ["git", "add"]:
                return subprocess.CompletedProcess(cmd, 0, "", "")
            if cmd[:2] == ["git", "commit"]:
                raise subprocess.CalledProcessError(
                    1, cmd, output="", stderr="fatal: empty ident\n")
            if cmd[:2] == ["git", "reset"]:
                return subprocess.CompletedProcess(cmd, 0, "", "")
            return real_run(cmd, **kw)

        round_close.subprocess.run = fake_run
        try:
            cwd = os.getcwd()
            os.chdir(REPO)
            try:
                ok = round_close.fix(97)
            finally:
                os.chdir(cwd)
        finally:
            round_close.subprocess.run = real_run
            os.unlink(artifact)
        self.assertFalse(ok, "fix must report failure on a commit error")
        resets = [c for c in calls if c[:2] == ["git", "reset"]]
        self.assertEqual(resets,
                         [["git", "reset", "HEAD", "--", "BENCH_r97.json"]],
                         "the staged artifact must be unstaged")


class FixEndToEnd(unittest.TestCase):
    def test_refuses_and_commits_nothing_on_a_blocker(self):
        out = subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                             capture_output=True, text=True).stdout
        if out.strip():
            self.skipTest("repo dirty — the refusal e2e needs a clean tree")
        head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                              capture_output=True, text=True).stdout.strip()
        sentinel = os.path.join(REPO, "FIX_SELFTEST_SENTINEL.txt")
        with open(sentinel, "w") as f:
            f.write("unrelated dirty file --fix must refuse to touch\n")
        try:
            r = subprocess.run(
                [sys.executable, "tools/round_close.py", "--fix", "99"],
                cwd=REPO, capture_output=True, text=True)
            self.assertEqual(r.returncode, 1, r.stdout + r.stderr)
            self.assertIn("REFUSED", r.stdout)
            # nothing committed, sentinel untouched and still untracked
            head2 = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                                   capture_output=True,
                                   text=True).stdout.strip()
            self.assertEqual(head, head2, "--fix committed despite a blocker")
            self.assertTrue(os.path.isfile(sentinel))
            status = subprocess.run(["git", "status", "--porcelain"],
                                    cwd=REPO, capture_output=True,
                                    text=True).stdout
            self.assertIn("?? FIX_SELFTEST_SENTINEL.txt", status)
        finally:
            _restore_head(head)
            if os.path.exists(sentinel):
                os.unlink(sentinel)

    def test_refuses_a_detail_mismatching_the_official_headline(self):
        # driver signature present (untracked BENCH_r97.json) but the
        # modified BENCH_DETAIL.json carries a DIFFERENT headline total:
        # a builder bench overwrote the detail after the driver ran —
        # --fix must refuse rather than commit it as driver evidence
        out = subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                             capture_output=True, text=True).stdout
        if out.strip():
            self.skipTest("repo dirty — the refusal e2e needs a clean tree")
        head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                              capture_output=True, text=True).stdout.strip()
        artifact = os.path.join(REPO, "BENCH_r97.json")
        detail = os.path.join(REPO, "BENCH_DETAIL.json")
        with open(artifact, "w") as f:
            f.write('{"parsed": {"value": 123.456}}')
        with open(detail, "w") as f:
            f.write('{"metric":"total","value":1.0,"unit":"sec"}')
        try:
            r = subprocess.run(
                [sys.executable, "tools/round_close.py", "--fix", "97"],
                cwd=REPO, capture_output=True, text=True)
            self.assertEqual(r.returncode, 1, r.stdout + r.stderr)
            self.assertIn("does not match", r.stdout)
            head2 = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                                   capture_output=True,
                                   text=True).stdout.strip()
            self.assertEqual(head, head2,
                             "--fix committed a mismatching detail")
            # nothing left staged either
            staged = subprocess.run(
                ["git", "diff", "--cached", "--name-only"], cwd=REPO,
                capture_output=True, text=True).stdout
            self.assertEqual(staged.strip(), "")
        finally:
            _restore_head(head)
            if os.path.exists(artifact):
                os.unlink(artifact)
            subprocess.run(["git", "checkout", "--", "BENCH_DETAIL.json"],
                           cwd=REPO, capture_output=True)

    def test_refuses_a_leakcheck_stamped_for_another_round(self):
        # driver signature present (untracked BENCH_r97.json) but the
        # modified LEAKCHECK.json carries a different round stamp: a
        # stale or local scan overwrote the tracked file — --fix must
        # refuse rather than commit it as this round's driver evidence
        # (round-15 ADVICE)
        out = subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                             capture_output=True, text=True).stdout
        if out.strip():
            self.skipTest("repo dirty — the refusal e2e needs a clean tree")
        head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                              capture_output=True, text=True).stdout.strip()
        artifact = os.path.join(REPO, "BENCH_r97.json")
        leak = os.path.join(REPO, "LEAKCHECK.json")
        with open(artifact, "w") as f:
            f.write('{"parsed": {"value": 123.456}}')
        with open(leak, "w") as f:
            f.write('{"round": 42, "n_hits": 0, "hits": {}}')
        try:
            r = subprocess.run(
                [sys.executable, "tools/round_close.py", "--fix", "97"],
                cwd=REPO, capture_output=True, text=True)
            self.assertEqual(r.returncode, 1, r.stdout + r.stderr)
            self.assertIn("round=42", r.stdout)
            head2 = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                                   capture_output=True,
                                   text=True).stdout.strip()
            self.assertEqual(head, head2,
                             "--fix committed a mis-stamped leakcheck")
            staged = subprocess.run(
                ["git", "diff", "--cached", "--name-only"], cwd=REPO,
                capture_output=True, text=True).stdout
            self.assertEqual(staged.strip(), "")
        finally:
            _restore_head(head)
            if os.path.exists(artifact):
                os.unlink(artifact)
            subprocess.run(["git", "checkout", "--", "LEAKCHECK.json"],
                           cwd=REPO, capture_output=True)

    def test_refuses_an_unparseable_driver_artifact(self):
        # a partial driver write (truncated JSON) must not be committed
        # as official evidence, even though the path itself is allowed
        out = subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                             capture_output=True, text=True).stdout
        if out.strip():
            self.skipTest("repo dirty — the refusal e2e needs a clean tree")
        head = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                              capture_output=True, text=True).stdout.strip()
        artifact = os.path.join(REPO, "BENCH_r98.json")
        with open(artifact, "w") as f:
            f.write('{"metric":"total","value":')  # truncated mid-write
        try:
            r = subprocess.run(
                [sys.executable, "tools/round_close.py", "--fix", "98"],
                cwd=REPO, capture_output=True, text=True)
            self.assertEqual(r.returncode, 1, r.stdout + r.stderr)
            self.assertIn("not valid JSON", r.stdout)
            head2 = subprocess.run(["git", "rev-parse", "HEAD"], cwd=REPO,
                                   capture_output=True,
                                   text=True).stdout.strip()
            self.assertEqual(head, head2,
                             "--fix committed an unparseable artifact")
        finally:
            _restore_head(head)
            if os.path.exists(artifact):
                os.unlink(artifact)


if __name__ == "__main__":
    unittest.main(verbosity=2)
