#!/usr/bin/env python3
"""Executable round-close checklist (VERDICT r11 task 2).

Every check below already existed as prose in BASELINE.md's round-close
checklist or as an sbt test — and for three consecutive rounds the prose
was skipped (the official BENCH/CORRECTNESS artifacts sat untracked at
round close). This script composes the checks so skipping one fails
loudly instead of silently:

  (a) `git status` is clean — nothing untracked, nothing modified;
  (b) the current round's official driver artifacts
      (BENCH_r<NN>.json + CORRECTNESS_r<NN>.json) are git-tracked;
  (c) every reference citation in src/ resolves (check_citations.py);
  (d) BENCH_ANCHOR.txt re-derives exactly from its own machine-readable
      provenance header (same derivation AnchorPolicySpec pins in sbt
      test — duplicated here so the close check needs no JVM);
  (e) PLANS.json records ZERO cartesian products fleet-wide.

Usage: python3 tools/round_close.py [--fix] [round]
`round` defaults to the highest N with a BENCH_r<NN>.json present —
pass it explicitly when closing a round whose artifacts the driver has
not written yet (the check then fails, which is the point: close AFTER
the driver artifacts land and are committed).

--fix (VERDICT r13 task 1): the driver writes its official artifacts
AFTER the builder's last commit by construction, so for five straight
rounds (r9-r13) they sat untracked at judge time despite this checklist
naming them. --fix self-heals exactly that case: when the ONLY dirty
paths are the round's driver artifacts — untracked BENCH_r<NN>.json /
CORRECTNESS_r<NN>.json and modified BENCH_DETAIL.json / LEAKCHECK.json
(the two tracked files the driver overwrites in place) — it stages and
commits precisely those files with a fixed message, then runs the
checklist. ANY other dirty path is a blocker: --fix refuses and commits
nothing (it must never launder unrelated work into an artifact commit).
Each artifact must parse as JSON before it is committed (a partial
driver write must not be enshrined as evidence). The modified detail
files are only claimable when the round's untracked BENCH_r<NN>.json is
dirty alongside them AND BENCH_DETAIL.json's headline total matches the
official artifact's (round-14 ADVICE): a local bench run overwrites
BENCH_DETAIL.json in place, so a forgotten copy-then-checkout must not
be laundered into a driver-attributed evidence commit. LEAKCHECK.json
gets the analogous content check (round-15 ADVICE): its "round" stamp
must match the round being closed when the field is present.

Exit 0 = the round is closeable; nonzero = the listing says what's left.
"""
import json
import os
import re
import statistics
import subprocess
import sys


def check(name, ok, detail=""):
    print(f"  [{'ok' if ok else 'FAIL'}] {name}" + (f" — {detail}" if detail else ""))
    return ok


def git_clean():
    out = subprocess.run(["git", "status", "--porcelain"],
                         capture_output=True, text=True, check=True).stdout
    dirty = [l for l in out.splitlines() if l.strip()]
    return check("git status clean", not dirty,
                 "" if not dirty else f"{len(dirty)} dirty/untracked: "
                 + ", ".join(l.split()[-1] for l in dirty[:8]))


def artifacts_tracked(rnd):
    tracked = set(subprocess.run(["git", "ls-files"], capture_output=True,
                                 text=True, check=True).stdout.split())
    ok = True
    for f in (f"BENCH_r{rnd:02d}.json", f"CORRECTNESS_r{rnd:02d}.json"):
        ok &= check(f"{f} tracked", f in tracked,
                    "" if f in tracked else "official driver artifact missing "
                    "from git — the r9/r10/r11 recurring failure mode")
    # the round's full per-query detail must survive too (the official r8
    # detail was lost as an uncommitted working-tree file)
    details = [f for f in tracked
               if re.fullmatch(rf"BENCH_DETAIL_r{rnd:02d}\w*\.json", f)]
    ok &= check(f"a BENCH_DETAIL_r{rnd:02d}* evidence file tracked",
                bool(details), ", ".join(details[:4]) if details else
                "commit the round's per-query detail "
                f"(e.g. BENCH_DETAIL_r{rnd:02d}_clean.json)")
    return ok


def citations():
    r = subprocess.run([sys.executable, "tools/check_citations.py"],
                       capture_output=True, text=True)
    return check("reference citations resolve", r.returncode == 0,
                 "" if r.returncode == 0 else r.stdout.strip().splitlines()[0])


def _flat_map(text, name):
    """Extract a flat string→float json map by name (no nested braces).
    Tolerates whitespace after the colons: Bench.scala writes compact
    JSON but pregate.py --stamp rewrites stamped details with python's
    default '": "' separators (first hit: the r18 anchor sources)."""
    m = re.search(r'"%s"\s*:\s*\{([^}]*)\}' % name, text)
    out = {}
    if m and m.group(1).strip():
        for kv in m.group(1).split(","):
            k, v = kv.split(":", 1)
            out[k.strip().strip('"')] = float(v)
    return out


def anchors():
    """Re-derive BENCH_ANCHOR.txt from its '# stat:'/'# basis:'/'# source:'
    header — the same check AnchorPolicySpec runs in sbt test, JVM-free
    here. Under basis first-on-retry (r12 verdict task: retry wins are
    warm-biased), a run's observation for q is its first throw when the
    run's headline win was a retry, else the headline cold."""
    with open("BENCH_ANCHOR.txt") as f:
        lines = f.read().splitlines()
    stat = next((l.split(":", 1)[1].strip() for l in lines
                 if l.startswith("# stat:")), "")
    basis = next((l.split(":", 1)[1].strip() for l in lines
                  if l.startswith("# basis:")), "headline")
    decl_sf = next((l.split(":", 1)[1].strip() for l in lines
                    if l.startswith("# sf:")), "")
    sources = [l.split(":", 1)[1].strip() for l in lines
               if l.startswith("# source:")]
    anchors = {}
    for l in lines:
        l = l.strip()
        if l and not l.startswith("#"):
            k, v = l.split()
            anchors[k] = float(v)
    if (stat not in ("median", "min")
            or basis not in ("headline", "first-on-retry")
            or not sources or not anchors):
        return check("anchor provenance header", False,
                     f"stat={stat!r}, basis={basis!r}, "
                     f"{len(sources)} sources, {len(anchors)} anchors")
    agg = statistics.median if stat == "median" else min
    values = {}
    for p in sources:
        if not os.path.isfile(p):
            return check("anchor source runs committed", False, f"missing {p}")
        with open(p) as f:
            text = f.read()
        # every source run's own scale factor must match the declared
        # "# sf:" header — without this the mixed-sf guard exists only at
        # generation time and a hand-edited file passes (round-14 ADVICE);
        # basenames compared: runs record a machine-local absolute path
        if decl_sf:
            m = re.search(r'"sf"\s*:\s*"([^"]*)"', text)
            run_sf = os.path.basename(m.group(1).rstrip("/")) if m else "?"
            if run_sf != os.path.basename(decl_sf.rstrip("/")):
                return check("anchor sources at the declared sf", False,
                             f"{p} ran at {run_sf!r}, header says {decl_sf!r}")
        queries = _flat_map(text, "queries")
        first = _flat_map(text, "first") if basis == "first-on-retry" else {}
        retry = _flat_map(text, "retry") if basis == "first-on-retry" else {}
        for k, v in queries.items():
            if k in retry and k in first:
                # a failed first pass is clamped negative by Bench; such a
                # run is not a clean anchor source (round-14 ADVICE, medium)
                if first[k] <= 0:
                    return check("anchor sources plausibly clean", False,
                                 f"{p} first pass of {k} failed ({first[k]})")
                v = first[k]
            values.setdefault(k, []).append(v)
    drifted = [k for k, a in anchors.items()
               if k not in values or abs(agg(values[k]) - a) > 0.0005 + 1e-9]
    uncovered = sorted(set(values) - set(anchors))
    ok = not drifted and not uncovered
    return check(f"BENCH_ANCHOR.txt re-derives ({stat}/{basis} over "
                 f"{len(sources)} runs)", ok,
                 "" if ok else f"drifted={drifted[:5]} uncovered={uncovered[:5]}"
                 " — regenerate with tools/anchor.py")


def plans():
    cart = []
    with open("PLANS.json") as f:
        rows = [json.loads(l) for l in f if l.strip()]
    cart = [r["q"] for r in rows if r.get("cartesian", 0) != 0]
    return check(f"PLANS.json cartesians = 0 ({len(rows)} plans)", not cart,
                 "" if not cart else f"cartesian products in: {cart}")


def classify_fix(rnd, porcelain_lines):
    """Split `git status --porcelain` lines into (to_commit, blockers) for
    --fix. to_commit = exactly the round's driver artifacts: untracked
    BENCH_r<NN>.json / CORRECTNESS_r<NN>.json, and modified (never
    untracked, never staged-with-other-changes) BENCH_DETAIL.json /
    LEAKCHECK.json — the latter two ONLY when the round's untracked
    BENCH_r<NN>.json is dirty alongside them (the driver signature:
    the driver overwrites the detail files in the same run that emits
    the official artifact, whereas a local builder bench overwrites
    BENCH_DETAIL.json alone — a forgotten copy-then-checkout must not
    be laundered into a driver-attributed evidence commit, round-14
    ADVICE medium). EVERYTHING else dirty is a blocker — --fix must
    refuse to touch any other file. Pure: no git calls, unit-testable."""
    untracked_ok = {f"BENCH_r{rnd:02d}.json", f"CORRECTNESS_r{rnd:02d}.json"}
    modified_ok = {"BENCH_DETAIL.json", "LEAKCHECK.json"}
    lines = [l for l in porcelain_lines if l.strip()]
    driver_sig = any(l[:2] == "??" and l[3:] == f"BENCH_r{rnd:02d}.json"
                     for l in lines)
    to_commit, blockers = [], []
    for line in lines:
        xy, path = line[:2], line[3:]
        if xy == "??" and path in untracked_ok:
            to_commit.append(path)
        elif xy in (" M", "M ", "MM") and path in modified_ok and driver_sig:
            to_commit.append(path)
        else:
            blockers.append(line)
    return to_commit, blockers


def official_bench_value(path):
    """Best-effort headline total from the driver's BENCH_r<NN>.json.
    The driver's wrapper records either a parsed compact JSON line
    ("parsed") or only the raw stdout tail ("tail", when its own parse
    failed) — extract the value from whichever exists. None when
    undeterminable; pure given the file, unit-testable."""
    try:
        with open(path) as f:
            d = json.load(f)
    except (OSError, ValueError):
        return None
    if not isinstance(d, dict):
        return None  # valid JSON but not an object (e.g. top-level array)
    parsed = d.get("parsed")
    if isinstance(parsed, dict) and "value" in parsed:
        try:
            return float(parsed["value"])
        except (TypeError, ValueError):
            pass  # malformed parsed value: the top-level/tail forms may
            # still carry the headline (round-15 ADVICE — returning None
            # here silently disabled the BENCH_DETAIL mismatch gate)
    if isinstance(d.get("value"), (int, float)):
        return float(d["value"])
    tail = d.get("tail")
    if isinstance(tail, str):
        m = re.findall(r'"metric":"total","value":(-?\d+(?:\.\d+)?)', tail)
        if m:
            return float(m[-1])
    return None


def leakcheck_refusal(leak_doc, rnd):
    """Content corroboration for LEAKCHECK.json (round-15 ADVICE low,
    hardened per round-16 ADVICE): the driver stamps the round it scanned
    for, so a stale or locally-regenerated file claiming a different round
    must not be committed with driver attribution. Returns a refusal
    reason, or None when the file corroborates (or carries no stamp — the
    signature gate alone holds then). Pure; unit-tested directly.

    Round-16 hardening: a non-dict top level (valid JSON array) no longer
    crashes with AttributeError, and the round stamp is normalized with
    int() before comparing so a driver that stamps "16" as a string is
    not falsely refused."""
    if not isinstance(leak_doc, dict):
        return ("LEAKCHECK.json top level is not an object — not a driver "
                "leak scan; refusing to commit it with driver attribution")
    leak_round = leak_doc.get("round")
    if leak_round is None:
        return None
    try:
        leak_round = int(leak_round)
    except (ValueError, TypeError):
        return (f"LEAKCHECK.json round={leak_round!r} is not a round "
                "number — cannot corroborate the file against this "
                "round's official driver scan")
    if leak_round != rnd:
        return (f"LEAKCHECK.json round={leak_round} does not match the "
                f"round being closed ({rnd}) — a run other than this "
                "round's official driver scan overwrote the tracked file "
                "(copy-then-`git checkout` it, then re-run)")
    return None


def fix(rnd):
    """Self-heal the recurring driver-artifact close failure (see module
    docstring). Returns True when the working tree is ready for the
    checklist (committed the artifacts, or nothing to do), False when
    blockers forced a refusal."""
    out = subprocess.run(["git", "status", "--porcelain"],
                         capture_output=True, text=True, check=True).stdout
    to_commit, blockers = classify_fix(rnd, out.splitlines())
    if blockers:
        print(f"--fix REFUSED: {len(blockers)} dirty path(s) that are not "
              f"round-{rnd} driver artifacts — commit or clean them "
              "yourself, --fix only ever touches the driver's files:")
        for b in blockers[:10]:
            print(f"    {b}")
        return False
    if not to_commit:
        print("--fix: no dirty driver artifacts — nothing to do")
        return True
    for p in to_commit:
        try:
            with open(p) as f:
                json.load(f)
        except (OSError, ValueError) as e:
            print(f"--fix REFUSED: {p} is not valid JSON ({e}) — a partial "
                  "driver write must not be committed as evidence")
            return False
    # belt-and-suspenders to the classify_fix driver-signature gate
    # (round-14 ADVICE medium): the detail file must carry the SAME
    # headline total as the official artifact written by the same driver
    # run, else it is a builder's experimental bench that overwrote the
    # tracked file (forgotten copy-then-checkout) and must not be
    # committed with driver attribution. Skipped when the official value
    # is undeterminable — the signature gate still holds then.
    if "BENCH_DETAIL.json" in to_commit:
        official = official_bench_value(f"BENCH_r{rnd:02d}.json")
        try:
            with open("BENCH_DETAIL.json") as f:
                detail = float(json.load(f).get("value"))
        except (OSError, ValueError, TypeError, AttributeError):
            # AttributeError: valid JSON whose top level is not an object
            # (e.g. a list) has no .get — treat like any unreadable value
            detail = None
        if official is not None and detail is not None \
                and abs(official - detail) > 0.0005:
            print(f"--fix REFUSED: BENCH_DETAIL.json value={detail} does not "
                  f"match BENCH_r{rnd:02d}.json's headline {official} — the "
                  "detail was overwritten by a run other than the official "
                  "driver bench (copy-then-`git checkout` it, then re-run)")
            return False
    # the analogous content corroboration for LEAKCHECK.json (round-15
    # ADVICE low): the driver stamps the round it scanned for, so a stale
    # or locally-regenerated file claiming a different round must not be
    # committed with driver attribution. LEAKCHECK has no headline total,
    # so the round stamp is its only content tie to the official run; a
    # file without the field falls back to the signature gate alone.
    if "LEAKCHECK.json" in to_commit:
        with open("LEAKCHECK.json") as f:
            leak_doc = json.load(f)
        reason = leakcheck_refusal(leak_doc, rnd)
        if reason is not None:
            print(f"--fix REFUSED: {reason}")
            return False
    subprocess.run(["git", "add", "--"] + to_commit, check=True)
    msg = (f"round {rnd}: track official driver bench/correctness artifacts"
           f"\n\nCommitted by round_close.py --fix: {', '.join(sorted(to_commit))}."
           "\nThe driver writes these after the builder's last commit by"
           "\nconstruction, so the builder can never see its own round close"
           "\ngreen without this automation (VERDICT r13 task 1).")
    try:
        subprocess.run(["git", "commit", "-m", msg], check=True,
                       capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        # the refusal contract (commit nothing on failure) must also hold
        # for commit errors: surface the captured stderr instead of an
        # opaque traceback, unstage what was staged (round-14 ADVICE)
        print("--fix: git commit FAILED — unstaging, nothing committed:")
        for stream in (e.stderr, e.stdout):
            if stream:
                print("    " + stream.strip().replace("\n", "\n    "))
        subprocess.run(["git", "reset", "HEAD", "--"] + to_commit,
                       capture_output=True)
        return False
    print(f"--fix: committed {len(to_commit)} driver artifact(s): "
          + ", ".join(sorted(to_commit)))
    return True


def main():
    os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    args = sys.argv[1:]
    do_fix = "--fix" in args
    args = [a for a in args if a != "--fix"]
    if args:
        rnd = int(args[0])
    else:
        have = [int(m.group(1)) for f in os.listdir(".")
                if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))]
        rnd = max(have)
    if do_fix and not fix(rnd):
        return 1
    print(f"round-close checklist (round {rnd}):")
    ok = True
    for fn in (git_clean, lambda: artifacts_tracked(rnd), citations,
               anchors, plans):
        ok &= fn()
    print("CLOSEABLE" if ok else "NOT CLOSEABLE — fix the FAIL lines above")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
