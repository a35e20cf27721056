#!/usr/bin/env python3
"""Per-query regression sweep between two sets of clean bench runs.

Usage: python3 tools/sweep.py --base DETAIL.json [...] --new DETAIL.json [...]

Compares per-query HONEST colds under the first-on-retry basis (a run's
observation for q is its first throw when the run's headline win was a
retry, else the headline cold — the round-13 anchor-policy basis, see
BASELINE.md). Best-of-runs on both sides. The r11/r12 sweeps compared
retry-win headlines instead, which manufactured a known-artifact flag
every round (q100: 0.97 s retry-win "cold" vs a stable 3.5-4.3 s first
throw — flagged as a 1.9x "regression" that was never real).

Flags a query when BOTH:
  - new_best > 1.5x base_best (the degraded-eligible bar), AND
  - new_best > 3 s (the retry jitter floor — sub-second churn is noise).

Each flag line also carries the per-side MEDIANS across runs, and the
summary carries each run's run-average steal_pct plus its stamped
launch-time pregate verdict when present (round-16/18 VERDICT task 7): on a steal-storm day the r16 adjudication needed per-query medians
plus the steal context assembled by hand from six detail files — with
them inline, one sweep command answers "is this flag code or weather"
directly (a flag whose medians agree while only one side's best is off,
on runs with elevated steal, is weather).

Exit 0 = no flags and no gone queries; 1 = flags listed (adjudicate from
the raw first/warm columns before calling it a regression) AND/OR queries
present in base but missing from new ("gone" lines — a silently dropped
query must fail the sweep too); 2 = usage/data error.
"""
import json
import statistics
import sys


_SFS = set()


def observations(path):
    """(per-query honest-cold dict, run-average steal_pct or None,
    stamped pregate verdict or None)."""
    try:
        with open(path) as f:
            d = json.load(f)
    except (OSError, ValueError) as e:
        # a typo'd path or truncated file is a data error (documented
        # exit 2), not a traceback
        print(f"REFUSED: cannot load {path}: {e}", file=sys.stderr)
        sys.exit(2)
    if not isinstance(d, dict) or "queries" not in d:
        print(f"REFUSED: {path} is not a bench detail file "
              "(no 'queries' map)", file=sys.stderr)
        sys.exit(2)
    if d.get("n_failed", 0) > 0:
        print(f"REFUSED: {path} has failed queries — not a clean run",
              file=sys.stderr)
        sys.exit(2)
    _SFS.add(d.get("sf", "?"))
    if len(_SFS) > 1:
        # an sf0.01 run against sf0.1 bases (or vice versa) produces
        # nonsense ratios on every query
        print(f"REFUSED: mixed scale factors across runs: {sorted(_SFS)}",
              file=sys.stderr)
        sys.exit(2)
    queries, first, retry = d["queries"], d.get("first", {}), d.get("retry", {})
    # Bench clamps a FAILED first pass negative in "first"; a retry-rescued
    # run has n_failed=0, so the check above misses it — substituting the
    # negative value would poison the best-of minima (round-14 ADVICE)
    bad = sorted(k for k in retry if k in first and first[k] <= 0)
    if bad:
        print(f"REFUSED: {path} first pass failed for {bad} — retry-rescued "
              "run, not comparable under the first-on-retry basis",
              file=sys.stderr)
        sys.exit(2)
    steal = d.get("steal_pct")
    if not isinstance(steal, (int, float)):
        steal = None
    pregate = d.get("pregate")
    verdict = pregate.get("verdict") if isinstance(pregate, dict) else None
    if verdict not in ("QUIET", "NOISY"):
        verdict = None
    return ({k: (first[k] if k in retry and k in first else v)
             for k, v in queries.items()}, steal, verdict)


def collect(paths):
    """(per-query list of observations across runs, per-run steal list,
    per-run pregate verdict list)."""
    values, steals, pregates = {}, [], []
    for p in paths:
        obs, steal, verdict = observations(p)
        steals.append(steal)
        pregates.append(verdict)
        for k, v in obs.items():
            values.setdefault(k, []).append(v)
    return values, steals, pregates


def _steal_str(steals):
    return "[" + ", ".join("?" if s is None else f"{s:.2f}"
                           for s in steals) + "]"


def _pregate_str(pregates):
    return "[" + ", ".join("-" if v is None else v for v in pregates) + "]"


def main():
    argv = sys.argv[1:]
    if "--base" not in argv or "--new" not in argv:
        print(__doc__, file=sys.stderr)
        return 2
    b = argv.index("--base")
    n = argv.index("--new")
    base_paths = argv[b + 1:n] if b < n else argv[b + 1:]
    new_paths = argv[n + 1:b] if n < b else argv[n + 1:]
    if not base_paths or not new_paths:
        print("need at least one file on each side", file=sys.stderr)
        return 2
    base_all, base_steals, base_pregates = collect(base_paths)
    new_all, new_steals, new_pregates = collect(new_paths)
    base = {k: min(vs) for k, vs in base_all.items()}
    new = {k: min(vs) for k, vs in new_all.items()}
    flags = []
    for q in sorted(new):
        if q not in base:
            print(f"  [new]  {q}: {new[q]:.2f}s (no base observation)")
            continue
        if new[q] > 1.5 * base[q] and new[q] > 3.0:
            med_b = statistics.median(base_all[q])
            med_n = statistics.median(new_all[q])
            flags.append(f"  [FLAG] {q}: {base[q]:.2f}s -> {new[q]:.2f}s "
                         f"({new[q] / base[q]:.2f}x; medians "
                         f"{med_b:.2f}s -> {med_n:.2f}s)")
    gone = sorted(set(base) - set(new))
    for q in gone:
        print(f"  [gone] {q}: in base runs but not in new runs")
    print(f"sweep: {len(new)} queries, honest-cold best-of "
          f"{len(new_paths)} new vs {len(base_paths)} base run(s), "
          f"{len(flags)} flag(s)")
    print(f"  run steal %: base {_steal_str(base_steals)} "
          f"new {_steal_str(new_steals)} (clean runs observed "
          "0.04-0.77; anchor.py warns >0.8; storms inflate "
          "distributed, see BASELINE.md r16 note)")
    # r18 VERDICT task 7: echo the stamped launch-time pregate verdicts
    # so the one-command regression check also corroborates the clean-set
    # naming ('-' = no stamp: pre-r18 artifacts, twins, sanity runs)
    print(f"  run pregate: base {_pregate_str(base_pregates)} "
          f"new {_pregate_str(new_pregates)}")
    for f_ in flags:
        print(f_)
    return 1 if flags or gone else 0


if __name__ == "__main__":
    sys.exit(main())
