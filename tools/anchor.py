#!/usr/bin/env python3
"""Regenerate BENCH_ANCHOR.txt from recorded clean full-suite runs.

Usage: python3 tools/anchor.py [--stat median|min] <commit>
       DETAIL.json [DETAIL2.json ...]  [> BENCH_ANCHOR.txt]

Each anchor is the per-query MEDIAN (default; round-11 policy decision,
see BASELINE.md "Anchor-bias policy") or MIN of the headline colds (the
"queries" map — itself min over each run's recorded passes) across the
given runs of the SAME code. Median over clean runs is the expected
clean cold cost; min (the round 9-10 policy) is the tightest bound but
sits below every achievable run, which guaranteed a background retry
rate even in clean windows (BENCH_r10: 39/242 retried). Refuses any
source run that is not plausibly clean: a failed query, or a total more
than 2x the 451.67 s round-7 BASELINE anchor (the same bar
BenchRetrySpec enforces on the committed file) — a degraded source run
would silently defang the policy.

The header it emits is machine-readable ("# stat:" and "# source:"
lines): AnchorPolicySpec re-derives every anchor from the committed
source runs and fails if the file drifts from the declared statistic.
"""
import json
import statistics
import sys

GATE_2X = 2 * 451.67


def main() -> int:
    argv = sys.argv[1:]
    stat = "median"
    if argv and argv[0] == "--stat":
        stat = argv[1]
        argv = argv[2:]
    if stat not in ("median", "min"):
        print(f"unknown stat {stat!r}", file=sys.stderr)
        return 1
    commit, paths = argv[0], argv[1:]
    values: dict[str, list[float]] = {}
    totals = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        queries = d["queries"]
        bad = sorted(k for k, v in queries.items() if v <= 0)
        if bad or d.get("n_failed", 0) > 0:
            print(f"REFUSED: failed queries in {p}: {bad}", file=sys.stderr)
            return 1
        total = sum(queries.values())
        if total > GATE_2X:
            print(f"REFUSED: {p} total {total:.1f}s > {GATE_2X:.1f}s "
                  "(2x BASELINE anchor) — degraded run, re-record",
                  file=sys.stderr)
            return 1
        totals.append(total)
        for k, v in queries.items():
            values.setdefault(k, []).append(v)
    agg = statistics.median if stat == "median" else min
    anchors = {k: agg(vs) for k, vs in values.items()}
    print(f"# Per-query cold anchor (seconds): per-query {stat.upper()} of")
    print(f"# the headline colds across {len(paths)} recorded clean full "
          f"run(s) of commit {commit}")
    print(f"# at sf0.1 local[32] (run totals: "
          f"{', '.join(f'{t:.1f}' for t in totals)} s; "
          f"anchor sum {sum(anchors.values()):.1f} s).")
    print("# Bench.scala reads this to gauge every retry pass: a measurement")
    print("# above max(3, 3x anchor) is treated as degraded and re-measured.")
    print("# Regenerate ONLY from clean runs: python3 tools/anchor.py")
    print("# <commit> BENCH_DETAIL.json [...]  (refuses degraded/failed runs).")
    print("# Machine-readable provenance (verified by AnchorPolicySpec):")
    print(f"# stat: {stat}")
    for p in paths:
        print(f"# source: {p}")
    for name in sorted(anchors):
        print(f"{name} {anchors[name]:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
