#!/usr/bin/env python3
"""Regenerate BENCH_ANCHOR.txt from recorded clean full-suite runs.

Usage: python3 tools/anchor.py <commit> DETAIL.json [DETAIL2.json ...]
       [> BENCH_ANCHOR.txt]

Each anchor is the per-query MIN of the headline colds (the "queries"
map — itself min over each run's recorded passes) across the given
runs of the SAME code: the tightest defensible estimate of a query's
clean cold cost, which is what the retry policy's 3x thresholds key
off. Refuses any source run that is not plausibly clean: a failed
query, or a total more than 2x the 451.67 s round-7 BASELINE anchor
(the same bar BenchRetrySpec enforces on the committed file) — a
degraded source run would silently defang the policy.
"""
import json
import sys

GATE_2X = 2 * 451.67

def main() -> int:
    commit, paths = sys.argv[1], sys.argv[2:]
    anchors = {}
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
            anchors[k] = min(anchors.get(k, v), v)
    print("# Per-query cold anchor (seconds): per-query MIN of the headline")
    print(f"# colds across {len(paths)} recorded clean full run(s) of commit "
          f"{commit}")
    print(f"# at sf0.1 local[32] (run totals: "
          f"{', '.join(f'{t:.1f}' for t in totals)} s; "
          f"anchor sum {sum(anchors.values()):.1f} s).")
    print("# Bench.scala reads this to gauge every retry pass: a measurement")
    print("# above max(3, 3x anchor) is treated as degraded and re-measured.")
    print("# Regenerate ONLY from clean runs: python3 tools/anchor.py")
    print("# <commit> BENCH_DETAIL.json [...]  (refuses degraded/failed runs).")
    for name in sorted(anchors):
        print(f"{name} {anchors[name]:.3f}")
    return 0

if __name__ == "__main__":
    sys.exit(main())
