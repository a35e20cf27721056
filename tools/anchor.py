#!/usr/bin/env python3
"""Regenerate BENCH_ANCHOR.txt from a recorded clean full-suite run.

Usage: python3 tools/anchor.py BENCH_DETAIL.json <commit> [> BENCH_ANCHOR.txt]

Reads the headline per-query colds (the "queries" map — min over the
run's recorded passes) and refuses to emit an anchor file from a run
that is not plausibly clean: any failed query, or a total more than 2x
the 451.67 s round-7 BASELINE anchor (the same bar BenchRetrySpec
enforces on the committed file). The retry policy's thresholds are
3x these values, so a degraded source run would silently defang it.
"""
import json
import sys

GATE_2X = 2 * 451.67

def main() -> int:
    detail_path, commit = sys.argv[1], sys.argv[2]
    with open(detail_path) as f:
        d = json.load(f)
    queries = d["queries"]
    bad = {k: v for k, v in queries.items() if v <= 0}
    if bad or d.get("n_failed", 0) > 0:
        print(f"REFUSED: failed queries in source run: {sorted(bad)}",
              file=sys.stderr)
        return 1
    total = sum(queries.values())
    if total > GATE_2X:
        print(f"REFUSED: source run total {total:.1f}s > {GATE_2X:.1f}s "
              "(2x BASELINE anchor) — degraded run, re-record", file=sys.stderr)
        return 1
    print("# Per-query cold anchor (seconds): headline colds of a recorded")
    print(f"# clean {total:.1f} s full run of commit {commit} at sf0.1 "
          "local[32].")
    print("# Bench.scala reads this to gauge every retry pass: a measurement")
    print("# above max(3, 3x anchor) is treated as degraded and re-measured.")
    print("# Regenerate ONLY from a clean run: python3 tools/anchor.py")
    print("# BENCH_DETAIL.json <commit>  (refuses degraded/failed runs).")
    for name in sorted(queries):
        print(f"{name} {queries[name]:.3f}")
    return 0

if __name__ == "__main__":
    sys.exit(main())
