#!/usr/bin/env python3
"""Ambient-steal pre-gate for recording clean bench evidence runs.

Usage: python3 tools/pregate.py [--samples N] [--interval SEC]
                                [--threshold JIFFIES]
                                [--stat-file PATH ...]   # tests only

Mechanizes the round-16/17 discipline (VERDICT r16 task 3): before
recording a clean sf0.1 run, sample /proc/stat's cpu steal counter
across N intervals (default 2 x 10 s) and refuse to call the host
quiet if any interval's delta exceeds the threshold. --threshold is
expressed as jiffies PER 10 SECONDS (default 300 ~= 1 % of 32 cpus)
and is scaled to the actual --interval, so shortening the interval
cannot silently weaken the gate. A negative delta (counter reset,
or replay snapshots passed out of order) is a data error, not quiet.
Exit 0 = QUIET (record the run), 1 = NOISY (wait out the storm),
2 = usage/data error.

Scope, learned the hard way in r17: this gate filters LAUNCH-TIME
storms only. The co-tenant returns on its own schedule — three r17
runs picked up 0.73-0.77 % run-average steal mid-run after quiet
pre-gates, and one crossed a 1.72 % storm. The post-hoc audit is the
run's own steal_pct field; the naming discipline (_stealhost_* for
storm-crossing runs) still applies after the fact.

--stat-file (repeatable) substitutes recorded /proc/stat snapshots for
the live file, one per reading (N samples need N+1 readings), and
skips the sleep — the selftest path, same pattern as anchor.py/sweep.py
driving synthetic detail files.
"""
import sys
import time


def read_steal(path):
    """Steal jiffies from the first 'cpu ' aggregate line: field 9
    (1-indexed) per proc(5); absent on pre-2.6.11 kernels -> error."""
    with open(path) as f:
        for line in f:
            if line.startswith("cpu "):
                fields = line.split()
                if len(fields) < 9:
                    raise ValueError(f"no steal field in {path!r} cpu line")
                return int(fields[8])
    raise ValueError(f"no 'cpu ' aggregate line in {path!r}")


def gate(deltas, threshold_per_10s, interval):
    """Pure verdict: (quiet, offending deltas). The threshold is a
    jiffies-per-10-seconds rate scaled to the sampling interval;
    negative deltas are unusable data and must be screened by the
    caller before gating."""
    bar = threshold_per_10s * interval / 10.0
    noisy = [d for d in deltas if d > bar]
    return (not noisy, noisy)


def main():
    argv = sys.argv[1:]
    samples, interval, threshold = 2, 10.0, 300
    stat_files = []
    i = 0
    try:
        while i < len(argv):
            if argv[i] == "--samples":
                samples = int(argv[i + 1]); i += 2
            elif argv[i] == "--interval":
                interval = float(argv[i + 1]); i += 2
            elif argv[i] == "--threshold":
                threshold = int(argv[i + 1]); i += 2
            elif argv[i] == "--stat-file":
                stat_files.append(argv[i + 1]); i += 2
            else:
                print(f"unknown arg {argv[i]!r}\n{__doc__}", file=sys.stderr)
                return 2
    except (IndexError, ValueError) as e:
        print(f"bad arguments: {e}\n{__doc__}", file=sys.stderr)
        return 2
    if samples < 1:
        print("need at least one sample interval", file=sys.stderr)
        return 2
    if stat_files and len(stat_files) != samples + 1:
        print(f"--stat-file needs exactly samples+1 ({samples + 1}) "
              f"readings, got {len(stat_files)}", file=sys.stderr)
        return 2
    try:
        deltas = []
        if stat_files:
            readings = [read_steal(p) for p in stat_files]
            deltas = [b - a for a, b in zip(readings, readings[1:])]
        else:
            prev = read_steal("/proc/stat")
            for _ in range(samples):
                time.sleep(interval)
                cur = read_steal("/proc/stat")
                deltas.append(cur - prev)
                prev = cur
    except (OSError, ValueError) as e:
        print(f"cannot read steal counter: {e}", file=sys.stderr)
        return 2
    if any(d < 0 for d in deltas):
        print(f"steal counter went backwards (deltas {deltas}) — counter "
              "reset or snapshots out of order; unusable data",
              file=sys.stderr)
        return 2
    quiet, noisy = gate(deltas, threshold, interval)
    bar = threshold * interval / 10.0
    label = "QUIET" if quiet else "NOISY"
    print(f"pregate: {label} — steal deltas {deltas} jiffies per "
          f"{interval:g}s interval (bar {bar:g}/interval = "
          f"{threshold}/10s; 1% of 32 cpus = 320/10s)")
    if not quiet:
        print(f"  wait out the storm: {noisy} exceed the bar; "
              "re-run until QUIET before recording a _clean run")
    return 0 if quiet else 1


if __name__ == "__main__":
    sys.exit(main())
