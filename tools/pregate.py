#!/usr/bin/env python3
"""Ambient-steal pre-gate for recording clean bench evidence runs.

Usage: python3 tools/pregate.py [--samples N] [--interval SEC]
                                [--threshold JIFFIES]
                                [--record OUT.json]
                                [--stat-file PATH ...]   # tests only
       python3 tools/pregate.py --stamp RECORD.json BENCH_DETAIL.json

Mechanizes the round-16/17 discipline (VERDICT r16 task 3): before
recording a clean sf0.1 run, sample /proc/stat's cpu steal counter
across N intervals (default 2 x 10 s) and refuse to call the host
quiet if any interval's delta exceeds the threshold. --threshold is
expressed as jiffies PER 10 SECONDS; the default scales with the
host's CPU count as read from the sampled stat file's cpuN lines
(300 jiffies/10s on the 32-cpu bench host ~= 0.94 % steal — r17
ADVICE: a hardcoded 300 would mean 7.5 % on a 4-cpu host), and is
scaled to the actual --interval, so shortening the interval cannot
silently weaken the gate. A negative delta (counter reset, or replay
snapshots passed out of order) is a data error, not quiet.
Exit 0 = QUIET (record the run), 1 = NOISY (wait out the storm),
2 = usage/data error.

--record writes the samples + verdict (+ a recorded_at_epoch
timestamp) as JSON so the decision outlives shell history; after the
bench finishes, --stamp injects that record as a "pregate" field into
the run's BENCH_DETAIL evidence file (VERDICT r17 task 5: a _clean
name is then corroborated by the artifact itself, the way steal_pct
already corroborates storms). --stamp adds the record's age as
stamp_age_s and REFUSES records older than 6 hours OR lacking the
recorded_at_epoch field entirely (r18 ADVICE: an untimestamped record
would bypass the cap) — a pre-gate corroborates the launch window of
THE run it immediately preceded (sf0.1 runs are 7-20 min); a stale
QUIET record stamped into an arbitrary later run would be
corroboration laundering.

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
import json
import sys
import time


def read_steal(path):
    """Steal jiffies from the first 'cpu ' aggregate line: the 8th time
    value per proc(5), i.e. fields[8] after the 'cpu' label; absent on
    pre-2.6.11 kernels -> error."""
    with open(path) as f:
        for line in f:
            if line.startswith("cpu "):
                fields = line.split()
                if len(fields) < 9:
                    raise ValueError(f"no steal field in {path!r} cpu line")
                return int(fields[8])
    raise ValueError(f"no 'cpu ' aggregate line in {path!r}")


def count_cpus(path):
    """Count per-cpu 'cpuN' lines in a stat file; 0 if none (then the
    caller falls back to os.cpu_count())."""
    n = 0
    with open(path) as f:
        for line in f:
            if line.startswith("cpu") and not line.startswith("cpu "):
                n += 1
    return n


def default_threshold(n_cpus):
    """Per-10s jiffy bar scaled to the host: 300 on the 32-cpu bench
    host (~0.94 % steal), proportional elsewhere, floor 10."""
    return max(10, round(300 * n_cpus / 32))


def gate(deltas, threshold_per_10s, interval):
    """Pure verdict: (quiet, offending deltas). The threshold is a
    jiffies-per-10-seconds rate scaled to the sampling interval;
    negative deltas are unusable data and must be screened by the
    caller before gating."""
    bar = threshold_per_10s * interval / 10.0
    noisy = [d for d in deltas if d > bar]
    return (not noisy, noisy)


MAX_STAMP_AGE_S = 6 * 3600.0


def stamp(record_path, detail_path):
    """Inject a --record verdict JSON into a bench detail file as its
    "pregate" field. Refuses records without a verdict, targets that
    are not bench detail files (no "queries" map), records older than
    MAX_STAMP_AGE_S, and records with no recorded_at_epoch at all — a
    stamp must corroborate the real run its pre-gate immediately
    preceded, not manufacture one, and an untimestamped record cannot
    prove freshness. The record's age at stamp time is preserved as
    stamp_age_s."""
    try:
        with open(record_path) as f:
            record = json.load(f)
        with open(detail_path) as f:
            detail = json.load(f)
    except (OSError, ValueError) as e:
        print(f"--stamp: cannot load inputs: {e}", file=sys.stderr)
        return 2
    if not isinstance(record, dict) or record.get("verdict") not in (
            "QUIET", "NOISY"):
        print(f"--stamp: {record_path!r} is not a pregate --record file "
              "(no QUIET/NOISY verdict)", file=sys.stderr)
        return 2
    if not isinstance(detail, dict) or "queries" not in detail:
        print(f"--stamp: {detail_path!r} is not a bench detail file "
              "(no 'queries' map)", file=sys.stderr)
        return 2
    epoch = record.get("recorded_at_epoch")
    if not isinstance(epoch, (int, float)) or isinstance(epoch, bool):
        # r18 ADVICE (medium): the age cap was bypassable by deleting
        # recorded_at_epoch from a stale record. Every record since r18
        # carries the timestamp and the pre-r18 artifacts are already
        # stamped, so an untimestamped record today is either hand-edited
        # or ancient — refuse it rather than stamp with a stdout-only note
        print(f"--stamp: {record_path!r} has no recorded_at_epoch — the "
              "6h freshness cap cannot be enforced on an untimestamped "
              "record; re-run pregate --record (every record since r18 "
              "is timestamped)", file=sys.stderr)
        return 2
    age = time.time() - epoch
    if age < -60:
        print(f"--stamp: record timestamp is {-age:.0f}s in the "
              "future — clock skew or a hand-edited record; refusing",
              file=sys.stderr)
        return 2
    if age > MAX_STAMP_AGE_S:
        print(f"--stamp: record is {age / 3600:.1f}h old (cap "
              f"{MAX_STAMP_AGE_S / 3600:.0f}h) — a pre-gate "
              "corroborates the run it immediately preceded; re-run "
              "pregate --record instead of reusing a stale verdict",
              file=sys.stderr)
        return 2
    record["stamp_age_s"] = round(max(age, 0.0), 1)
    age_note = f" (record age {record['stamp_age_s']:.0f}s)"
    if "pregate" in detail:
        print(f"--stamp: replacing existing pregate field in {detail_path}")
    detail["pregate"] = record
    with open(detail_path, "w") as f:
        json.dump(detail, f)
        f.write("\n")
    print(f"stamped pregate verdict {record['verdict']} "
          f"(deltas {record.get('samples_jiffies')}) into "
          f"{detail_path}{age_note}")
    return 0


def main():
    argv = sys.argv[1:]
    if argv and argv[0] == "--stamp":
        if len(argv) != 3:
            print("--stamp needs exactly RECORD.json DETAIL.json",
                  file=sys.stderr)
            return 2
        return stamp(argv[1], argv[2])
    samples, interval, threshold = 2, 10.0, None
    stat_files = []
    record_path = None
    i = 0
    try:
        while i < len(argv):
            if argv[i] == "--samples":
                samples = int(argv[i + 1]); i += 2
            elif argv[i] == "--interval":
                interval = float(argv[i + 1]); i += 2
            elif argv[i] == "--threshold":
                threshold = int(argv[i + 1]); i += 2
            elif argv[i] == "--record":
                record_path = argv[i + 1]; i += 2
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
    if interval <= 0:
        # interval 0 makes the bar 0 and back-to-back live samples
        # trivially QUIET; negative makes everything NOISY (r17 ADVICE)
        print("--interval must be > 0", file=sys.stderr)
        return 2
    if stat_files and len(stat_files) != samples + 1:
        print(f"--stat-file needs exactly samples+1 ({samples + 1}) "
              f"readings, got {len(stat_files)}", file=sys.stderr)
        return 2
    stat_source = stat_files[0] if stat_files else "/proc/stat"
    try:
        n_cpus = count_cpus(stat_source)
        if n_cpus == 0:
            import os
            n_cpus = os.cpu_count() or 1
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
    if threshold is None:
        threshold = default_threshold(n_cpus)
    quiet, noisy = gate(deltas, threshold, interval)
    bar = threshold * interval / 10.0
    label = "QUIET" if quiet else "NOISY"
    # host capacity over 10 s = n_cpus * 100 jiffies/s * 10 s
    pct_of_host = 100.0 * threshold / (n_cpus * 1000.0)
    print(f"pregate: {label} — steal deltas {deltas} jiffies per "
          f"{interval:g}s interval (bar {bar:g}/interval = "
          f"{threshold}/10s ~= {pct_of_host:.2f}% of {n_cpus} cpus)")
    if not quiet:
        print(f"  wait out the storm: {noisy} exceed the bar; "
              "re-run until QUIET before recording a _clean run")
    if record_path is not None:
        record = {"samples_jiffies": deltas, "interval_s": interval,
                  "threshold_per_10s": threshold, "bar_per_interval": bar,
                  "n_cpus": n_cpus, "verdict": label,
                  "recorded_at_epoch": round(time.time(), 3)}
        try:
            with open(record_path, "w") as f:
                json.dump(record, f)
                f.write("\n")
        except OSError as e:
            print(f"cannot write --record file: {e}", file=sys.stderr)
            return 2
    return 0 if quiet else 1


if __name__ == "__main__":
    sys.exit(main())
