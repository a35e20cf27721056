#!/bin/bash
# Pregate-gated clean-run hunter (optimization rounds): wait for a QUIET
# launch window, run the full sf0.1 bench, keep the detail file under a
# timestamped name, and stop early once a run comes back clean
# (steal < 0.30 % and no degraded windows). Storm-crossing runs are kept
# too — they are renamed _stealhost_* by the operator afterwards.
set -u
cd /root/repo
ATTEMPTS=${1:-4}
for a in $(seq 1 "$ATTEMPTS"); do
  # wait out launch-time storms (up to ~30 min per attempt)
  for w in $(seq 1 60); do
    if python3 tools/pregate.py --record /tmp/pregate_try.json \
        > /tmp/pregate_try.log 2>&1; then
      break
    fi
    sleep 20
  done
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch 'runMain graft.Bench' > "/tmp/bench_try_$a.log" 2>&1
  rc=$?
  steal=$(python3 -c "import json;print(json.load(open('BENCH_DETAIL.json'))['steal_pct'])")
  degraded=$(python3 -c "import json;print(json.load(open('BENCH_DETAIL.json'))['n_degraded'])")
  cold=$(python3 -c "import json;print(json.load(open('BENCH_DETAIL.json'))['value'])")
  python3 tools/pregate.py --stamp /tmp/pregate_try.json BENCH_DETAIL.json \
    > /dev/null 2>&1
  cp BENCH_DETAIL.json "/tmp/bench_detail_try_$a.json"
  echo "attempt $a: rc=$rc cold=$cold steal=$steal degraded=$degraded"
  ok=$(python3 -c "print(1 if $steal < 0.30 and $degraded == 0 else 0)")
  if [ "$ok" = "1" ]; then
    echo "CLEAN_RUN_AT_ATTEMPT_$a"
    break
  fi
done
echo LOOP_DONE
