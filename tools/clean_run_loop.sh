#!/bin/bash
# Pregate-gated clean-run hunter (optimization rounds): wait for a QUIET
# launch window, run the full sf0.1 bench, keep the detail file under a
# timestamped name, and stop early once a run comes back clean
# (steal < 0.30 % and no degraded windows). Storm-crossing runs are kept
# too — they are renamed _stealhost_* by the operator afterwards.
#
# r19 ADVICE fixes: (1) if the pregate never passes within an attempt's
# wait budget, the attempt still runs but is marked UNGATED in the log
# and the stale pregate record is removed so it cannot be stamped;
# (2) BENCH_DETAIL.json is read inside one python3 invocation that
# tolerates missing/null fields instead of interpolating raw values
# into a shell-built expression.
set -u
cd /root/repo
ATTEMPTS=${1:-4}
for a in $(seq 1 "$ATTEMPTS"); do
  # wait out launch-time storms (up to ~20 min per attempt)
  gated=0
  rm -f /tmp/pregate_try.json
  for w in $(seq 1 60); do
    if python3 tools/pregate.py --record /tmp/pregate_try.json \
        > /tmp/pregate_try.log 2>&1; then
      gated=1
      break
    fi
    sleep 20
  done
  if [ "$gated" = "0" ]; then
    echo "attempt $a: UNGATED (pregate never passed; running anyway, unstamped)"
    rm -f /tmp/pregate_try.json
  fi
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    sbt -batch 'runMain graft.Bench' > "/tmp/bench_try_$a.log" 2>&1
  rc=$?
  if [ -f /tmp/pregate_try.json ]; then
    python3 tools/pregate.py --stamp /tmp/pregate_try.json BENCH_DETAIL.json \
      > /dev/null 2>&1
  fi
  cp BENCH_DETAIL.json "/tmp/bench_detail_try_$a.json"
  verdict=$(python3 - "$rc" <<'EOF'
import json, sys
rc = sys.argv[1]
try:
    d = json.load(open("BENCH_DETAIL.json"))
    steal = d.get("steal_pct")
    degraded = d.get("n_degraded")
    cold = d.get("value")
    ok = (rc == "0" and isinstance(steal, (int, float)) and steal >= 0
          and steal < 0.30 and degraded == 0)
    print(f"rc={rc} cold={cold} steal={steal} degraded={degraded} "
          f"clean={'1' if ok else '0'}")
except Exception as e:
    print(f"rc={rc} detail_unreadable={e} clean=0")
EOF
)
  echo "attempt $a: $verdict"
  case "$verdict" in
    *clean=1*) echo "CLEAN_RUN_AT_ATTEMPT_$a"; break ;;
  esac
done
echo LOOP_DONE
