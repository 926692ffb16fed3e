#!/usr/bin/env bash
# Multi-JVM executor-kill recovery rehearsal (VERDICT r12 next-round #1):
# run a Verify subset on local-cluster (REAL executor JVMs — the mode
# where task/broadcast serialization and netty shuffle actually cross
# process boundaries), SIGKILL one executor process mid-sweep, and
# require (a) the sweep finished, (b) the scheduler actually observed the
# loss (so the kill landed while the app was live, not after), and
# (c) every dumped query still matches its DuckDB oracle. Exit 0 = all
# three held.
#
# Usage: tools/multijvm_chaos.sh [sfDir] [outDir]
set -u
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/vmj_chaos}
cd "$(dirname "$0")/.."
rm -rf "$OUT" "$OUT.log"
# Heavy-enough sweep that a mid-flight kill has real work to disrupt:
# the geometry chain (pair enumeration, grouping kernel, rays, BVH) plus
# two banded-join dedup queries — the operators whose cross-process
# shuffle/broadcast behavior this rehearsal exists to prove.
QS="q03_filter_project q42_minhash_lsh q50_knn_brute q53_srp_lsh q81_iou_pairs q88_isolated_groups q94_isolated_hits q95_all_rays"

echo "== sweep (one executor will be SIGKILLed mid-run) =="
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER='local-cluster[4,8,8192]' SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Verify $SF $OUT $QS" > "$OUT.log" 2>&1 &
SBT_PID=$!

# Kill only once the sweep is committed mid-flight: at least one query
# dumped AND all four executor JVMs registered. pgrep on the executor
# main class — the chaos.sh lesson (pattern-matching the LAUNCHER kills
# the wrong process) doesn't apply here because CoarseGrainedExecutorBackend
# appears only in real executor JVM command lines.
KILLED=""
for i in $(seq 1 300); do
  kill -0 $SBT_PID 2>/dev/null || break
  N=$(ls -d "$OUT"/q* 2>/dev/null | wc -l)
  EXECS=$(pgrep -fc "CoarseGrained[E]xecutorBackend" || true)
  if [ -z "$KILLED" ] && [ "$N" -ge 1 ] && [ "${EXECS:-0}" -ge 4 ]; then
    VICTIM=$(pgrep -of "CoarseGrained[E]xecutorBackend")
    echo "killing executor JVM $VICTIM after $N/8 dumps ($EXECS executors live)"
    kill -9 "$VICTIM" && KILLED=$VICTIM
  fi
  sleep 1
done
wait $SBT_PID
RC=$?

FAIL=0
if [ -z "$KILLED" ]; then
  echo "!! no executor was killed — sweep finished before the kill window"
  FAIL=1
fi
if [ $RC -ne 0 ]; then
  echo "!! sweep exited rc=$RC (must survive the executor loss)"
  FAIL=1
fi
if grep -qE "Lost executor|ExecutorLostFailure|Executor app-.* (removed|exited)" "$OUT.log"; then
  echo "scheduler observed the executor loss:"
  grep -m2 -E "Lost executor|ExecutorLostFailure" "$OUT.log" | sed 's/^/  /'
else
  echo "!! scheduler never observed an executor loss — kill landed outside the app"
  FAIL=1
fi

echo "== oracle check over the post-recovery dumps =="
python3 tools/check_subset.py "$SF" "$OUT" $QS || FAIL=1

if [ $FAIL -eq 0 ]; then
  echo "MULTIJVM CHAOS: ALL CHECKS GREEN (executor $KILLED killed and recovered)"
else
  echo "MULTIJVM CHAOS: FAILED"
fi
exit $FAIL
