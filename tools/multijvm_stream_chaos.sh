#!/usr/bin/env bash
# Streaming executor-loss rehearsal (r13): run the RocksDB sessionizer +
# SegmentStore near-dup ingest in local-cluster mode (REAL executor
# JVMs), SIGKILL one EXECUTOR (not the driver/victim JVM) mid-stream,
# and require:
#   (a) the streaming queries SURVIVE the loss and run to completion in
#       the same driver (state reloads from checkpoint onto a
#       replacement executor — a different recovery grain than
#       tools/chaos.sh's whole-JVM death),
#   (b) the scheduler actually observed the executor loss,
#   (c) the resume/validate phase passes every exactly-once check
#       (sessions == batch kernel, dedup set == sequential re-run,
#       zero torn segments).
#
# Usage: tools/multijvm_stream_chaos.sh [sfDir] [workDir]
set -u
SF=${1:-/tmp/sf10}
WD=${2:-/tmp/mjstream}
cd "$(dirname "$0")/.."

echo "== prep =="
sbt -batch "runMain graft.streaming.ChaosRehearsal prep $SF $WD" 2>&1 | grep -E '"phase"' || exit 2

echo "== victim in local-cluster (one EXECUTOR will be SIGKILLed) =="
SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
SPARK_GRAFT_MASTER='local-cluster[3,8,6144]' SPARK_GRAFT_CPUS=24 \
  sbt -batch "runMain graft.streaming.ChaosRehearsal victim $SF $WD" > "$WD/victim.log" 2>&1 &
SBT_PID=$!

KILLED=""
for i in $(seq 1 600); do
  kill -0 $SBT_PID 2>/dev/null || break
  NB=$(ls -d "$WD"/sess_out/batch_* 2>/dev/null | wc -l)
  NS=$(ls -d "$WD"/nd_state/b* 2>/dev/null | wc -l)
  EXECS=$(pgrep -fc "CoarseGrained[E]xecutorBackend" || true)
  if [ -z "$KILLED" ] && [ "$NB" -ge 4 ] && [ "$NS" -ge 2 ] && [ "${EXECS:-0}" -ge 3 ]; then
    VICTIM_EXEC=$(pgrep -of "CoarseGrained[E]xecutorBackend")
    echo "killing executor JVM $VICTIM_EXEC after $NB session batches / $NS segments ($EXECS executors live)"
    kill -9 "$VICTIM_EXEC" && KILLED=$VICTIM_EXEC
  fi
  sleep 1
done
wait $SBT_PID 2>/dev/null

FAIL=0
if [ -z "$KILLED" ]; then
  echo "!! no executor killed — stream finished before the window"
  exit 3
fi
if grep -q '"survived":true' "$WD/victim.log"; then
  echo "victim survived the executor loss and ran both streams to completion"
else
  echo "!! victim did NOT survive — streaming query died with the executor:"
  grep -m3 -E "ERROR|Exception" "$WD/victim.log" | sed 's/^/  /'
  FAIL=1
fi
if grep -qE "Lost executor|ExecutorLostFailure" "$WD/victim.log"; then
  echo "scheduler observed the loss:"
  grep -m1 -E "Lost executor" "$WD/victim.log" | sed 's/^/  /'
else
  echo "!! scheduler never observed an executor loss"
  FAIL=1
fi

echo "== validate (exactly-once checks over the post-loss output) =="
sbt -batch "runMain graft.streaming.ChaosRehearsal resume $SF $WD" 2>&1 | tee "$WD/resume.log" | grep -E '"check"|"phase"'
RC=${PIPESTATUS[0]}
[ "$RC" -ne 0 ] && FAIL=1

if [ $FAIL -eq 0 ]; then
  echo "STREAM EXECUTOR-LOSS CHAOS: ALL CHECKS GREEN (executor $KILLED killed; state reloaded; exactly-once held)"
else
  echo "STREAM EXECUTOR-LOSS CHAOS: FAILED"
fi
exit $FAIL
