#!/usr/bin/env bash
# Streaming chaos rehearsal driver (VERDICT r11 #6): prep file-backed
# streams from <sfDir>, run the victim JVM (RocksDB sessionizer +
# SegmentStore near-dup ingest), SIGKILL it once both queries have
# committed real progress (so the kill lands mid-stream, with open
# state), then resume from the same checkpoints in a fresh JVM and
# validate exactly-once output + state rehydration. Exit 0 = all checks
# green AND the kill actually interrupted the victim.
#
# Usage: tools/chaos.sh <sfDir> <workDir>
set -u
SF=${1:-/tmp/sf1}
WD=${2:-/tmp/chaos}
cd "$(dirname "$0")/.."

echo "== prep =="
sbt -batch "runMain graft.streaming.ChaosRehearsal prep $SF $WD" 2>&1 | grep -E '"phase"' || exit 2

echo "== victim (will be SIGKILLed mid-stream) =="
sbt -batch "runMain graft.streaming.ChaosRehearsal victim $SF $WD" > "$WD/victim.log" 2>&1 &
SBT_PID=$!

# The victim JVM publishes its own pid (victim.pid) — pattern-matching
# process lists is how round 12's first attempt killed sbt's LAUNCHER
# instead, leaving the app running as an orphan that raced the resume
# phase over the state dir.
VPID=""
for i in $(seq 1 90); do
  [ -f "$WD/victim.pid" ] && { VPID=$(cat "$WD/victim.pid"); break; }
  kill -0 $SBT_PID 2>/dev/null || break
  sleep 2
done
if [ -z "$VPID" ]; then
  echo "!! victim pid never published — rehearsal inconclusive"
  exit 3
fi

# Kill only after ALL THREE queries committed real progress: >=4
# session batches, >=3 state segments, and >=3 late-replay batches
# means the SIGKILL lands mid-stream with open RocksDB state,
# committed-but-unfinished segments, and a live watermark that already
# dropped late rows.
KILLED=0
for i in $(seq 1 180); do
  kill -0 "$VPID" 2>/dev/null || break
  NB=$(ls -d "$WD"/sess_out/batch_* 2>/dev/null | wc -l)
  NS=$(ls -d "$WD"/nd_state/b* 2>/dev/null | wc -l)
  NL=$(ls -d "$WD"/late_out/batch_* 2>/dev/null | wc -l)
  if [ "$NB" -ge 4 ] && [ "$NS" -ge 3 ] && [ "$NL" -ge 3 ]; then
    echo "killing victim JVM $VPID after $NB session batches / $NS state segments / $NL late batches"
    kill -9 "$VPID" && KILLED=1
    break
  fi
  sleep 2
done
wait $SBT_PID 2>/dev/null
# Belt and braces: no victim process may survive into the resume phase.
sleep 2
if pgrep -f "graft.streaming.ChaosRehearsal victim" >/dev/null 2>&1; then
  for PID in $(pgrep -f "graft.streaming.ChaosRehearsal victim"); do
    [ "$PID" != "$$" ] && kill -9 "$PID" 2>/dev/null
  done
  sleep 2
fi
if [ "$KILLED" != 1 ]; then
  echo "!! victim was never killed (finished first or no progress) — rehearsal inconclusive"
  grep -q '"survived":true' "$WD/victim.log" && echo "   (victim log reports it survived)"
  exit 3
fi
if grep -q '"survived":true' "$WD/victim.log"; then
  echo "!! victim completed before the kill landed — rehearsal inconclusive"
  exit 3
fi

echo "== resume + validate =="
sbt -batch "runMain graft.streaming.ChaosRehearsal resume $SF $WD" 2>&1 | tee "$WD/resume.log" | grep -E '"check"|"phase"'
RC=${PIPESTATUS[0]}
echo "resume exit code: $RC"
exit "$RC"
