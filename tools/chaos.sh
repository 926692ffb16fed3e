#!/usr/bin/env bash
# Streaming chaos rehearsal driver (VERDICT r11 #6): prep file-backed
# streams from <sfDir>, run the victim JVM (RocksDB sessionizer +
# SegmentStore near-dup ingest), SIGKILL it once both queries have
# committed real progress (so the kill lands mid-stream, with open
# state), then resume from the same checkpoints in a fresh JVM and
# validate exactly-once output + state rehydration. Exit 0 = all checks
# green AND the kill actually interrupted the victim.
#
# r17 (VERDICT r16 #3): the kill is now TARGETED at the restart-
# watermark divergence window. The victim's KillGate listener touches
# <workDir>/kill_now the moment a watermark-ADVANCING late batch
# commits (with all streams past minimum progress); this script polls
# the marker at 50 ms granularity and kills inside the commit->next-
# offsets gap — the only window where committed-but-unpersisted
# EventTimeStats die with the JVM and the recovered run admits extra
# late rows. Because the gap is still a race, the whole flow RETRIES
# (CHAOS_ATTEMPTS, default 4) until the resume leg reports
# late_restart_divergence.surplus_rows > 0 — i.e. until the re-derived
# [lag-1, lag-3] sandwich is actually exercised, not vacuously green.
# A divergence-vacuous-but-green final attempt still exits 0 (the
# exactly-once contract held); the DIVERGENCE_VACUOUS line tells the
# artifact reader the ceiling went unexercised.
#
# Usage: tools/chaos.sh <sfDir> <workDir>
set -u
SF=${1:-/tmp/sf1}
WD=${2:-/tmp/chaos}
ATTEMPTS=${CHAOS_ATTEMPTS:-4}
cd "$(dirname "$0")/.."

run_attempt() {
  echo "== prep =="
  sbt -batch "runMain graft.streaming.ChaosRehearsal prep $SF $WD" 2>&1 | grep -E '"phase"' || return 2

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
    return 3
  fi

  # Primary gate: the victim's KillGate marker (an advancing late batch
  # just committed — kill NOW, inside the stats-loss gap). Polled at
  # 50 ms so the kill beats the next batch's offsets write as often as
  # possible. Fallback after ~6 min of no marker: the old file-count
  # thresholds, so a corpus whose watermark never advances mid-window
  # still gets its mid-stream kill (the rehearsal is then honest about
  # the divergence being unexercised).
  KILLED=0
  for i in $(seq 1 7200); do
    kill -0 "$VPID" 2>/dev/null || break
    if [ -f "$WD/kill_now" ]; then
      echo "killing victim JVM $VPID on KillGate marker: $(cat "$WD/kill_now" 2>/dev/null)"
      kill -9 "$VPID" && KILLED=1
      break
    fi
    if [ "$i" -gt 4800 ]; then
      NB=$(ls -d "$WD"/sess_out/batch_* 2>/dev/null | wc -l)
      NS=$(ls -d "$WD"/nd_state/b* 2>/dev/null | wc -l)
      NL=$(ls -d "$WD"/late_out/batch_* 2>/dev/null | wc -l)
      if [ "$NB" -ge 4 ] && [ "$NS" -ge 3 ] && [ "$NL" -ge 3 ]; then
        echo "killing victim JVM $VPID on fallback thresholds ($NB/$NS/$NL) — no KillGate marker"
        kill -9 "$VPID" && KILLED=1
        break
      fi
    fi
    sleep 0.05
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
    return 3
  fi
  if grep -q '"survived":true' "$WD/victim.log"; then
    echo "!! victim completed before the kill landed — rehearsal inconclusive"
    return 3
  fi

  echo "== resume + validate =="
  sbt -batch "runMain graft.streaming.ChaosRehearsal resume $SF $WD" 2>&1 | tee "$WD/resume.log" | grep -E '"check"|"phase"|divergence'
  return "${PIPESTATUS[0]}"
}

LAST_RC=3
for a in $(seq 1 "$ATTEMPTS"); do
  echo "==== chaos attempt $a/$ATTEMPTS ===="
  rm -rf "$WD"
  run_attempt
  LAST_RC=$?
  if [ "$LAST_RC" -ne 0 ]; then
    echo "attempt $a: checks failed or inconclusive (rc=$LAST_RC)"
    continue
  fi
  SURPLUS=$(grep -o '"surplus_rows":[0-9-]*' "$WD/resume.log" | head -1 | cut -d: -f2)
  if [ -n "$SURPLUS" ] && [ "$SURPLUS" -gt 0 ]; then
    echo "attempt $a: checks green AND divergence exercised (surplus_rows=$SURPLUS)"
    exit 0
  fi
  echo "attempt $a: checks green but DIVERGENCE_VACUOUS (surplus_rows=${SURPLUS:-missing}) — retrying for an exercised sandwich"
done
echo "exhausted $ATTEMPTS attempts; last rc=$LAST_RC (if 0: green but divergence unexercised)"
[ "$LAST_RC" -eq 0 ] && echo "DIVERGENCE_VACUOUS"
exit "$LAST_RC"
