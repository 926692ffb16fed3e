#!/usr/bin/env bash
# Batch-DAG chaos rehearsal (VERDICT r12 next-round #6): SIGKILL a
# RunDag JVM mid-materialize, resume in a FRESH JVM with --no-refresh,
# and prove the commit-marker protocol across process death:
#   (a) stages committed before the kill are REUSED on resume,
#   (b) the in-flight stage is rebuilt exactly once (a third
#       --no-refresh tick reuses everything),
#   (c) no torn table gates as committed,
#   (d) the resumed pipeline's final output EQUALS a from-scratch run.
# The in-JVM racing specs (DagSpec) already pin same-process semantics;
# this is the cross-process case production actually hits.
#
# Usage: tools/dag_chaos.sh [sfDir] [workDir] [minCommits]
# minCommits (default 1): how many committed stages to wait for before
# the SIGKILL — higher values land the kill deeper in the pipeline.
set -u
SF=${1:-/root/testdata/sf0.1}
WD=${2:-/tmp/dag_chaos}
MIN=${3:-1}
REF="${WD}_ref"
cd "$(dirname "$0")/.."
rm -rf "$WD" "$REF"
STAGES=6   # streetLevelDag: detections poses grouped rays hits summary

commits() { ls -d "$WD"/*.parquet/_graft_commit 2>/dev/null | wc -l; }

echo "== victim (will be SIGKILLed mid-materialize) =="
sbt -batch "runMain graft.RunDag street $SF $WD" > "$WD.victim.log" 2>&1 &
SBT_PID=$!

VPID=""
for i in $(seq 1 120); do
  [ -f "$WD/rundag.pid" ] && { VPID=$(cat "$WD/rundag.pid"); break; }
  kill -0 $SBT_PID 2>/dev/null || break
  sleep 1
done
[ -z "$VPID" ] && { echo "!! victim pid never published"; exit 3; }

# Kill once at least one stage committed but not all: the SIGKILL lands
# with some stages durable, some in flight — the crash-resume case.
KILLED=0
for i in $(seq 1 300); do
  kill -0 "$VPID" 2>/dev/null || break
  N=$(commits)
  if [ "$N" -ge "$MIN" ] && [ "$N" -lt $STAGES ]; then
    echo "killing RunDag JVM $VPID after $N/$STAGES commits"
    kill -9 "$VPID" && KILLED=1
    break
  fi
  sleep 0.3
done
wait $SBT_PID 2>/dev/null
sleep 1
PRE=$(commits)
FAIL=0
if [ $KILLED -ne 1 ]; then
  echo "!! kill window missed (commits=$PRE) — rehearsal inconclusive"
  exit 3
fi
echo "post-kill state: $PRE/$STAGES stages committed"
TORN=$(ls -d "$WD"/*.parquet.tmp-* 2>/dev/null | wc -l)
echo "torn tmp dirs left by the kill: $TORN (must never gate as committed)"

echo "== resume in a fresh JVM (--no-refresh) =="
sbt -batch "runMain graft.RunDag street $SF $WD --no-refresh" > "$WD.resume.log" 2>&1
RC=$?
grep -E "^(detections|poses|grouped|rays|hits|summary) " "$WD.resume.log" | sed 's/^/  /'
if [ $RC -ne 0 ]; then echo "!! resume exited rc=$RC"; FAIL=1; fi
REUSED=$(grep -c "(reused)" "$WD.resume.log")
REBUILT=$((STAGES - REUSED))
if [ "$REUSED" -lt "$PRE" ]; then
  echo "!! only $REUSED reused < $PRE committed pre-kill — durable work was redone"
  FAIL=1
fi
if [ "$REBUILT" -lt 1 ]; then
  echo "!! nothing rebuilt — the kill didn't actually interrupt a stage"
  FAIL=1
fi
echo "resume: $REUSED reused, $REBUILT rebuilt"

echo "== idempotent tick (everything must now reuse) =="
sbt -batch "runMain graft.RunDag street $SF $WD --no-refresh" > "$WD.tick.log" 2>&1 || FAIL=1
TICK=$(grep -c "(reused)" "$WD.tick.log")
if [ "$TICK" -ne $STAGES ]; then
  echo "!! tick reused $TICK/$STAGES — in-flight stage not rebuilt exactly once"
  FAIL=1
else
  echo "tick: all $STAGES stages reused"
fi

echo "== equality vs from-scratch materialization =="
sbt -batch "runMain graft.RunDag street $SF $REF" > "$REF.log" 2>&1 || { echo "!! ref run failed"; FAIL=1; }
python3 - "$WD" "$REF" <<'EOF' || FAIL=1
import sys, duckdb
wd, ref = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("summary", "hits"):
    a, b = f"{wd}/{t}.parquet/*.parquet", f"{ref}/{t}.parquet/*.parquet"
    d1 = con.execute(f"SELECT count(*) FROM (SELECT * FROM '{a}' EXCEPT ALL SELECT * FROM '{b}')").fetchone()[0]
    d2 = con.execute(f"SELECT count(*) FROM (SELECT * FROM '{b}' EXCEPT ALL SELECT * FROM '{a}')").fetchone()[0]
    n = con.execute(f"SELECT count(*) FROM '{a}'").fetchone()[0]
    print(f"  {t}: rows={n} exceptAll {d1}/{d2}")
    if d1 or d2 or n == 0:
        sys.exit(1)
EOF

if [ $FAIL -eq 0 ]; then
  echo "DAG CHAOS: ALL CHECKS GREEN (killed at $PRE/$STAGES, resumed, exactly-once rebuild, outputs equal)"
else
  echo "DAG CHAOS: FAILED"
fi
exit $FAIL
