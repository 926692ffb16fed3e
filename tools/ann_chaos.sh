#!/bin/bash
# ANN ingest kill-chaos driver (VERDICT r18 #1) — three runs of
# graft.queries.AnnIngestChaos over one state dir:
#   1. SIGKILL-equivalent halt INSIDE a segment write (torn commit)
#   2. halt AFTER a commit, BEFORE the caller acks (unacked commit)
#   3. clean resume + deliberate last-batch replay + verification
# Usage: tools/ann_chaos.sh WORKDIR NBATCHES OUT.json
set -u
WD=$1; NB=$2; OUT=$3
rm -rf "$WD"; mkdir -p "$WD"

echo "[ann-chaos] run 1: kill inside batch 3's write (torn, uncommitted)"
SPARK_GRAFT_ANN_KILL=pre:b3 sbt -batch \
  "runMain graft.queries.AnnIngestChaos $WD $NB $OUT" >"$WD/run1.log" 2>&1
rc=$?
if [ $rc -eq 0 ]; then echo "run 1 was supposed to die (exit $rc)"; exit 1; fi
echo "[ann-chaos] run 1 died as planned (exit $rc)"

echo "[ann-chaos] run 2: kill after batch 5 commits (unacked commit)"
SPARK_GRAFT_ANN_KILL=post:b5 sbt -batch \
  "runMain graft.queries.AnnIngestChaos $WD $NB $OUT" >"$WD/run2.log" 2>&1
rc=$?
if [ $rc -eq 0 ]; then echo "run 2 was supposed to die (exit $rc)"; exit 1; fi
echo "[ann-chaos] run 2 died as planned (exit $rc)"

echo "[ann-chaos] run 3: clean resume, replay, verify"
sbt -batch "runMain graft.queries.AnnIngestChaos $WD $NB $OUT" \
  >"$WD/run3.log" 2>&1 || { echo "run 3 FAILED"; tail -30 "$WD/run3.log"; exit 1; }
cat "$OUT"
echo
echo "[ann-chaos] OK"
