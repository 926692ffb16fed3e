#!/usr/bin/env python3
"""Merge tools/jit_ab.sh logs into one adjudication artifact.

Per (arm, run) it lifts q80/q81 seconds + cache_build_ms from the Bench
detail line and the loadavg/cal host context from run_meta, then
summarizes each arm (min/median/max, slow-mode verdict). The slow-mode
detector flags a run whose kernel cost (query seconds + cache_build)
exceeds 3x the arm-pooled minimum — the r15 incident was 16x, so 3x
separates mode switches from scheduler noise.

Usage: jit_ab_merge.py OUT.json LOGDIR
"""
import glob
import json
import os
import re
import sys


def parse(path):
    meta, detail = {}, None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith('{"run_meta"'):
                meta = json.loads(line)["run_meta"]
            elif line.startswith('{"detail"'):
                detail = json.loads(line)
    if detail is None:
        return None
    qs, cb = detail["queries"], detail.get("cache_build_ms", {})
    def cost(q):
        return qs.get(q, 0.0) + cb.get(q, 0) / 1000.0
    return {
        "q80_s": qs.get("q80_grouped_detections"), "q81_s": qs.get("q81_iou_pairs"),
        "q80_cache_build_ms": cb.get("q80_grouped_detections", 0),
        "q81_cache_build_ms": cb.get("q81_iou_pairs", 0),
        "kernel_cost_s": round(cost("q80_grouped_detections") + cost("q81_iou_pairs"), 2),
        "errors": detail.get("errors", {}),
        "loadavg_1m": meta.get("loadavg_1m"), "cal_s": meta.get("calibration_s"),
    }


def main():
    out_path, logdir = sys.argv[1], sys.argv[2]
    arms = {}
    for log in sorted(glob.glob(os.path.join(logdir, "*_*.log"))):
        m = re.match(r"(\w+)_(\d+)\.log", os.path.basename(log))
        if not m:
            continue
        row = parse(log)
        if row is None:
            row = {"error": "no detail line (run crashed?)"}
        arms.setdefault(m.group(1), []).append({"run": int(m.group(2)), **row})
    pooled_min = min((r["kernel_cost_s"] for rs in arms.values() for r in rs
                      if "kernel_cost_s" in r), default=None)
    summary = {}
    for arm, rs in arms.items():
        costs = sorted(r["kernel_cost_s"] for r in rs if "kernel_cost_s" in r)
        slow = [r["run"] for r in rs
                if r.get("kernel_cost_s", 0) > 3.0 * pooled_min]
        summary[arm] = {
            "runs": len(rs), "kernel_cost_s": costs,
            "min": costs[0] if costs else None,
            "median": costs[len(costs) // 2] if costs else None,
            "max": costs[-1] if costs else None,
            "slow_mode_runs": slow,
            "slow_mode_absent": not slow and len(costs) == len(rs),
        }
    with open(out_path, "w") as f:
        json.dump({"probe": "IouKernel JIT slow-mode A/B, local-cluster[4,8,8192], "
                            "q80+q81 on the skewed corpus (VERDICT r15 #1)",
                   "slow_mode_rule": "kernel_cost > 3x pooled min (r15 incident was 16x)",
                   "pooled_min_kernel_cost_s": pooled_min,
                   "arms": {a: {"summary": summary[a], "runs": rs}
                            for a, rs in arms.items()}}, f, indent=1)
    print(json.dumps({a: s for a, s in summary.items()}, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
