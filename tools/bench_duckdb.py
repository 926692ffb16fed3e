#!/usr/bin/env python3
"""Time the DuckDB oracles for the like-for-like bench ratio (dev tool).

Runs every oracle in <outDir>/oracle_sql.json against the <sfDir> parquet
tables, best-of-N (default 2), excluding the deliberately-declarative
spec oracles (q41/q55/q99/q102 — O(n^2) pair specs + recursive CTEs that
exist to define semantics, not to race). Prints per-query seconds and
the total, comparable to graft.Bench over the same query set.

Usage: python3 tools/bench_duckdb.py <sfDir> <outDir> [sweeps]
"""
import json
import os
import sys
import time

import duckdb

SPEC_ORACLES = {"q41_ngram_jaccard", "q55_dedup_clusters",
                "q99_curation_pipeline", "q102_canonical_best"}
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    sweeps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    best = {}
    for s in range(sweeps):
        for name in sorted(oracle):
            if name in SPEC_ORACLES:
                continue
            t0 = time.monotonic()
            con.execute(oracle[name]).fetchall()
            dt = time.monotonic() - t0
            best[name] = min(best.get(name, float("inf")), dt)
    for name in sorted(best):
        print(f"  {name:28s} {best[name]:7.3f}")
    print(f"TOTAL {sum(best.values()):.2f} s over {len(best)} oracles "
          f"(best of {sweeps}; spec oracles excluded: {sorted(SPEC_ORACLES)})")


if __name__ == "__main__":
    main()
