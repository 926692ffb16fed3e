#!/usr/bin/env python3
"""Synthesize the sf1 scale-rehearsal corpus (dev tool only).

Replicates every /root/testdata/sf0.1 table 10x under disjoint,
FK-consistent key strides (the round-11 rehearsal recipe recorded in
COVERAGE.md):

  - orders/lineitem: orderkey += k*1e6; part/supplier/customer keys
    (and their lineitem/orders FKs) += k*1e5; region/nation fixed.
  - documents: doc_id += k*1e5; copies k>0 suffix every whitespace
    token with `zz<k>` so cross-copy shingle similarity is exactly 0 —
    the corpus gains 10x the near-dup CLUSTERS, not 10-clone cliques.
    Eval docs (doc_id < 64) exist only in copy 0, so the fixed-size
    eval-suite convention is preserved.
  - embeddings: vec_id += k*1e5; copies k>0 get a deterministic
    per-copy dimension sign flip (an isometry within the copy, so all
    within-copy structure is preserved; cross-copy cosines scatter to
    ~N(0, 1/sqrt(dim)) like a natural 10x of a clustered corpus).
  - events: event_id/user_id += k*1e6 (ts kept: 10x the density of the
    same stream window, the harder streaming-agg shape).

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir] [copies] [tables] [chunks]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10 <all> 1

With chunks > 1 each shifted table is written as a DIRECTORY of
per-k-range parquet part files instead of one file. The single-file
COPY's `ORDER BY k` sorts the entire replicated relation in memory —
at the decade-4 corpus (10000 copies of documents) that sort wanted
>56 GB and starved a concurrently-running rehearsal JVM; per-chunk
COPYs keep the working set at one chunk (copies/chunks replicas) while
preserving copy-contiguous row-group locality inside each part. Spark
reads the directory transparently; DuckDB oracles read
'<dir>/*.parquet' (the sf<=100 gates all run on single files — the
directory form is for scale probes above the oracle SFs).
"""
import os
import shutil
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# Optional comma list: regenerate only these tables (a rehearsal that
# dropped big tables to reclaim scratch disk puts them back piecemeal).
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
CHUNKS = int(sys.argv[5]) if len(sys.argv) > 5 else 1

SHIFTS = {  # table -> {column: stride}
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 100_000},
    "part": {"p_partkey": 100_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 100_000,
                 "l_suppkey": 100_000},
    # user_id joins customer/orders keys, so it must ride the SAME
    # 1e5 stride or every copy-k>0 event would join to nothing.
    "events": {"event_id": 1_000_000, "user_id": 100_000},
    "documents": {"doc_id": 100_000},
    "embeddings": {"vec_id": 100_000},
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for table, shifts in SHIFTS.items():
        if ONLY is not None and table not in ONLY:
            continue
        src = f"{SRC}/{table}.parquet"
        dst = f"{DST}/{table}.parquet"
        if not os.path.exists(src):
            print(f"  {table}: missing in {SRC}, skipped")
            continue
        if not shifts:  # fixed dimension tables: plain copy
            con.execute(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
            print(f"  {table}: copied (fixed)")
            continue
        cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        sel = []
        for c in cols:
            if c in shifts:
                sel.append(f"{c} + k * {shifts[c]} AS {c}")
            elif table == "documents" and c == "text":
                # Suffix every token with zz<k> in copies k>0.
                sel.append(
                    "CASE WHEN k = 0 THEN text ELSE "
                    "array_to_string(list_transform(string_split(text, ' '), "
                    "t -> t || 'zz' || k), ' ') END AS text")
            elif table == "embeddings" and c == "embedding":
                # Deterministic per-(copy, dim) sign flip; identity at k=0.
                # Reduce mod an odd prime BEFORE taking parity — a direct
                # %2 of a linear combo with odd multipliers collapses to
                # (k+j)%2, making all odd-k copies bit-identical.
                sel.append(
                    "CASE WHEN k = 0 THEN embedding ELSE "
                    "list_transform(generate_series(1, len(embedding)), "
                    "j -> embedding[j] * (CASE WHEN ((k * 2654435761 + j * 40503) % 1000003) % 2 = 0 "
                    "THEN 1.0 ELSE -1.0 END)::FLOAT) END AS embedding")
            else:
                sel.append(c)
        def copy_range(lo: int, hi: int, out: str) -> None:
            q = (f"COPY (SELECT {', '.join(sel)} FROM '{src}', "
                 f"(SELECT unnest(generate_series({lo}, {hi})) AS k) "
                 f"ORDER BY k) TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE 200000)")
            con.execute(q)

        if CHUNKS <= 1:
            copy_range(0, COPIES - 1, dst)
            n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        else:
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            elif os.path.exists(dst):
                os.remove(dst)
            os.makedirs(dst)
            per = (COPIES + CHUNKS - 1) // CHUNKS
            for i, lo in enumerate(range(0, COPIES, per)):
                hi = min(lo + per, COPIES) - 1
                copy_range(lo, hi, f"{dst}/part_{i:04d}.parquet")
                print(f"  {table}: chunk {i} (k {lo}..{hi}) done", flush=True)
            n = con.execute(
                f"SELECT count(*) FROM '{dst}/*.parquet'").fetchone()[0]
        print(f"  {table}: {n} rows")


if __name__ == "__main__":
    main()
