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

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir] [copies] [tables] [chunks] [skew]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10 <all> 1 0

With skew=1 (VERDICT r13 #1: the adversarial-Zipf arm) three planted
pathologies ride on top of the normal replication, exercising the
guards no uniform corpus ever fires:

  - lineitem: ~1/293-rate rows (tuned to ~20-24k at sf1) remap onto ONE
    synthetic hot panorama block (l_orderkey = 380000000 + partkey%38 ->
    pano_10000000.jpg with >20000 detections, over the default
    dense-group threshold; boxes spread over the 38 orderkey slots so
    the greedy adjacency stays sparse-bounded). These rows deliberately
    orphan their orders FK - q98's referential check must REPORT the
    dirt (both engines compute the same violation counts, so the oracle
    stays green while the check fires).
  - events: 5% of all events (event_id % 20 == 3) remap to user_id 1 -
    one hot user owning 1/20th of the stream (hot sessions, hot window
    partitions, skewed join keys).
  - documents: ids with id%50==7 in [100, 200000) are rewritten as
    near-identical variants of one template (pairwise 3-shingle
    Jaccard ~0.89) - ONE mega near-dup cluster (~800 members at sf1,
    absolute-capped so the q41 df-cap=10000 contract is never crossed
    and the O(n^2) oracle stays exact). Eval ids (<64) are untouched.

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
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 and sys.argv[4] else None
CHUNKS = int(sys.argv[5]) if len(sys.argv) > 5 else 1
SKEW = len(sys.argv) > 6 and sys.argv[6] == "1"

# Hot-panorama constants (skew mode): all hot lineitem rows land in the
# 38-orderkey block of pano 10,000,000 — far beyond any replicated key,
# so the planted monster is attributable at a glance.
HOT_PANO_BASE = 38 * 10_000_000
MEGA_TEMPLATE = (
    "the quick brown fox jumps over the lazy dog while ninety seven "
    "sensors record every frame of the survey run and the archive "
    "keeps one canonical copy of each observed facade for later review")

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
        # Skew-arm hot-row predicates (deterministic, pure functions of
        # the row + copy index so re-generation is byte-stable).
        hot_li_pred = None
        if SKEW and table == "lineitem":
            n_src = con.execute(f"SELECT count(*) FROM '{src}'").fetchone()[0]
            total = n_src * COPIES
            # Hot-pano size: ~0.33% of the corpus, absolute-capped at
            # ~23k rows so (a) it clears the 20000 dense-group threshold
            # at sf1+ with margin (p is a floor-division approximation)
            # and (b) the single-task greedy adjacency stays
            # memory-bounded at any rehearsal SF.
            target = min(23000, max(200, total // 260))
            p = max(1, total // target)
            hot_li_pred = f"(l_orderkey * 97 + l_partkey * 31 + l_linenumber + k) % {p} = 0"
        mega_doc_pred = ("(doc_id + k * 100000) % 50 = 7 AND "
                         "(doc_id + k * 100000) BETWEEN 100 AND 199999")
        sel = []
        for c in cols:
            if SKEW and table == "lineitem" and c == "l_orderkey":
                # Hot panorama: ~21k rows onto one 38-key block (boxes
                # spread over the block's slots via partkey). FK dirt is
                # deliberate - q98 must report it.
                sel.append(
                    f"CASE WHEN {hot_li_pred} THEN {HOT_PANO_BASE} + (l_partkey % 38) "
                    f"ELSE l_orderkey + k * {shifts[c]} END AS l_orderkey")
            elif SKEW and table == "events" and c == "user_id":
                sel.append(
                    "CASE WHEN (event_id + k * 1000000) % 20 = 3 THEN 1 "
                    f"ELSE user_id + k * {shifts[c]} END AS user_id")
            elif SKEW and table == "documents" and c == "text":
                sel.append(
                    f"CASE WHEN {mega_doc_pred} "
                    f"THEN '{MEGA_TEMPLATE}' || ' uniq' || (doc_id + k * 100000) "
                    "WHEN k = 0 THEN text ELSE "
                    "array_to_string(list_transform(string_split(text, ' '), "
                    "t -> t || 'zz' || k), ' ') END AS text")
            elif c in shifts:
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
