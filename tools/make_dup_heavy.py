#!/usr/bin/env python3
"""Dup-heavy gate fixture for q110's guard-aware oracle (VERDICT r18 #2).

Writes an embeddings.parquet whose exact-duplicate clique fan-out
(sum c*(c-1) / n over exact-embedding groups) exceeds the engine's
srpTightDupFanoutMax = 1.0, so a Verify + check.py run over it exercises
q110 with the dup-mass guard ACTIVE — the corpus shape the r18 oracle
could not hash-check (the old tightCorpusCte enumerated full-corpus
pairs while the engine silently switched to min-id representatives).

Shape mirrors SrpLshSpec's guard fixture: 40 distinct unit vectors
(ids 100..139 — kept >= 32 so tightAugmented's replica planting stays
inert), bases 0..9 duplicated 7x each (ids 1000+), plus one cos-0.85
near-dup of base 5 (id 5000; 0.05 above the tau=0.8 verify line — never
plant AT a threshold). Fan-out = 10*8*7/111 ~= 5.05 > 1.

Usage: make_dup_heavy.py OUTDIR [--seed N] [--dim D]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main():
    argv = sys.argv[1:]
    seed, dim = 7, 64
    if "--seed" in argv:
        i = argv.index("--seed"); seed = int(argv[i + 1]); argv = argv[:i] + argv[i + 2:]
    if "--dim" in argv:
        i = argv.index("--dim"); dim = int(argv[i + 1]); argv = argv[:i] + argv[i + 2:]
    if len(argv) != 1:
        sys.exit(__doc__)
    outdir = argv[0]

    rnd = np.random.RandomState(seed)

    def unit():
        v = rnd.randn(dim)
        return (v / np.sqrt((v * v).sum())).astype(np.float32)

    bases = [unit() for _ in range(40)]
    # cos-0.85 near-dup of base 5: project a fresh gaussian orthogonal
    # to the base, mix at the target cosine (float64 math, cast once).
    c = 0.85
    v = bases[5].astype(np.float64)
    g = rnd.randn(dim)
    w = g - (g @ v) * v
    w /= np.sqrt((w * w).sum())
    near = (c * v + np.sqrt(1 - c * c) * w).astype(np.float32)

    ids, vecs = [], []
    for i, b in enumerate(bases):
        ids.append(100 + i); vecs.append(b)
    for i in range(10):
        for k in range(7):
            ids.append(1000 + i * 10 + k); vecs.append(bases[i])
    ids.append(5000); vecs.append(near)

    n = len(ids)
    fanout = 10 * 8 * 7 / float(n)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([int(i % 10) for i in range(n)], pa.int32()),
    })
    os.makedirs(outdir, exist_ok=True)
    dest = os.path.join(outdir, "embeddings.parquet")
    pq.write_table(tbl, dest)
    print(f"wrote {dest}: {n} rows, exact-dup fan-out {fanout:.2f} "
          f"(guard threshold 1.0)")


if __name__ == "__main__":
    main()
