#!/usr/bin/env python3
"""IVF anchor-scaling measurement (VERDICT r15 #2) — dev tool.

Mirrors the engine's IVF pipeline (Similarity.scala: anchorKFor /
nprobeFor / min-hash anchor selection / nearest-cell assignment /
top-5-by-cosine with vec_id tie-breaks) in numpy, and compares the
OLD fixed operating point (K=64, nprobe=1) against the SCALED one
(K = clamp(64, 65536, 4*floor(sqrt(n))), nprobe = ceil(K/64)) on the
same corpus: recall@5 vs brute-force truth over a query sample, plus
the scanned-rows cost of each arm. numpy is used instead of the DuckDB
oracle because the measurement corpus (sf10 = 200k vectors) makes the
oracle's list-lambda cartesian impractical — the ENGINE's correctness
at the scaled point stays pinned by the driver's DuckDB gate at
sf0.01/0.1; this tool only measures the recall/cost tradeoff at SFs
the oracle can't reach.

Usage: ivf_scale_probe.py OUT.json SFDIR [SFDIR ...] [--queries N]
"""
import json
import sys

import numpy as np
import pyarrow.parquet as pq


def load(sfdir):
    t = pq.read_table(f"{sfdir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = np.asarray(t["vec_id"], dtype=np.int64)
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(vid)
    return vid[order], emb[order]


def anchor_k(n):
    return int(max(64, min(65536, 4 * int(np.floor(np.sqrt(float(n)))))))


def nprobe(k):
    return (k + 63) // 64


def min_hash_anchors(vid, k):
    h = ((vid % 1000003) * 2654435761) % 1000000007
    order = np.lexsort((vid, h))  # by (h, vec_id) — the engine's tie-break
    return order[:k]


def top5(scores, ids, exclude):
    # rank by cosine DESC, vec_id ASC; exclude the query itself
    s = scores.copy()
    s[ids == exclude] = -np.inf
    order = np.lexsort((ids, -s))
    return ids[order[:5]]


def run_arm(vid, emb, nrm, q_ids, k, p):
    a_idx = min_hash_anchors(vid, k)
    av, anrm = emb[a_idx], nrm[a_idx]
    # nearest-cell assignment: argmax cos, ties -> lowest anchor rank
    # (anchors ordered by selection rank = a_id order in the engine)
    cos_a = (emb @ av.T) / np.outer(nrm, anrm)
    cell = np.argmax(cos_a, axis=1)  # first max = lowest index = engine tie-break
    scanned = 0
    hits = 0
    for q in q_ids:
        qi = int(np.searchsorted(vid, q))
        # top-p anchors by cos DESC, anchor rank ASC (engine tie-break)
        probes = np.lexsort((np.arange(k), -cos_a[qi]))[:p]
        mask = np.isin(cell, probes)
        cand = np.where(mask)[0]
        scanned += cand.size
        cos_q = (emb[cand] @ emb[qi]) / (nrm[cand] * nrm[qi])
        approx = set(top5(cos_q, vid[cand], q))
        cos_all = (emb @ emb[qi]) / (nrm * nrm[qi])
        truth = set(top5(cos_all, vid, q))
        hits += len(truth & approx)
    return {"k": k, "nprobe": p, "recall_at_5": round(hits / (5.0 * len(q_ids)), 4),
            "scanned_rows_per_query": round(scanned / len(q_ids), 1),
            "scan_fraction": round(scanned / (len(q_ids) * float(len(vid))), 6)}


def main():
    argv = sys.argv[1:]
    nq = 100
    if "--queries" in argv:
        i = argv.index("--queries")
        nq = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = argv
    out_path, sfdirs = args[0], args[1:]
    report = {}
    for sfdir in sfdirs:
        vid, emb = load(sfdir)
        nrm = np.sqrt((emb * emb).sum(axis=1))
        n = len(vid)
        q_ids = vid[:nq]  # the smallest vec_ids — superset of q49's <5 batch
        ks = anchor_k(n)
        fixed = run_arm(vid, emb, nrm, q_ids, 64, 1)
        scaled = run_arm(vid, emb, nrm, q_ids, ks, nprobe(ks))
        report[sfdir] = {"n": n, "queries": int(len(q_ids)),
                         "fixed_64_nprobe1": fixed, "scaled": scaled}
        print(f"{sfdir}: n={n} fixed={fixed} scaled={scaled}")
    with open(out_path, "w") as f:
        json.dump({"probe": "ivf anchor scaling, numpy mirror of Similarity.scala",
                   "arms": report}, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
