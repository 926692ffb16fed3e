#!/usr/bin/env python3
"""q53 planted-pair recall at SFs beyond the exact baseline (VERDICT r15
residue #4: "record once at sf10 via the planted-dup probe").

The synthesized corpora (tools/make_sf1.py) replicate sf0.1's embeddings
with a per-copy dimension sign flip — an isometry, so every within-copy
cosine is preserved exactly. The sf0.1 exact threshold pairs (cos >=
0.45, q44's answer, recomputed here in numpy float64 like the engine's
verify) therefore exist verbatim in EVERY copy at vec_id + k*100000 —
a known planted subset of the true pair set at any replicated SF. This
probe reads a dumped q53 result (Verify subset parquet) and reports
what fraction of those planted pairs the SRP ladder recovered.

This is a RECALL FLOOR measurement, not full recall: cross-copy pairs
above threshold exist too (cosine scatter ~N(0, 1/sqrt(dim))) but have
no tractable exact enumeration at sf10 — exactly why the planted probe
is the decade-2 instrument.

Usage: srp_planted_recall.py Q53_PARQUET_DIR SRC_SF_DIR COPIES OUT.json
"""
import glob
import json
import sys

import numpy as np
import pyarrow.parquet as pq

STRIDE = 100000  # make_sf1.py's vec_id stride per copy


def exact_pairs(sfdir, thresh=0.45):
    t = pq.read_table(f"{sfdir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vid = np.asarray(t["vec_id"], dtype=np.int64)
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(vid)
    vid, emb = vid[order], emb[order]
    nrm = np.sqrt((emb * emb).sum(axis=1))
    cos = (emb @ emb.T) / np.outer(nrm, nrm)
    iu = np.triu_indices(len(vid), k=1)
    hit = cos[iu] >= thresh
    return set(zip(vid[iu[0][hit]].tolist(), vid[iu[1][hit]].tolist()))


def main():
    q53_dir, src_sf, copies, out_path = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
    base = exact_pairs(src_sf)
    planted = {(a + k * STRIDE, b + k * STRIDE) for (a, b) in base for k in range(copies)}
    files = glob.glob(f"{q53_dir}/*.parquet")
    t = pq.read_table(files, columns=["a_id", "b_id"])
    got = set(zip(t["a_id"].to_pylist(), t["b_id"].to_pylist()))
    hits = len(planted & got)
    report = {
        "probe": "q53 planted-pair recall (within-copy isometry replicas of the "
                 "sf0.1 exact threshold pairs)",
        "src_sf": src_sf, "copies": copies,
        "base_exact_pairs": len(base), "planted_pairs": len(planted),
        "q53_pairs_total": len(got), "planted_recovered": hits,
        "planted_recall": round(hits / len(planted), 4) if planted else -1.0,
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
