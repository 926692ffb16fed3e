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

Usage:
  srp_planted_recall.py Q53_PARQUET_DIR SRC_SF_DIR COPIES OUT.json
      replica-isometry planted recall (the r16 instrument, threshold-
      boundary pairs only — the corpus tops out at cos ~0.51)
  srp_planted_recall.py synth SRC_SF_DIR OUT_DIR N_PER_BAND
      VERDICT r16 #1: synthesize PERTURBATION replicas at controlled
      cosine bands (0.7/0.8/0.9/0.95 — copy a vector, mix in scaled
      orthogonal noise) and write an augmented embeddings corpus +
      planted manifest, so ladder recall is measurable in the
      HIGH-COSINE regime real dedup deploys at. Run the engine's
      q53/q110 on OUT_DIR (Verify subset), then:
  srp_planted_recall.py measure_synth PLANTED_JSON OUT.json NAME=DUMP_DIR:THRESH [...]
      per-band recall table per family; a planted pair counts for a
      family only when its exact float32 cosine clears that family's
      verify threshold (pairs below it are excluded from the
      denominator, not missed).
"""
import glob
import json
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

STRIDE = 100000    # make_sf1.py's vec_id stride per copy
# Replica vec_ids start here — above any replicated real id (make_sf1
# strides 100k/copy, so sf100 tops out near 1e8) and far below q110's
# tightAugmented shifts (1e12/2e12), so no flow can conflate them
# (ADVICE r17: the old 2e7 base collided with the +2e7 tight shift).
SYNTH_BASE = 500_000_000
BANDS = [0.7, 0.8, 0.9, 0.95]


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


def synth(src_sf, out_dir, n_per_band):
    import os
    t = pq.read_table(f"{src_sf}/embeddings.parquet")
    vid = np.asarray(t["vec_id"], dtype=np.int64)
    # fixed-dim fast path: reshape the flat values buffer (to_pylist on
    # a 2M x 64 corpus builds ~13 GB of Python floats)
    col = t["embedding"].combine_chunks()
    dim = len(col[0])
    emb = np.asarray(col.flatten(), dtype=np.float64).reshape(len(vid), dim)
    lab = np.asarray(t["label"], dtype=np.int32)
    rng = np.random.default_rng(20260816)  # deterministic manifest
    bases = rng.choice(len(vid), size=n_per_band * len(BANDS), replace=False)
    manifest = []
    new_vecs, new_ids, new_labs = [], [], []
    for bi, band in enumerate(BANDS):
        # Target 0.002 ABOVE the nominal band: a replica planted exactly
        # AT a verify threshold (q110's first run: band 0.8 vs tau 0.8)
        # is a float-rounding coin flip on BOTH sides — half the band
        # fails the engine's full-precision >= and reads as a ladder
        # miss. The offset keeps every pair decisively inside its band.
        c = band + 0.002
        for j in range(n_per_band):
            i = int(bases[bi * n_per_band + j])
            v = emb[i]
            nv = np.linalg.norm(v)
            vhat = v / nv
            g = rng.standard_normal(len(v))
            w = g - (g @ vhat) * vhat
            w /= np.linalg.norm(w)
            u = c * vhat + np.sqrt(1.0 - c * c) * w
            rep32 = (nv * u).astype(np.float32)
            rid = SYNTH_BASE + bi * n_per_band + j
            # exact cosine AFTER float32 rounding — the arithmetic the
            # engine's float64-over-float32 verify actually sees
            r64 = rep32.astype(np.float64)
            cos = float((r64 @ v) / (np.linalg.norm(r64) * nv))
            manifest.append({"replica_id": rid, "base_id": int(vid[i]),
                             "band": band, "cos": round(cos, 6)})
            new_ids.append(rid)
            new_vecs.append(rep32)
            new_labs.append(int(lab[i]))
    os.makedirs(out_dir, exist_ok=True)
    all_ids = np.concatenate([vid, np.array(new_ids, dtype=np.int64)])
    flat = np.concatenate([emb.astype(np.float32).reshape(-1),
                           np.concatenate(new_vecs)])
    all_labs = np.concatenate([lab, np.array(new_labs, dtype=np.int32)])
    n_all = len(all_ids)
    offsets = pa.array(np.arange(0, (n_all + 1) * dim, dim, dtype=np.int32))
    emb_arr = pa.ListArray.from_arrays(offsets, pa.array(flat, pa.float32()))
    out = pa.table({
        "vec_id": pa.array(all_ids, pa.int64()),
        "embedding": emb_arr,
        "label": pa.array(all_labs, pa.int32()),
    })
    pq.write_table(out, f"{out_dir}/embeddings.parquet")
    with open(f"{out_dir}/planted_synth.json", "w") as f:
        json.dump({"src": src_sf, "n_per_band": n_per_band, "bands": BANDS,
                   "planted": manifest}, f, indent=1)
    print(f"wrote {out_dir}/embeddings.parquet ({len(all_ids)} rows = "
          f"{len(vid)} corpus + {len(new_ids)} replicas) + planted_synth.json")


def canonical_map(corpus_dir):
    """id -> min-id over its EXACT-vector clique (only non-trivial
    cliques are kept). Mirrors the engine's dup-mass guard (q110 routes
    dup-heavy corpora through exact-dedup representatives, VERDICT r17
    #3), so planted base ids can be canonicalized before matching a
    guard-active dump. Grouping is on the raw float32 bytes — the same
    exact-equality the engine's window partitions on."""
    t = pq.read_table(f"{corpus_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    vid = np.asarray(t["vec_id"], dtype=np.int64)
    col = t["embedding"].combine_chunks()
    dim = len(col[0])
    emb = np.asarray(col.flatten(), dtype=np.float32).reshape(len(vid), dim)
    order = np.argsort(vid)
    vid, emb = vid[order], emb[order]
    groups = {}
    for i in range(len(vid)):
        groups.setdefault(emb[i].tobytes(), []).append(int(vid[i]))
    canon = {}
    for ids in groups.values():
        if len(ids) > 1:
            m = min(ids)
            for x in ids:
                canon[x] = m
    return canon


def measure_synth(planted_json, out_path, family_args, canon_dir=None):
    man = json.load(open(planted_json))
    planted = man["planted"]
    canon = canonical_map(canon_dir) if canon_dir else {}
    report = {"probe": "synthesized high-cosine planted-pair recall per band "
                       "(VERDICT r16 #1)", "src": man["src"],
              "n_per_band": man["n_per_band"], "families": {}}
    if canon_dir:
        report["canonicalized"] = {
            "corpus": canon_dir, "clique_members": len(canon),
            "note": "planted base ids mapped to exact-clique minima before "
                    "matching (engine dup-mass guard reports representative "
                    "pairs on dup-heavy corpora)"}
    for arg in family_args:
        name, rest = arg.split("=", 1)
        dump_dir, thresh = rest.rsplit(":", 1)
        thresh = float(thresh)
        files = glob.glob(f"{dump_dir}/*.parquet")
        t = pq.read_table(files, columns=["a_id", "b_id"])
        got = set(zip(t["a_id"].to_pylist(), t["b_id"].to_pylist()))
        fam = {}
        for band in man["bands"]:
            elig = []
            for p in planted:
                if p["band"] == band and p["cos"] >= thresh:
                    a = canon.get(p["base_id"], p["base_id"])
                    b = canon.get(p["replica_id"], p["replica_id"])
                    elig.append((min(a, b), max(a, b)))
            hits = sum(1 for pr in elig if pr in got)
            fam[str(band)] = {
                "eligible_pairs": len(elig), "recovered": hits,
                "recall": round(hits / len(elig), 4) if elig else None}
        report["families"][name] = {"verify_threshold": thresh,
                                    "pairs_total": len(got), "bands": fam}
        print(name, json.dumps(report["families"][name]["bands"]))
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")


def main():
    if sys.argv[1] == "synth":
        synth(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    if sys.argv[1] == "measure_synth":
        rest = sys.argv[2:]
        canon_dir = None
        if "--canon" in rest:
            i = rest.index("--canon")
            canon_dir = rest[i + 1]
            rest = rest[:i] + rest[i + 2:]
        measure_synth(rest[0], rest[1], rest[2:], canon_dir)
        return
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
