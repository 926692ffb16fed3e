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

Usage:
  ivf_scale_probe.py OUT.json SFDIR [SFDIR ...] [--queries N]
      flat fixed-64 vs scaled-(K,p) comparison (VERDICT r15 #2)
  ivf_scale_probe.py two_level OUT.json SFDIR [SFDIR ...] [--queries N]
      two-level coarse-multi-probe (q109's r17 operating point:
      kc = 2*ceil(sqrt(K)), ac = 6 assignment probes, wc = ceil(2kc/5)
      query probes) vs the scaled FLAT path at EQUAL scan budget (same
      p probed fine cells) — VERDICT r16 #2's recall measurement
  ivf_scale_probe.py cap OUT.json SFDIR [--queries N] [--k K]
      beyond-cap demonstration: force K (default 65536, where
      anchorKFor saturates) on a corpus where flat assignment is the
      bottleneck; measures assignment dots/row and wall-clock flat vs
      two-level, plus recall at the widened multi-probe point

Anchor arrays are ordered by (hash rank) for selection but re-indexed
by vec_id before every argmax/lexsort, so position ties equal id ties —
the engine and oracle break exact-cosine ties by anchor id ascending
(ADVICE r16 #4: the old mirror broke them by selection rank).
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
    # id-sort the selected anchors so position ties equal id ties
    # (ADVICE r16 #4) — argmax/lexsort's first-max-wins then matches the
    # engine/oracle's (score DESC, a_id ASC).
    a_idx = np.sort(min_hash_anchors(vid, k))
    av, anrm = emb[a_idx], nrm[a_idx]
    a_ids = vid[a_idx]
    cos_a = (emb @ av.T) / np.outer(nrm, anrm)
    cell = np.argmax(cos_a, axis=1)  # first max = lowest id (id-sorted)
    scanned = 0
    hits = 0
    for q in q_ids:
        qi = int(np.searchsorted(vid, q))
        # top-p anchors by cos DESC, a_id ASC (id-sorted arrays)
        probes = np.lexsort((a_ids, -cos_a[qi]))[:p]
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


def two_level_tables(vid, emb, nrm, k, kc, ac=6):
    """Mirror NearestCellsTwoLevel.routingTable + corpus assignment at
    the shipped operating point (kc = 2*ceil(sqrt(K)), ac = 6
    assignment coarse probes — q109's r17 formula).

    Returns (cell fine-anchor id per corpus row, coarse tables, fine
    routing) with every rank id-sorted so first-max = lowest id.
    """
    a_rank = min_hash_anchors(vid, k)          # hash-rank order
    c_rank = a_rank[:kc]                       # coarse = first kc by rank
    c_idx = np.sort(c_rank)                    # id-sorted (engine sortBy(_._1))
    a_idx = np.sort(a_rank)
    cv, cnrm, c_ids = emb[c_idx], nrm[c_idx], vid[c_idx]
    fv, fnrm, f_ids = emb[a_idx], nrm[a_idx], vid[a_idx]
    # fine -> nearest coarse (score DESC, c_id ASC)
    f_cos = (fv @ cv.T) / np.outer(fnrm, cnrm)
    froute = np.argmax(f_cos, axis=1)          # coarse POSITION per fine anchor
    kept = np.unique(froute)                   # coarse cells owning >=1 fine
    # corpus lvl1: top-ac KEPT coarse cells per row (score DESC, id ASC
    # — kept is id-sorted, stable argsort keeps the id tie-break)
    l1 = (emb @ cv[kept].T) / np.outer(nrm, cnrm[kept])
    topac = kept[np.argsort(-l1, axis=1, kind="stable")[:, :ac]]
    # corpus lvl2: best fine anchor in the union of the ac cells,
    # ties to the lower fine id
    best_s = np.full(len(vid), -np.inf)
    cell = np.full(len(vid), np.iinfo(np.int64).max, dtype=np.int64)
    for c in kept:
        rows = np.where((topac == c).any(axis=1))[0]
        if not rows.size:
            continue
        fins = np.where(froute == c)[0]        # id-sorted (a_idx is)
        s = (emb[rows] @ fv[fins].T) / np.outer(nrm[rows], fnrm[fins])
        j = np.argmax(s, axis=1)
        sc = s[np.arange(len(rows)), j]
        fid = f_ids[fins[j]]
        upd = (sc > best_s[rows]) | ((sc == best_s[rows]) & (fid < cell[rows]))
        best_s[rows[upd]] = sc[upd]
        cell[rows[upd]] = fid[upd]
    return cell, (c_ids, cv, cnrm, kept), (f_ids, fv, fnrm, froute)


def run_two_level(vid, emb, nrm, q_ids, k, p, wc, kc=None):
    if kc is None:
        kc = 2 * int(np.ceil(np.sqrt(k)))
    cell, (c_ids, cv, cnrm, kept), (f_ids, fv, fnrm, froute) = \
        two_level_tables(vid, emb, nrm, k, min(kc, len(vid)))
    scanned = 0
    hits = 0
    for q in q_ids:
        qi = int(np.searchsorted(vid, q))
        # top-wc kept coarse cells (score DESC, c_id ASC)
        qc = (cv[kept] @ emb[qi]) / (cnrm[kept] * nrm[qi])
        probes_c = kept[np.lexsort((c_ids[kept], -qc))[:wc]]
        # union of their fine anchors, top-p by (score DESC, a_id ASC)
        fins = np.where(np.isin(froute, probes_c))[0]
        qf = (fv[fins] @ emb[qi]) / (fnrm[fins] * nrm[qi])
        probes_f = f_ids[fins[np.lexsort((f_ids[fins], -qf))[:p]]]
        cand = np.where(np.isin(cell, probes_f))[0]
        scanned += cand.size
        cos_q = (emb[cand] @ emb[qi]) / (nrm[cand] * nrm[qi])
        approx = set(top5(cos_q, vid[cand], q))
        cos_all = (emb @ emb[qi]) / (nrm * nrm[qi])
        truth = set(top5(cos_all, vid, q))
        hits += len(truth & approx)
    return {"k": k, "kc": kc, "wc": wc, "nprobe": p,
            "recall_at_5": round(hits / (5.0 * len(q_ids)), 4),
            "scanned_rows_per_query": round(scanned / len(q_ids), 1),
            "scan_fraction": round(scanned / (len(q_ids) * float(len(vid))), 6)}


def chunked_flat_assign(emb, nrm, av, anrm, chunk=2048):
    """argmax cell per row without materializing the n x K score matrix
    (at K=65536 x 2M rows that matrix is ~1 PB in float64). float32
    matmul — tie behavior may differ in the last ulp, acceptable for a
    cost/recall demo (the engine's correctness is pinned by the DuckDB
    gate at oracle-reachable SFs, not here)."""
    a32 = (av / anrm[:, None]).astype(np.float32)
    cell = np.empty(len(emb), dtype=np.int64)
    for s in range(0, len(emb), chunk):
        e = emb[s:s + chunk].astype(np.float32)
        cell[s:s + chunk] = np.argmax(e @ a32.T, axis=1)
    return cell


def chunked_two_level_cells(vid, emb, nrm, k, kc, ac=6):
    """The cap demo's chunked float32 two-level corpus assignment,
    extracted so serve_envelope shares it (the float64 two_level_tables
    materializes an n x kc score matrix — ~8 GB at sf100). Returns
    (cell fine-anchor id per row, coarse tables, fine tables, topac)."""
    n = len(vid)
    a_idx = np.sort(min_hash_anchors(vid, k))
    c_idx = np.sort(min_hash_anchors(vid, k)[:kc])
    cv, cnrm, c_ids = emb[c_idx], nrm[c_idx], vid[c_idx]
    fv, fnrm, f_ids = emb[a_idx], nrm[a_idx], vid[a_idx]
    f_cos = (fv @ cv.T) / np.outer(fnrm, cnrm)
    froute = np.argmax(f_cos, axis=1)
    kept = np.unique(froute)
    cn32 = (cv[kept] / cnrm[kept][:, None]).astype(np.float32)
    topac = np.empty((n, ac), dtype=np.int64)
    for s in range(0, n, 131072):
        sc = emb[s:s + 131072].astype(np.float32) @ cn32.T
        topac[s:s + 131072] = kept[np.argpartition(-sc, min(ac, sc.shape[1]) - 1,
                                                   axis=1)[:, :ac]]
    fn32 = (fv / fnrm[:, None]).astype(np.float32)
    best_s = np.full(n, -np.inf, dtype=np.float32)
    cell = np.zeros(n, dtype=np.int64)
    for c in kept:
        rows = np.where((topac == c).any(axis=1))[0]
        if not rows.size:
            continue
        fins = np.where(froute == c)[0]
        sc = emb[rows].astype(np.float32) @ fn32[fins].T
        j = np.argmax(sc, axis=1)
        v = sc[np.arange(len(rows)), j]
        # Equal-score lower-id tie-break across cells, matching
        # two_level_tables' engine mirror (ADVICE r17 #4 — without it
        # this arm could diverge from the engine on exact float32 ties
        # beyond the documented flat-argmax ulp caveat).
        cand_id = f_ids[fins[j]]
        upd = (v > best_s[rows]) | ((v == best_s[rows]) & (cand_id < cell[rows]))
        best_s[rows[upd]] = v[upd]
        cell[rows[upd]] = cand_id[upd]
    return cell, (c_ids, cv, cnrm, kept), (f_ids, fv, fnrm, froute), topac


def run_cap_demo(sfdir, nq, k_forced):
    """Beyond-cap demonstration (VERDICT r16 #2): force K to the
    anchorKFor cap on a corpus where a flat K-dot assignment is the
    bottleneck, and measure assignment cost + recall at the widened
    two-level multi-probe point vs the flat path at equal scan."""
    import time
    vid, emb = load(sfdir)
    nrm = np.sqrt((emb * emb).sum(axis=1))
    n = len(vid)
    k = min(k_forced, n)
    kc = 2 * int(np.ceil(np.sqrt(k)))          # the engine's q109 formula
    p = nprobe(k)
    wc = (2 * kc + 4) // 5
    q_ids = vid[:nq]

    # Flat assignment wall-clock (K dots/row), chunked argmax.
    a_idx = np.sort(min_hash_anchors(vid, k))
    av, anrm, a_ids = emb[a_idx], nrm[a_idx], vid[a_idx]
    t0 = time.time()
    flat_cell = chunked_flat_assign(emb, nrm, av, anrm)
    flat_assign_s = time.time() - t0

    # Two-level assignment wall-clock (kc + ac*K/kc dots/row), float32
    # chunked like the flat arm so the wall comparison reflects the dot
    # counts, not numpy implementation asymmetry. Ranking by dot against
    # norm-scaled anchors: the row's own nrm is a positive constant and
    # drops out of per-row argmax.
    ac = 6
    t0 = time.time()
    cell, (c_ids, cv, cnrm, kept), (f_ids, fv, fnrm, froute), topac = \
        chunked_two_level_cells(vid, emb, nrm, k, kc, ac)
    fn32 = (fv / fnrm[:, None]).astype(np.float32)
    two_assign_s = time.time() - t0
    fine_per_cell = float(np.mean([np.sum(froute == c) for c in kept]))

    # Dial (a), VERDICT r17 #2: MULTI-ASSIGNMENT — index each corpus row
    # under its top-2 fine cells (within the same ac-coarse union), so a
    # row whose two-level route narrowly misassigns it is still findable
    # through its runner-up cell. 2x index size; the probe halves nprobe
    # to hold the scanned-row budget. Demo-grade tie handling (ulp ties
    # follow argpartition order) — the engine-mirror discipline lives on
    # the primary `cell` arm above.
    t0 = time.time()
    m2_s = np.full((n, 2), -np.inf, dtype=np.float32)
    m2_id = np.zeros((n, 2), dtype=np.int64)

    def insert_cand(rows, cs, cid):
        gt = cs > m2_s[rows, 0]
        r_gt = rows[gt]
        m2_s[r_gt, 1] = m2_s[r_gt, 0]; m2_id[r_gt, 1] = m2_id[r_gt, 0]
        m2_s[r_gt, 0] = cs[gt]; m2_id[r_gt, 0] = cid[gt]
        mid = (~gt) & (cs > m2_s[rows, 1])
        r_mid = rows[mid]
        m2_s[r_mid, 1] = cs[mid]; m2_id[r_mid, 1] = cid[mid]

    for c in kept:
        rows = np.where((topac == c).any(axis=1))[0]
        if not rows.size:
            continue
        fins = np.where(froute == c)[0]
        sc = emb[rows].astype(np.float32) @ fn32[fins].T
        if sc.shape[1] == 1:
            insert_cand(rows, sc[:, 0], np.full(len(rows), f_ids[fins[0]]))
        else:
            top2 = np.argpartition(-sc, 1, axis=1)[:, :2]
            ar = np.arange(len(rows))
            s0, s1 = sc[ar, top2[:, 0]], sc[ar, top2[:, 1]]
            insert_cand(rows, s0, f_ids[fins[top2[:, 0]]])
            insert_cand(rows, s1, f_ids[fins[top2[:, 1]]])
    multi_assign_s = time.time() - t0

    # Recall at equal scan budget: flat probes its p best cells, the
    # two-level point probes p fine cells within wc coarse. Dial arms
    # (VERDICT r17 #2): (a) multi-assignment membership at nprobe p/2,
    # (b) DIRECT fine-anchor probe ranking — rank all K fine anchors by
    # the query's own score instead of routing through wc coarse cells
    # (K dots per QUERY is affordable; the 51x saving is per corpus
    # ROW), (ab) both.
    p_half = max(1, p // 2)
    hits_f = hits_t = scan_f = scan_t = 0
    hits_a = hits_b = hits_ab = scan_a = scan_b = scan_ab = 0
    for q in q_ids:
        qi = int(np.searchsorted(vid, q))
        cos_all = (emb @ emb[qi]) / (nrm * nrm[qi])
        truth = set(top5(cos_all, vid, q))
        # flat arm
        qa = (av @ emb[qi]) / (anrm * nrm[qi])
        probes = np.lexsort((a_ids, -qa))[:p]
        cand = np.where(np.isin(flat_cell, probes))[0]
        scan_f += cand.size
        cos_q = (emb[cand] @ emb[qi]) / (nrm[cand] * nrm[qi])
        hits_f += len(truth & set(top5(cos_q, vid[cand], q)))
        # two-level arm
        qc = (cv[kept] @ emb[qi]) / (cnrm[kept] * nrm[qi])
        probes_c = kept[np.lexsort((c_ids[kept], -qc))[:wc]]
        fins = np.where(np.isin(froute, probes_c))[0]
        qf = (fv[fins] @ emb[qi]) / (fnrm[fins] * nrm[qi])
        probes_f = f_ids[fins[np.lexsort((f_ids[fins], -qf))[:p]]]
        cand = np.where(np.isin(cell, probes_f))[0]
        scan_t += cand.size
        cos_q = (emb[cand] @ emb[qi]) / (nrm[cand] * nrm[qi])
        hits_t += len(truth & set(top5(cos_q, vid[cand], q)))
        # dial (a): multi-assignment membership, nprobe halved
        probes_a = f_ids[fins[np.lexsort((f_ids[fins], -qf))[:p_half]]]
        cand = np.where(np.isin(m2_id[:, 0], probes_a)
                        | ((m2_s[:, 1] > -np.inf) & np.isin(m2_id[:, 1], probes_a)))[0]
        scan_a += cand.size
        cos_q = (emb[cand] @ emb[qi]) / (nrm[cand] * nrm[qi])
        hits_a += len(truth & set(top5(cos_q, vid[cand], q)))
        # dial (b): direct fine-anchor ranking over ALL K anchors
        qf_all = (fv @ emb[qi]) / (fnrm * nrm[qi])
        probes_b = f_ids[np.lexsort((f_ids, -qf_all))[:p]]
        cand = np.where(np.isin(cell, probes_b))[0]
        scan_b += cand.size
        cos_q = (emb[cand] @ emb[qi]) / (nrm[cand] * nrm[qi])
        hits_b += len(truth & set(top5(cos_q, vid[cand], q)))
        # dials (a)+(b): direct ranking + multi-assignment, nprobe halved
        probes_ab = f_ids[np.lexsort((f_ids, -qf_all))[:p_half]]
        cand = np.where(np.isin(m2_id[:, 0], probes_ab)
                        | ((m2_s[:, 1] > -np.inf) & np.isin(m2_id[:, 1], probes_ab)))[0]
        scan_ab += cand.size
        cos_q = (emb[cand] @ emb[qi]) / (nrm[cand] * nrm[qi])
        hits_ab += len(truth & set(top5(cos_q, vid[cand], q)))

    nqf = float(len(q_ids))
    return {
        "sfdir": sfdir, "n": n, "queries": int(nq),
        "k_forced": k, "kc": kc, "nprobe": p, "wc": wc,
        "assignment_dots_per_row": {"flat": k,
                                    "two_level": round(kc + 6 * fine_per_cell, 1)},
        "assignment_wall_s": {"flat": round(flat_assign_s, 2),
                              "two_level": round(two_assign_s, 2)},
        "flat": {"recall_at_5": round(hits_f / (5 * nqf), 4),
                 "scanned_rows_per_query": round(scan_f / nqf, 1)},
        "two_level": {"recall_at_5": round(hits_t / (5 * nqf), 4),
                      "scanned_rows_per_query": round(scan_t / nqf, 1)},
        "recall_ratio_two_level_vs_flat":
            round(hits_t / hits_f, 4) if hits_f else None,
        "dials": {
            "multi_assign_extra_s": round(multi_assign_s, 2),
            "nprobe_halved": p_half,
            "a_multi_assign": {
                "recall_at_5": round(hits_a / (5 * nqf), 4),
                "scanned_rows_per_query": round(scan_a / nqf, 1),
                "ratio_vs_flat": round(hits_a / hits_f, 4) if hits_f else None},
            "b_direct_fine_probe": {
                "recall_at_5": round(hits_b / (5 * nqf), 4),
                "scanned_rows_per_query": round(scan_b / nqf, 1),
                "probe_dots_per_query": k,
                "ratio_vs_flat": round(hits_b / hits_f, 4) if hits_f else None},
            "ab_both": {
                "recall_at_5": round(hits_ab / (5 * nqf), 4),
                "scanned_rows_per_query": round(scan_ab / nqf, 1),
                "ratio_vs_flat": round(hits_ab / hits_f, 4) if hits_f else None},
        },
    }


def run_serve_envelope(sfdir, k_forced, batch_sizes=(1, 8, 64, 512, 4096)):
    """Query-side cost envelope at the beyond-cap point (VERDICT r18 #6):
    q109's coarse-ROUTED probe ranking (kc dots to pick wc coarse cells,
    then rank the ~wc*K/kc fine anchors under them) vs q111's DIRECT
    probe ranking (all K fine-anchor dots per query), measured as
    queries/s over serving batch sizes, with the probe stage and the
    candidate scan separated so the crossover is attributable. Both
    modes scan the SAME single-assign cell layout with the same p, so
    the recall delta is exactly the r18/r19 cap-demo numbers (direct
    0.959 vs routed 0.857 ratio-to-flat) — this tool measures what that
    recall costs in throughput at each batch size."""
    import time
    vid, emb = load(sfdir)
    nrm = np.sqrt((emb * emb).sum(axis=1))
    n = len(vid)
    k = min(k_forced, n)
    kc = 2 * int(np.ceil(np.sqrt(k)))
    p = nprobe(k)
    wc = (2 * kc + 4) // 5
    cell, (c_ids, cv, cnrm, kept), (f_ids, fv, fnrm, froute), _ = \
        chunked_two_level_cells(vid, emb, nrm, k, min(kc, n))
    # Pre-normalized float32 anchor matrices — the serving-layout shape
    # (the engine holds anchors driver-side; a server would hold these).
    f32 = (fv / fnrm[:, None]).astype(np.float32)
    c32 = (cv[kept] / cnrm[kept][:, None]).astype(np.float32)
    # two_level_tables' froute maps fine anchor -> coarse POSITION in the
    # id-sorted coarse table; kept are the positions owning >=1 fine.
    fins_by_pos = {pos: np.where(froute == pos)[0] for pos in kept}
    # Sort corpus rows by cell for contiguous candidate gathers (the
    # bucketed-layout serving shape).
    order = np.argsort(cell, kind="stable")
    cell_s, vid_s = cell[order], vid[order]
    emb_s = (emb[order] / nrm[order][:, None]).astype(np.float32)
    starts = np.searchsorted(cell_s, f_ids, side="left")
    ends = np.searchsorted(cell_s, f_ids, side="right")

    def scan_topk(qv32, probes_fid):
        idx = np.concatenate([np.arange(starts[j], ends[j])
                              for j in np.searchsorted(f_ids, probes_fid)]) \
            if len(probes_fid) else np.empty(0, dtype=np.int64)
        if not idx.size:
            return 0
        s = emb_s[idx] @ qv32
        take = min(5, s.size)
        np.argpartition(-s, take - 1)[:take]
        return idx.size

    rng = np.random.RandomState(11)
    rows = []
    for bs in batch_sizes:
      reps = []
      # Best-of-2 per batch size (the merge_bench discipline): the first
      # rep pays allocator/page-cache warm-up; box noise hits one rep.
      for _rep in range(2):
        qs = rng.choice(n, size=bs, replace=bs > n)
        q32 = (emb[qs] / nrm[qs][:, None]).astype(np.float32)
        # direct probe ranking: (bs x K) matmul + per-query top-p,
        # chunked at 512 queries so a large batch never materializes a
        # GB-scale score matrix (what a real server would do too).
        t0 = time.time()
        direct_probes = np.empty((bs, p), dtype=np.int64)
        for s in range(0, bs, 512):
            sc = q32[s:s + 512] @ f32.T
            direct_probes[s:s + 512] = np.argpartition(-sc, p - 1,
                                                       axis=1)[:, :p]
        direct_probe_s = time.time() - t0
        # routed probe ranking: (bs x kc) matmul -> top-wc coarse ->
        # rank fine anchors under them per query
        t0 = time.time()
        scc = q32 @ c32.T
        topwc = np.argpartition(-scc, min(wc, scc.shape[1]) - 1,
                                axis=1)[:, :wc]
        routed_probes = []
        for qi in range(bs):
            fins = np.concatenate([fins_by_pos[kept[j]] for j in topwc[qi]])
            sf = f32[fins] @ q32[qi]
            take = min(p, sf.size)
            routed_probes.append(fins[np.argpartition(-sf, take - 1)[:take]])
        routed_probe_s = time.time() - t0
        # scan stage (identical layout both modes; scanned rows differ
        # only through the probe set) — time each mode's scan.
        t0 = time.time()
        scanned_d = sum(scan_topk(q32[qi], f_ids[direct_probes[qi]])
                        for qi in range(bs))
        direct_scan_s = time.time() - t0
        t0 = time.time()
        scanned_r = sum(scan_topk(q32[qi], f_ids[routed_probes[qi]])
                        for qi in range(bs))
        routed_scan_s = time.time() - t0
        reps.append({
            "batch": int(bs),
            "direct": {"probe_s": round(direct_probe_s, 4),
                       "scan_s": round(direct_scan_s, 4),
                       "qps": round(bs / max(1e-9, direct_probe_s + direct_scan_s), 1),
                       "scanned_rows_per_query": round(scanned_d / bs, 1)},
            "routed": {"probe_s": round(routed_probe_s, 4),
                       "scan_s": round(routed_scan_s, 4),
                       "qps": round(bs / max(1e-9, routed_probe_s + routed_scan_s), 1),
                       "scanned_rows_per_query": round(scanned_r / bs, 1)},
        })
      best = dict(reps[0])
      for mode_key in ("direct", "routed"):
          best[mode_key] = max((r[mode_key] for r in reps),
                               key=lambda m: m["qps"])
      rows.append(best)
    return {"sfdir": sfdir, "n": n, "k": k, "kc": kc, "wc": wc, "nprobe": p,
            "probe_dots_per_query": {"direct": k,
                                     "routed": kc + wc * (k // max(1, kc))},
            "batches": rows}


def main():
    argv = sys.argv[1:]
    mode = "flat"
    if argv and argv[0] in ("two_level", "cap", "serve_envelope"):
        mode = argv[0]
        argv = argv[1:]
    nq = 100
    if "--queries" in argv:
        i = argv.index("--queries")
        nq = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    k_forced = 65536
    if "--k" in argv:
        i = argv.index("--k")
        k_forced = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = argv
    out_path, sfdirs = args[0], args[1:]

    if mode == "cap":
        rep = run_cap_demo(sfdirs[0], nq, k_forced)
        with open(out_path, "w") as f:
            json.dump({"probe": "ivf beyond-cap two-level demo (VERDICT r16 #2)",
                       **rep}, f, indent=1)
        print(json.dumps(rep))
        print(f"wrote {out_path}")
        return

    if mode == "serve_envelope":
        rep = run_serve_envelope(sfdirs[0], k_forced)
        with open(out_path, "w") as f:
            json.dump({"probe": "beyond-cap QUERY-side envelope: direct vs "
                                "coarse-routed probe ranking (VERDICT r18 #6)",
                       **rep}, f, indent=1)
        print(json.dumps(rep))
        print(f"wrote {out_path}")
        return

    report = {}
    for sfdir in sfdirs:
        vid, emb = load(sfdir)
        nrm = np.sqrt((emb * emb).sum(axis=1))
        n = len(vid)
        q_ids = vid[:nq]  # the smallest vec_ids — superset of q49's <5 batch
        ks = anchor_k(n)
        p = nprobe(ks)
        if mode == "two_level":
            flat = run_arm(vid, emb, nrm, q_ids, ks, p)
            kc2 = 2 * int(np.ceil(np.sqrt(ks)))
            wc = (2 * kc2 + 4) // 5            # ceil(2*kc/5), the engine formula
            two = run_two_level(vid, emb, nrm, q_ids, ks, p, wc)
            ratio = (round(two["recall_at_5"] / flat["recall_at_5"], 4)
                     if flat["recall_at_5"] else None)
            report[sfdir] = {"n": n, "queries": int(len(q_ids)),
                             "flat_scaled": flat, "two_level": two,
                             "recall_ratio_two_level_vs_flat": ratio}
            print(f"{sfdir}: n={n} flat={flat} two_level={two} ratio={ratio}")
        else:
            fixed = run_arm(vid, emb, nrm, q_ids, 64, 1)
            scaled = run_arm(vid, emb, nrm, q_ids, ks, p)
            report[sfdir] = {"n": n, "queries": int(len(q_ids)),
                             "fixed_64_nprobe1": fixed, "scaled": scaled}
            print(f"{sfdir}: n={n} fixed={fixed} scaled={scaled}")
    with open(out_path, "w") as f:
        json.dump({"probe": f"ivf {mode} probe, numpy mirror of Similarity.scala",
                   "arms": report}, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
