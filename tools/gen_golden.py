#!/usr/bin/env python3
"""Golden-fixture generator (dev tool only; the engine is pure Scala).

Executes the REFERENCE'S OWN code at /root/reference/ to produce expected
values for the graft.geo ScalaTest suite, so the Scala port is verified
against the real semantics, not a re-derivation:

- bbox.py / bbox_grouping.py / orientation.py are loaded as modules
  directly (bypassing the package __init__, which needs dagster).
- point_to_3d_line / get_image_dimensions are extracted textually from
  street_level_grouping.py (the module itself imports dagster/cv2) and
  exec'd against numpy + the loaded Orientation.
- Equirec2Perspec free functions are extracted the same way; the single
  cv2 call (cv2.Rodrigues) is shimmed with the closed-form Rodrigues
  formula in numpy — an implementation independent of the Scala port.

Outputs JSON fixtures under src/test/resources/golden/.
"""
import importlib.util
import json
import random
import re
import sys
import types

import numpy as np

REF = "/root/reference/heritage-guard/heritage_guard"
OUT = "src/test/resources/golden"


def load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def extract_def(src, name):
    """Extract a top-level (or decorated) function def by name."""
    pat = re.compile(rf"^(@op\n)?def {name}\(", re.M)
    m = pat.search(src)
    assert m, name
    start = src.index(f"def {name}(", m.start())
    lines = src[start:].split("\n")
    body = [lines[0]]
    for line in lines[1:]:
        if line.strip() and not line.startswith((" ", "\t", ")")):
            break
        body.append(line)
    return "\n".join(body)


bb = load_module("ref_bbox", f"{REF}/entities/bbox.py")
orient = load_module("ref_orientation", f"{REF}/entities/orientation.py")
bg_src = open(f"{REF}/entities/bbox_grouping.py").read()
ns_bg = {}
exec(bg_src, ns_bg)
BBox, BBoxGrouping, Orientation = bb.BBox, ns_bg["BBoxGrouping"], orient.Orientation

slg_src = open(f"{REF}/assets/street_level_grouping/street_level_grouping.py").read()
ns_slg = {"np": np, "Orientation": Orientation, "Tuple": tuple, "Point3D": tuple}
exec(extract_def(slg_src, "point_to_3d_line"), ns_slg)
point_to_3d_line = ns_slg["point_to_3d_line"]

# cv2 shim: closed-form Rodrigues (independent of the Scala port).
def _rodrigues(v):
    v = np.asarray(v, dtype=np.float64).reshape(3)
    theta = np.linalg.norm(v)
    if theta < 1e-15:
        return np.eye(3), None
    k = v / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) * np.cos(theta) + np.sin(theta) * K + (1 - np.cos(theta)) * np.outer(k, k)
    return R, None

cv2_shim = types.ModuleType("cv2")
cv2_shim.Rodrigues = _rodrigues
e2p_src = open(f"{REF}/helpers/Equirec2Perspec.py").read()
ns_e2p = {"np": np, "cv2": cv2_shim}
for fn in ["xyz2lonlat", "lonlat2XY", "compute_calib_matrix",
           "compute_rotation_matrix", "transform_coords"]:
    exec(extract_def(e2p_src, fn), ns_e2p)


def get_bbox_inverse(FOV, THETA, PHI, height, width, bbox, img_h, img_w):
    """Replica of Equirectangular.GetBboxInverse (Equirec2Perspec.py:93-119)
    using the extracted reference functions (the method itself needs an
    image on disk; only self._img.shape is used)."""
    K, K_inv = ns_e2p["compute_calib_matrix"](width, height, FOV)
    R = ns_e2p["compute_rotation_matrix"](THETA, PHI)
    bbox_3d = np.array([
        [bbox[0], bbox[1], 1], [bbox[2], bbox[1], 1],
        [bbox[0], bbox[3], 1], [bbox[2], bbox[3], 1]])
    t = ns_e2p["transform_coords"](bbox_3d, K_inv, R)
    lonlat = ns_e2p["xyz2lonlat"](t)
    XY = ns_e2p["lonlat2XY"](lonlat, shape=(img_h, img_w, 3)).astype(np.int32)
    return [int(XY[:, 0].min()), int(XY[:, 1].min()),
            int(XY[:, 0].max()), int(XY[:, 1].max())]


rng = random.Random(42)


def rand_bbox(W=8000, H=4000):
    kind = rng.random()
    if kind < 0.6:  # normal box
        x1 = rng.uniform(0, W - 400)
        w = rng.uniform(10, 1500)
        x2 = min(x1 + w, W - 1)
    elif kind < 0.8:  # seam-ish: raw span > 95% of W triggers the swap
        x1 = rng.uniform(0, 200)
        x2 = rng.uniform(0.951 * W + x1, W - 1) if 0.951 * W + x1 < W - 1 else W - 1
    else:  # already-swapped style: x1 > x2
        x1 = rng.uniform(0.8 * W, W - 1)
        x2 = rng.uniform(0, 0.2 * W)
    y1 = rng.uniform(0, H - 200)
    y2 = y1 + rng.uniform(5, 800)
    return [round(x1, 3), round(y1, 3), round(x2, 3), round(y2, 3)]


# ── IoU cases ────────────────────────────────────────────────────────────
iou_cases = []
for _ in range(120):
    W, H = rng.choice([(8000, 4000), (4000, 2000), (1000, 500)])
    a, b = rand_bbox(W, H), rand_bbox(W, H)
    ba = BBox(tuple(a), 0.0, None, W, H)
    bbx = BBox(tuple(b), 0.0, None, W, H)
    iou_cases.append({
        "a": a, "b": b, "W": W, "H": H,
        "iou": ba.calculate_iou(bbx),
        "a_props": {"width": float(ba.width), "height": float(ba.height),
                    "area": float(ba.area),
                    "center": [float(ba.center[0]), float(ba.center[1])],
                    "theta_min": float(ba.theta_min), "theta_max": float(ba.theta_max),
                    "x_min": float(ba.x_min), "x_max": float(ba.x_max)},
    })

# ── Grouping cases ───────────────────────────────────────────────────────
group_cases = []
for case in range(30):
    W, H = 8000, 4000
    n = rng.randint(1, 14)
    # Clustered boxes so groups of size >1 actually occur.
    boxes = []
    for _ in range(n):
        if boxes and rng.random() < 0.5:
            seed = rng.choice(boxes)
            dx, dy = rng.uniform(-120, 120), rng.uniform(-120, 120)
            b = [max(0, min(W - 1, seed[0] + dx)), max(0, min(H - 1, seed[1] + dy)),
                 max(0, min(W - 1, seed[2] + dx)), max(0, min(H - 1, seed[3] + dy))]
            boxes.append([round(v, 3) for v in b])
        else:
            boxes.append(rand_bbox(W, H))
    instances = [BBox(tuple(b), 0.0, None, W, H) for b in boxes]
    g = BBoxGrouping(instances, 0.01)
    g.calculate_similarity_matrix()
    g.group_bboxes()
    group_cases.append({"W": W, "H": H, "boxes": boxes, "threshold": 0.01,
                        "groups": g.groups})

# ── point_to_3d_line cases ───────────────────────────────────────────────
ray_cases = []
for _ in range(60):
    W, H = rng.choice([(8000, 4000), (11000, 5500)])
    x, y = rng.randint(0, W - 1), rng.randint(0, H - 1)
    roll, pitch, heading = rng.uniform(-5, 5), rng.uniform(-5, 5), rng.uniform(0, 360)
    # Reference pose fixups (street_level_grouping.py:185-188):
    o = Orientation(roll=-roll, pitch=pitch, heading=heading + 90).rads
    origin = (rng.uniform(-100, 2000), rng.uniform(-100, 2000), rng.uniform(50, 150))
    length = rng.choice([1, 1, 5, 40])
    res = point_to_3d_line((x, y), o, origin, W, H, length)
    ray_cases.append({
        "x": x, "y": y, "roll": roll, "pitch": pitch, "heading": heading,
        "origin": list(origin), "W": W, "H": H, "length": length,
        "result": [float(res[0]), float(res[1]), float(res[2])]})

# ── bboxTo360 cases ──────────────────────────────────────────────────────
bbox360_cases = []
for _ in range(60):
    fov = rng.choice([60, 90, 45])
    theta = rng.choice([0, 45, 90, 135, 180, 225, 270, 315])
    phi = rng.choice([-10, 0, 15])
    vh = vw = 1000
    x1 = rng.randint(0, vw - 100); x2 = rng.randint(x1 + 10, vw - 1)
    y1 = rng.randint(0, vh - 100); y2 = rng.randint(y1 + 10, vh - 1)
    img_w, img_h = 8000, 4000
    res = get_bbox_inverse(fov, theta, phi, vh, vw, [x1, y1, x2, y2], img_h, img_w)
    bbox360_cases.append({
        "fov": fov, "theta": theta, "phi": phi, "vh": vh, "vw": vw,
        "bbox": [x1, y1, x2, y2], "img_w": img_w, "img_h": img_h, "result": res})

# ── seam-shift invariants from the reference ─────────────────────────────
shift_cases = []
for _ in range(40):
    W, H = 8000, 4000
    a, b = rand_bbox(W, H), rand_bbox(W, H)
    shift = rng.randint(1, W - 1)

    def shifted(bx):
        return [(bx[0] + shift) % W, bx[1], (bx[2] + shift) % W, bx[3]]

    i0 = BBox(tuple(a), 0.0, None, W, H).calculate_iou(BBox(tuple(b), 0.0, None, W, H))
    i1 = BBox(tuple(shifted(a)), 0.0, None, W, H).calculate_iou(
        BBox(tuple(shifted(b)), 0.0, None, W, H))
    shift_cases.append({"a": a, "b": b, "shift": shift, "W": W, "H": H,
                        "iou_orig": i0, "iou_shifted": i1})

import os
os.makedirs(OUT, exist_ok=True)
for name, data in [("iou_cases", iou_cases), ("group_cases", group_cases),
                   ("ray_cases", ray_cases), ("bbox360_cases", bbox360_cases),
                   ("shift_cases", shift_cases)]:
    with open(f"{OUT}/{name}.json", "w") as f:
        json.dump(data, f)
    print(f"{name}: {len(data)} cases")
print("done")
