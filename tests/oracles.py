"""Independent host-side oracles for rotated-geometry parity tests.

Deliberately implemented with a *different* algorithmic style (dynamic
Python lists, double precision) than the fixed-shape XLA kernels so that
agreement is meaningful evidence of correctness.
"""

import math

import numpy as np


def corners_d2(box):
    """detectron2-convention corners of (cx, cy, w, h, angle_deg)."""
    cx, cy, w, h, a = box
    t = math.radians(a)
    c, s = math.cos(t), math.sin(t)
    pts = []
    for dx, dy in [(w / 2, h / 2), (-w / 2, h / 2), (-w / 2, -h / 2), (w / 2, -h / 2)]:
        pts.append((cx + c * dx - s * dy, cy + s * dx + c * dy))
    return pts


def _clip(poly, p0, p1, inside_pt):
    """Clip polygon by the line p0->p1, keeping the side containing inside_pt."""
    ex, ey = p1[0] - p0[0], p1[1] - p0[1]
    nx, ny = -ey, ex
    ref = (inside_pt[0] - p0[0]) * nx + (inside_pt[1] - p0[1]) * ny
    if ref < 0:
        nx, ny = -nx, -ny

    def dist(q):
        return (q[0] - p0[0]) * nx + (q[1] - p0[1]) * ny

    out = []
    n = len(poly)
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        dc, dn = dist(cur), dist(nxt)
        if dc >= 0:
            out.append(cur)
        if (dc >= 0) != (dn >= 0):
            t = dc / (dc - dn)
            out.append((cur[0] + t * (nxt[0] - cur[0]), cur[1] + t * (nxt[1] - cur[1])))
    return out


def poly_area(poly):
    n = len(poly)
    if n < 3:
        return 0.0
    s = 0.0
    for i in range(n):
        x0, y0 = poly[i]
        x1, y1 = poly[(i + 1) % n]
        s += x0 * y1 - y0 * x1
    return abs(s) / 2.0


def rotated_iou_oracle(box1, box2):
    """Exact IoU of two (cx, cy, w, h, angle_deg) boxes, float64."""
    poly = corners_d2(box1)
    clip = corners_d2(box2)
    center2 = (box2[0], box2[1])
    for e in range(4):
        if not poly:
            break
        poly = _clip(poly, clip[e], clip[(e + 1) % 4], center2)
    inter = poly_area(poly)
    a1 = box1[2] * box1[3]
    a2 = box2[2] * box2[3]
    union = a1 + a2 - inter
    return inter / union if union > 0 else 0.0


def pairwise_iou_oracle(boxes1, boxes2):
    out = np.zeros((len(boxes1), len(boxes2)))
    for i, b1 in enumerate(boxes1):
        for j, b2 in enumerate(boxes2):
            out[i, j] = rotated_iou_oracle(b1, b2)
    return out


def nms_oracle(boxes, scores, thr):
    """Greedy rotated NMS; returns kept input indices by descending score."""
    order = np.argsort(-np.asarray(scores), kind="stable")
    keep = []
    for i in order:
        ok = True
        for j in keep:
            if rotated_iou_oracle(boxes[i], boxes[j]) > thr:
                ok = False
                break
        if ok:
            keep.append(i)
    return np.array(keep, dtype=np.int64)


def monte_carlo_iou(box1, box2, n=400_000, seed=0):
    """Sampling-based IoU estimate — an algorithm-free sanity oracle."""
    rng = np.random.default_rng(seed)
    cs = np.array([corners_d2(box1), corners_d2(box2)]).reshape(-1, 2)
    lo, hi = cs.min(0) - 1e-6, cs.max(0) + 1e-6
    pts = rng.uniform(lo, hi, size=(n, 2))

    def inside(box):
        cx, cy, w, h, a = box
        t = math.radians(a)
        c, s = math.cos(t), math.sin(t)
        dx = (pts[:, 0] - cx) * c + (pts[:, 1] - cy) * s
        dy = -(pts[:, 0] - cx) * s + (pts[:, 1] - cy) * c
        return (np.abs(dx) <= w / 2) & (np.abs(dy) <= h / 2)

    in1, in2 = inside(box1), inside(box2)
    inter = (in1 & in2).sum()
    union = (in1 | in2).sum()
    return inter / union if union else 0.0
