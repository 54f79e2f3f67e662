"""Exact rotated-rectangle IoU as fixed-shape, vectorized XLA.

TPU-native replacement for detectron2's CUDA ``pairwise_iou_rotated``
(reference call sites: ``test.py:135`` for mAP matching, ``lib/general.py``
NMS path).  Box convention matches detectron2: ``(cx, cy, w, h, angle)`` with
``angle`` in **degrees**; ``w`` spans the local x axis and ``h`` the local y
axis before rotation.  (The reference converts its radian long-side boxes to
degrees right before calling detectron2 — ``lib/general.py:174``,
``test.py:127-128`` — so this op keeps the same input contract.)

Algorithm: Sutherland–Hodgman clipping of rectangle A's 4-gon by the four
half-planes of rectangle B, on a **fixed 8-vertex duplicate-fill ring**:

  * the polygon always occupies all 8 slots; unused slots repeat the last
    vertex, so "next vertex" is a static roll (no mod-count gathers), the
    closing edge is slot 7 -> slot 0, and duplicates contribute zero to both
    crossing tests and the shoelace sum;
  * each clip emits <= 16 candidate points whose compacted ring positions
    are recovered with a prefix-sum + one-hot contraction — pure FMA work,
    no per-pair sort or scatter, so the same math lowers cleanly to the VPU
    (and to Pallas) and vectorizes over arbitrary batch shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_V = 8  # convex quad ∩ convex quad has at most 8 vertices


def box_to_corners(boxes: jax.Array) -> jax.Array:
    """``(..., 5)`` (cx, cy, w, h, angle_deg) -> corners ``(..., 4, 2)``.

    detectron2 layout: local x extent = w, local y extent = h, rotated by
    ``angle`` degrees.  Corner winding is consistent; only consistency
    matters for the clipping below.
    """
    cx, cy, w, h, a = jnp.split(boxes, 5, axis=-1)
    t = a * (jnp.pi / 180.0)
    c, s = jnp.cos(t), jnp.sin(t)
    dx = jnp.stack([w, -w, -w, w], axis=-2) / 2.0  # (..., 4, 1)
    dy = jnp.stack([h, h, -h, -h], axis=-2) / 2.0
    px = cx[..., None, :] + c[..., None, :] * dx - s[..., None, :] * dy
    py = cy[..., None, :] + s[..., None, :] * dx + c[..., None, :] * dy
    return jnp.concatenate([px, py], axis=-1)  # (..., 4, 2)


_EPS_INSIDE = 1e-4  # px; tolerance for on-edge vertices (see below)


def _clip_ring(px, py, p0x, p0y, nx, ny):
    """One S–H clip of a duplicate-fill 8-ring against a half-plane.

    px, py: ``(8, ...)`` vertex ring; p0*/n*: point on the clip line and its
    inward **unit** normal, ``(...,)``.  Returns the clipped ``(8, ...)``
    ring.  Vertices within ``_EPS_INSIDE`` of the line count as inside —
    identical/touching rectangles are numerically knife-edge (a corner's
    signed distance may come out at ±1e-6 depending on op ordering) and the
    tolerance keeps such pairs exact instead of collapsing to half-area.
    """
    d = (px - p0x) * nx + (py - p0y) * ny  # (8, ...), in length units
    nxt_px = jnp.roll(px, -1, axis=0)
    nxt_py = jnp.roll(py, -1, axis=0)
    d_nxt = jnp.roll(d, -1, axis=0)

    # Skip duplicate-fill vertices (exact copies of their predecessor): with
    # dedup the emission count is provably <= 8, so no candidate can be
    # pushed past the ring capacity.
    dup = (px == jnp.roll(px, 1, axis=0)) & (py == jnp.roll(py, 1, axis=0))
    inside = d >= -_EPS_INSIDE
    inside_nxt = d_nxt >= -_EPS_INSIDE
    cur_in = inside & jnp.logical_not(dup)
    crossing = inside ^ inside_nxt
    denom = d - d_nxt
    t = jnp.where(crossing, d / jnp.where(denom == 0, 1.0, denom), 0.0)
    ix = px + t * (nxt_px - px)
    iy = py + t * (nxt_py - py)

    # Interleaved emission: slot 2i = vertex-if-inside, 2i+1 = crossing.
    emit = jnp.stack([cur_in, crossing], axis=1).reshape(
        (2 * _V,) + d.shape[1:]
    ).astype(px.dtype)
    ex = jnp.stack([px, ix], axis=1).reshape(emit.shape)
    ey = jnp.stack([py, iy], axis=1).reshape(emit.shape)

    # Ring positions via prefix sum; compact via one-hot contraction.
    pos = jnp.cumsum(emit, axis=0) - emit  # position of slot i if emitted
    count = pos[-1] + emit[-1]             # (...,) number emitted (float)

    out_x = []
    out_y = []
    lastsel = emit * (pos == jnp.maximum(count - 1.0, 0.0)).astype(px.dtype)
    last_x = jnp.sum(ex * lastsel, axis=0)
    last_y = jnp.sum(ey * lastsel, axis=0)
    for j in range(_V):
        sel = emit * (pos == float(j)).astype(px.dtype)
        vx = jnp.sum(ex * sel, axis=0)
        vy = jnp.sum(ey * sel, axis=0)
        use = count > float(j)
        out_x.append(jnp.where(use, vx, last_x))
        out_y.append(jnp.where(use, vy, last_y))
    return jnp.stack(out_x, 0), jnp.stack(out_y, 0)


def _ring_area(px, py):
    """Shoelace over the closed 8-ring (duplicates contribute zero)."""
    nx_ = jnp.roll(px, -1, axis=0)
    ny_ = jnp.roll(py, -1, axis=0)
    return 0.5 * jnp.abs(jnp.sum(px * ny_ - py * nx_, axis=0))


def rotated_rect_intersection_area(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Exact intersection area of paired rotated rects ``(..., 5)`` (degrees)."""
    boxes1, boxes2 = jnp.broadcast_arrays(boxes1, boxes2)
    # Center on box2: kills catastrophic cancellation at large coordinates
    # (the class-offset NMS trick shifts centers by cls*4096,
    # lib/general.py:171-173).
    shift = jnp.concatenate(
        [boxes2[..., 0:2], jnp.zeros_like(boxes2[..., 2:])], axis=-1
    )
    corners = box_to_corners(boxes1 - shift)  # (..., 4, 2)
    # duplicate-fill ring, vertex-major layout (8, ...)
    idx = [0, 1, 2, 3, 3, 3, 3, 3]
    px = jnp.moveaxis(corners[..., idx, 0], -1, 0)
    py = jnp.moveaxis(corners[..., idx, 1], -1, 0)

    clip_c = box_to_corners(boxes2 - shift)  # (..., 4, 2), centered at 0
    for e in range(4):
        p0x = clip_c[..., e, 0]
        p0y = clip_c[..., e, 1]
        p1x = clip_c[..., (e + 1) % 4, 0]
        p1y = clip_c[..., (e + 1) % 4, 1]
        ex_ = p1x - p0x
        ey_ = p1y - p0y
        inv_len = jax.lax.rsqrt(jnp.maximum(ex_ * ex_ + ey_ * ey_, 1e-12))
        nx = -ey_ * inv_len
        ny = ex_ * inv_len
        # Orient the unit normal inward (toward the clip rect's center, 0).
        sgn = jnp.sign((0.0 - p0x) * nx + (0.0 - p0y) * ny)
        sgn = jnp.where(sgn == 0, 1.0, sgn)
        px, py = _clip_ring(px, py, p0x, p0y, nx * sgn, ny * sgn)
    return _ring_area(px, py)


def rotated_iou_pairs(boxes1: jax.Array, boxes2: jax.Array) -> jax.Array:
    """Elementwise IoU of two broadcast-compatible sets of rotated boxes."""
    b1 = boxes1.astype(jnp.float32)
    b2 = boxes2.astype(jnp.float32)
    inter = rotated_rect_intersection_area(b1, b2)
    b1, b2 = jnp.broadcast_arrays(b1, b2)
    a1 = b1[..., 2] * b1[..., 3]
    a2 = b2[..., 2] * b2[..., 3]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.where(union == 0, 1.0, union), 0.0)


@functools.partial(jax.jit, static_argnames=("row_block",))
def pairwise_rotated_iou(boxes1: jax.Array, boxes2: jax.Array,
                         row_block: int = 256) -> jax.Array:
    """Full N×M skew-IoU matrix (degrees convention), tiled over rows.

    Drop-in equivalent of detectron2's ``pairwise_iou_rotated``
    (``test.py:135``).  Row-tiling bounds the live intermediate buffers at
    ``row_block × M`` pairs so large eval workloads stay under memory
    pressure.
    """
    n = boxes1.shape[0]
    m = boxes2.shape[0]
    if n == 0 or m == 0:
        return jnp.zeros((n, m), jnp.float32)
    rb = min(row_block, max(n, 1))
    n_pad = ((n + rb - 1) // rb) * rb
    b1 = jnp.pad(boxes1.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    chunks = b1.reshape(n_pad // rb, rb, 5)

    def one_chunk(rows):
        return rotated_iou_pairs(rows[:, None, :], boxes2[None, :, :])

    iou = jax.lax.map(one_chunk, chunks).reshape(n_pad, m)
    return iou[:n]


def _bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def pairwise_rotated_iou_host(boxes1, boxes2) -> "np.ndarray":
    """Host-friendly pairwise IoU with shape bucketing.

    Eval matching calls this with a different (N, M) per image/class
    (``test.py:135``); padding both dims to power-of-two buckets caps the
    number of distinct XLA compilations at ~log² instead of unbounded.
    """
    import numpy as np

    b1 = np.asarray(boxes1, np.float32)
    b2 = np.asarray(boxes2, np.float32)
    n, m = len(b1), len(b2)
    if n == 0 or m == 0:
        return np.zeros((n, m), np.float32)
    nb, mb = _bucket(n), _bucket(m)
    p1 = np.zeros((nb, 5), np.float32)
    p2 = np.zeros((mb, 5), np.float32)
    # padding boxes are unit squares far away: harmless, non-degenerate
    p1[:, :2] = 1e7
    p1[:, 2:4] = 1.0
    p2[:, :2] = -1e7
    p2[:, 2:4] = 1.0
    p1[:n] = b1
    p2[:m] = b2
    iou = pairwise_rotated_iou(jnp.asarray(p1), jnp.asarray(p2))
    return np.asarray(iou)[:n, :m]
