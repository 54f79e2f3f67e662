"""Pallas TPU kernel: tiled pairwise rotated-rectangle IoU.

The VPU fast path for the eval matcher and NMS (`pairwise_iou_rotated`
replacement — SURVEY.md §2.10).  Same duplicate-fill-ring Sutherland–
Hodgman formulation as :mod:`ryolo_tpu.ops.rotated_iou`, but expressed as a
Pallas grid over (row-tile × col-tile) pair blocks with the 8-vertex rings
held as unrolled per-vertex 2-D registers — no gathers, sorts, or scatters,
pure elementwise VPU work on ``(TM, TN)`` tiles.

Inputs are the transposed component layout ``(8, N)`` / ``(8, M)`` (rows:
cx, cy, w, h, angle_deg, then zero padding) so the lane dimension is the
box axis and tiles align to the (8, 128) float32 register shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_V = 8


_EPS_INSIDE = 1e-4  # px; on-edge tolerance (see rotated_iou._clip_ring)


def _clip_ring_unrolled(rx, ry, p0x, p0y, nx, ny):
    """One half-plane clip; rings are Python lists of 8 (TM, TN) arrays.

    ``nx, ny`` must be the inward **unit** normal so the tolerance is in
    length units.
    """
    d = [(rx[i] - p0x) * nx + (ry[i] - p0y) * ny for i in range(_V)]

    emit, ex, ey = [], [], []
    for i in range(_V):
        j = (i + 1) % _V
        dup = (rx[i] == rx[i - 1]) & (ry[i] == ry[i - 1])
        cur_in = (d[i] >= -_EPS_INSIDE) & jnp.logical_not(dup)
        crossing = (d[i] >= -_EPS_INSIDE) ^ (d[j] >= -_EPS_INSIDE)
        denom = d[i] - d[j]
        t = jnp.where(crossing, d[i] / jnp.where(denom == 0, 1.0, denom), 0.0)
        emit.append(cur_in.astype(rx[i].dtype))
        ex.append(rx[i])
        ey.append(ry[i])
        emit.append(crossing.astype(rx[i].dtype))
        ex.append(rx[i] + t * (rx[j] - rx[i]))
        ey.append(ry[i] + t * (ry[j] - ry[i]))

    # prefix positions
    pos = []
    run = jnp.zeros_like(emit[0])
    for e in emit:
        pos.append(run)
        run = run + e
    count = run

    last_sel = [emit[i] * (pos[i] == jnp.maximum(count - 1.0, 0.0))
                for i in range(2 * _V)]
    last_x = sum(ex[i] * last_sel[i] for i in range(2 * _V))
    last_y = sum(ey[i] * last_sel[i] for i in range(2 * _V))

    out_x, out_y = [], []
    for v in range(_V):
        sel = [emit[i] * (pos[i] == float(v)) for i in range(2 * _V)]
        vx = sum(ex[i] * sel[i] for i in range(2 * _V))
        vy = sum(ey[i] * sel[i] for i in range(2 * _V))
        use = count > float(v)
        out_x.append(jnp.where(use, vx, last_x))
        out_y.append(jnp.where(use, vy, last_y))
    return out_x, out_y


def _iou_tile_kernel(b1_ref, b2_ref, out_ref):
    deg2rad = jnp.float32(jnp.pi / 180.0)
    # row boxes (TM,) -> column vectors; col boxes (TN,) -> row vectors
    cx1 = b1_ref[0, :][:, None]
    cy1 = b1_ref[1, :][:, None]
    w1 = b1_ref[2, :][:, None]
    h1 = b1_ref[3, :][:, None]
    t1 = b1_ref[4, :][:, None] * deg2rad
    cx2 = b2_ref[0, :][None, :]
    cy2 = b2_ref[1, :][None, :]
    w2 = b2_ref[2, :][None, :]
    h2 = b2_ref[3, :][None, :]
    t2 = b2_ref[4, :][None, :] * deg2rad

    c1, s1 = jnp.cos(t1), jnp.sin(t1)
    c2, s2 = jnp.cos(t2), jnp.sin(t2)

    # Center the pair on box2 (numerical robustness at large coordinates,
    # e.g. the class-offset NMS trick) — box2 center becomes the origin.
    rel_x = cx1 - cx2
    rel_y = cy1 - cy2

    # subject ring: corners of box1 (duplicate-fill slots 4..7)
    sx, sy = [], []
    for dx, dy in ((0.5, 0.5), (-0.5, 0.5), (-0.5, -0.5), (0.5, -0.5)):
        sx.append(rel_x + c1 * (w1 * dx) - s1 * (h1 * dy))
        sy.append(rel_y + s1 * (w1 * dx) + c1 * (h1 * dy))
    for _ in range(4):
        sx.append(sx[3])
        sy.append(sy[3])

    # clip-rect corners (box2, centered at origin)
    zero = 0.0 * rel_x
    qx, qy = [], []
    for dx, dy in ((0.5, 0.5), (-0.5, 0.5), (-0.5, -0.5), (0.5, -0.5)):
        qx.append(zero + c2 * (w2 * dx) - s2 * (h2 * dy))
        qy.append(zero + s2 * (w2 * dx) + c2 * (h2 * dy))

    for e in range(4):
        p0x, p0y = qx[e], qy[e]
        p1x, p1y = qx[(e + 1) % 4], qy[(e + 1) % 4]
        ex_ = p1x - p0x
        ey_ = p1y - p0y
        inv_len = jax.lax.rsqrt(jnp.maximum(ex_ * ex_ + ey_ * ey_, 1e-12))
        nx = -ey_ * inv_len
        ny = ex_ * inv_len
        sgn = jnp.sign(-p0x * nx - p0y * ny)
        sgn = jnp.where(sgn == 0, 1.0, sgn)
        sx, sy = _clip_ring_unrolled(sx, sy, p0x, p0y, nx * sgn, ny * sgn)

    acc = jnp.zeros_like(sx[0])
    for i in range(_V):
        j = (i + 1) % _V
        acc = acc + sx[i] * sy[j] - sy[i] * sx[j]
    inter = 0.5 * jnp.abs(acc)

    a1 = w1 * h1
    a2 = w2 * h2
    union = a1 + a2 - inter
    out_ref[:, :] = jnp.where(
        union > 0, inter / jnp.where(union == 0, 1.0, union), 0.0
    )


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def pairwise_rotated_iou_pallas(boxes1: jax.Array, boxes2: jax.Array,
                                tm: int = 128, tn: int = 128,
                                interpret: bool = False) -> jax.Array:
    """N×M skew-IoU matrix via the Pallas tile kernel.

    Pads N and M up to tile multiples; padding boxes are zero-sized (IoU 0).
    """
    n, m = boxes1.shape[0], boxes2.shape[0]
    if n == 0 or m == 0:
        return jnp.zeros((n, m), jnp.float32)
    n_pad = ((n + tm - 1) // tm) * tm
    m_pad = ((m + tn - 1) // tn) * tn
    b1 = jnp.zeros((8, n_pad), jnp.float32)
    b1 = b1.at[:5, :n].set(boxes1.astype(jnp.float32).T)
    b2 = jnp.zeros((8, m_pad), jnp.float32)
    b2 = b2.at[:5, :m].set(boxes2.astype(jnp.float32).T)

    out = pl.pallas_call(
        _iou_tile_kernel,
        grid=(n_pad // tm, m_pad // tn),
        in_specs=[
            pl.BlockSpec((8, tm), lambda i, j: (0, i)),
            pl.BlockSpec((8, tn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(b1, b2)
    return out[:n, :m]
