"""Fixed-shape YOLOv5-style target assignment (the PyTorch→XLA redesign).

The reference's ``build_targets`` (``lib/loss.py:270-331`` CSL,
``:427-492`` KFIoU) builds *dynamically sized* index lists via boolean
indexing (wh-ratio filter, angle gate, neighbor-cell expansion).  On TPU
every shape must be static, so the assignment is re-expressed as a dense
candidate lattice

    ``(B, T, na, 5)``  =  batch × padded-targets × anchors × {center,4 neighbors}

with a boolean validity mask combining:
  * target padding mask,
  * wh-ratio gate ``max(r, 1/r).max < 4`` (``lib/loss.py:297-298``),
  * (KFIoU) angle gate ``|cos(θ_t - θ_a)| > 0.866`` (``lib/loss.py:457-459``),
  * per-offset neighbor gates with ``g = 0.5`` bias (``lib/loss.py:302-310``).

Downstream losses gather predictions at the flattened candidate cells and
use masked means, reproducing the reference's dynamic ``.mean()`` exactly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

# Neighbor offsets, lib/loss.py:281-284 (g = 0.5 bias): center, +x, +y, -x, -y.
OFFSETS = jnp.array(
    [[0.0, 0.0], [0.5, 0.0], [0.0, 0.5], [-0.5, 0.0], [0.0, -0.5]],
    jnp.float32,
)
N_OFF = 5


class Candidates(NamedTuple):
    """Flattened per-level assignment, all shapes ``(B, K)`` with K = T·na·5."""

    valid: jax.Array      # bool — candidate participates in the loss
    cls: jax.Array        # int32 — target class
    anchor: jax.Array     # int32 — anchor index within the level
    cell: jax.Array       # int32 — flattened (gj*gw + gi)*na + a cell index
    #                       (row order of the NHWC head map viewed as
    #                        (B, gh*gw*na, nf) — a FREE reshape, since the
    #                        channel packing is anchor-major)
    txy: jax.Array        # (B, K, 2) cell-relative target xy (in [-0.5, 1.5])
    twh: jax.Array        # (B, K, 2) target wh in grid units
    ttheta: jax.Array     # target angle (radians)
    tcsl: Optional[jax.Array]  # (B, K, 180) CSL bins or None


def build_candidates(
    tgt: jax.Array,          # (B, T, 6) [cls, x, y, w, h, theta] normalized
    tgt_mask: jax.Array,     # (B, T) bool
    anchors_lvl: jax.Array,  # (na, 2) or (na, 3) grid-unit anchors
    gh: int,
    gw: int,
    tgt_csl: Optional[jax.Array] = None,  # (B, T, 180)
    angle_gate: bool = False,
) -> Candidates:
    B, T = tgt.shape[:2]
    na = anchors_lvl.shape[0]

    gain = jnp.array([gw, gh], jnp.float32)
    gxy = tgt[..., 1:3] * gain            # (B, T, 2) grid-space center
    gwh = tgt[..., 3:5] * gain            # (B, T, 2)
    theta = tgt[..., 5]

    # wh-ratio anchor gate (lib/loss.py:297-298)
    r = gwh[:, :, None, :] / jnp.maximum(anchors_lvl[None, None, :, :2], 1e-9)
    r = jnp.where(tgt_mask[:, :, None, None], r, 1.0)  # sanitize padding rows
    ratio = jnp.maximum(r, 1.0 / jnp.maximum(r, 1e-9)).max(-1)  # (B, T, na)
    ok = tgt_mask[:, :, None] & (ratio < 4.0)

    if angle_gate:
        d = jnp.abs(jnp.cos(theta[:, :, None] - anchors_lvl[None, None, :, 2]))
        ok = ok & (d > 0.866)  # lib/loss.py:457-459 (±30°)

    # Neighbor-cell gates (lib/loss.py:302-310)
    g = 0.5
    gxi = gain - gxy
    jx = (jnp.mod(gxy[..., 0], 1.0) < g) & (gxy[..., 0] > 1.0)
    ky = (jnp.mod(gxy[..., 1], 1.0) < g) & (gxy[..., 1] > 1.0)
    lx = (jnp.mod(gxi[..., 0], 1.0) < g) & (gxi[..., 0] > 1.0)
    my = (jnp.mod(gxi[..., 1], 1.0) < g) & (gxi[..., 1] > 1.0)
    off_ok = jnp.stack([jnp.ones_like(jx), jx, ky, lx, my], -1)  # (B, T, 5)

    valid = ok[:, :, :, None] & off_ok[:, :, None, :]  # (B, T, na, 5)

    # Cells: gij = floor(gxy - offset), clamped in place before tbox is taken
    # (clamp_ mutates the gij views at lib/loss.py:324, so tbox at :325 uses
    # the clamped indices — reproduced here).
    gij = jnp.floor(gxy[:, :, None, :] - OFFSETS[None, None, :, :])  # (B,T,5,2)
    gi = jnp.clip(gij[..., 0], 0, gw - 1).astype(jnp.int32)
    gj = jnp.clip(gij[..., 1], 0, gh - 1).astype(jnp.int32)

    txy = gxy[:, :, None, :] - jnp.stack([gi, gj], -1).astype(jnp.float32)
    # Broadcast to the candidate lattice (B, T, na, 5, ...)
    txy = jnp.broadcast_to(txy[:, :, None, :, :], (B, T, na, N_OFF, 2))
    twh = jnp.broadcast_to(gwh[:, :, None, None, :], (B, T, na, N_OFF, 2))
    tth = jnp.broadcast_to(theta[:, :, None, None], (B, T, na, N_OFF))
    cls = jnp.broadcast_to(
        tgt[..., 0].astype(jnp.int32)[:, :, None, None], (B, T, na, N_OFF)
    )
    a_idx = jnp.broadcast_to(
        jnp.arange(na, dtype=jnp.int32)[None, None, :, None], (B, T, na, N_OFF)
    )
    cell = (
        jnp.broadcast_to(gj[:, :, None, :], (B, T, na, N_OFF)) * gw
        + jnp.broadcast_to(gi[:, :, None, :], (B, T, na, N_OFF))
    ) * na + a_idx

    K = T * na * N_OFF
    out_csl = None
    if tgt_csl is not None:
        nb = tgt_csl.shape[-1]
        csl = jnp.broadcast_to(
            tgt_csl[:, :, None, None, :], (B, T, na, N_OFF, nb)
        )
        out_csl = csl.reshape(B, K, nb)

    return Candidates(
        valid=valid.reshape(B, K),
        cls=cls.reshape(B, K),
        anchor=a_idx.reshape(B, K),
        cell=cell.reshape(B, K),
        txy=txy.reshape(B, K, 2),
        twh=twh.reshape(B, K, 2),
        ttheta=tth.reshape(B, K),
        tcsl=out_csl,
    )


def gather_predictions(pred_lvl: jax.Array, cand: Candidates,
                       na: int) -> jax.Array:
    """Gather f32 ``(B, K, nf)`` prediction rows at the candidate cells.

    ``pred_lvl``: ``(B, gh, gw, na·nf)`` conv-native NHWC head map.  The
    anchor-major channel packing makes ``(B, gh·gw·na, nf)`` a FREE
    reshape, so the gather runs on the map as the conv produced it — no
    full-map transpose (the reference layout cost ~3.5 ms/step @800px B8
    including the backward).  Equivalent of the reference's fancy-indexed
    ``ps = pi[b, a, gj, gi]`` (``lib/loss.py:209``).
    """
    B, gh, gw, c = pred_lvl.shape
    flat = pred_lvl.reshape(B, gh * gw * na, c // na)
    rows = jnp.take_along_axis(flat, cand.cell[..., None], axis=1)
    return rows.astype(jnp.float32)


def scatter_conf(conf_target_shape, cand: Candidates, scores: jax.Array):
    """Scatter per-candidate objectness scores into the dense conf target.

    ``conf_target_shape``: ``(B, gh, gw, na)`` — the NHWC obj-plane layout
    (``pred.reshape(B, gh, gw, na, nf)[..., obj]``).  Equivalent of
    ``tconf[b, a, gj, gi] = score_iou`` (``lib/loss.py:221``).
    Duplicate cells resolve exactly like the reference's in-place advanced
    indexing: the *last* candidate in the reference's enumeration order
    (offset-major, then anchor, then target — ``t.repeat((5,1,1))[j]``,
    ``lib/loss.py:309``) wins.  Implemented as a two-pass deterministic
    scatter: max-priority per cell, then a unique-writer score scatter.
    """
    B, gh, gw, na = conf_target_shape
    n_cells = na * gh * gw
    K = cand.cell.shape[1]
    T = K // (na * N_OFF)

    # Reference enumeration priority: o * (na*T) + a * T + t; our K axis is
    # flattened as ((t*na)+a)*N_OFF + o.
    k = jnp.arange(K, dtype=jnp.int32)
    o = k % N_OFF
    a = (k // N_OFF) % na
    t = k // (N_OFF * na)
    prio = (o * (na * T) + a * T + t + 1)[None, :]  # 0 reserved for "empty"
    prio = jnp.where(cand.valid, prio, 0)

    idx = jnp.where(cand.valid, cand.cell, n_cells)  # OOB -> dropped

    def per_image(i, p, s):
        pmax = jnp.zeros((n_cells,), jnp.int32).at[i].max(p, mode="drop")
        win = (pmax[jnp.clip(i, 0, n_cells - 1)] == p) & (p > 0)
        i2 = jnp.where(win, i, n_cells)
        return jnp.zeros((n_cells,), s.dtype).at[i2].set(s, mode="drop")

    flat = jax.vmap(per_image)(idx, prio, scores)
    return flat.reshape(B, gh, gw, na)
