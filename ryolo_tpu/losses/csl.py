"""CSL (Circular Smooth Label) training loss, fixed-shape masked version.

Functional equivalent of ``ComputeCSLLoss`` (``lib/loss.py:153-331``):
4 terms — CIoU box regression, 180-bin BCE angle classification,
CIoU-scored objectness BCE, one-hot class BCE — with identical weights and
reduction semantics, expressed over the static candidate lattice of
:mod:`ryolo_tpu.losses.assign`.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ryolo_tpu.losses.assign import (
    build_candidates,
    gather_predictions,
    scatter_conf,
)
from ryolo_tpu.losses.common import bbox_ciou, bce_loss, masked_mean

LAMBDA_THETA = 0.5  # lib/loss.py:160
GR = 1.0            # iou-ratio blending, lib/loss.py:161


def csl_loss(
    outputs: Sequence[jax.Array],   # 3 × (B, gh, gw, na·(nc+185)) NHWC heads
    tgt: jax.Array,                 # (B, T, 6) [cls, x, y, w, h, θ] normalized
    tgt_csl: jax.Array,             # (B, T, 180) smooth angle labels
    tgt_mask: jax.Array,            # (B, T) bool
    anchors: Sequence[jax.Array],   # per-level (na, 2) grid-unit anchors
    nc: int,
    hyp: dict,
):
    """Returns ``(total_loss, loss_items)`` matching ``lib/loss.py:191-268``."""
    lam_box = hyp["box"]
    lam_obj = hyp["obj"]
    lam_cls = hyp["cls"]
    obj_pw = hyp.get("obj_pw", 1.0)
    cls_pw = hyp.get("cls_pw", 1.0)
    fl_gamma = hyp.get("fl_gamma", 0.0)

    reg_loss = 0.0
    theta_loss = 0.0
    conf_loss = 0.0
    cls_loss = 0.0

    for pi, anc in zip(outputs, anchors):
        anc = jnp.asarray(anc)
        na = anc.shape[0]
        B, gh, gw, c = pi.shape
        nf = c // na
        cand = build_candidates(tgt, tgt_mask, anc, gh, gw,
                                tgt_csl=tgt_csl)
        ps = gather_predictions(pi, cand, na)  # f32 (B, K, nf)
        m = cand.valid
        mf = m.astype(jnp.float32)

        # Decoded box in grid units (loss-side decode, lib/loss.py:212-214)
        pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(ps[..., 2:4]) * 2.0) ** 2 \
            * anc[cand.anchor]
        pbox = jnp.concatenate([pxy, pwh], -1)
        tbox = jnp.concatenate([cand.txy, cand.twh], -1)
        # Sanitize padded rows so CIoU never sees 0-sized boxes (NaN guard).
        safe = jnp.array([0.5, 0.5, 1.0, 1.0], jnp.float32)
        tbox = jnp.where(m[..., None], tbox, safe)
        pbox = jnp.where(m[..., None], pbox, safe)

        ciou = bbox_ciou(pbox, tbox)  # (B, K)
        reg_loss += masked_mean(1.0 - ciou, m)

        score_iou = jax.lax.stop_gradient(jnp.clip(ciou, 0.0, None))
        tconf = scatter_conf((B, gh, gw, na), cand,
                             (1.0 - GR) + GR * score_iou)
        # obj plane as an NHWC view (free reshape, strided channel read)
        pobj = pi.reshape(B, gh, gw, na, nf)[..., 4].astype(jnp.float32)
        conf_loss += bce_loss(pobj, tconf, pos_weight=obj_pw,
                              fl_gamma=fl_gamma)

        if nc > 1:
            onehot = jax.nn.one_hot(cand.cls, nc, dtype=jnp.float32)
            cls_loss += bce_loss(ps[..., 5:5 + nc], onehot, pos_weight=cls_pw,
                                 fl_gamma=fl_gamma, mask=m[..., None])

        theta_loss += bce_loss(ps[..., 5 + nc:], cand.tcsl, pos_weight=1.0,
                               fl_gamma=fl_gamma, mask=m[..., None])

    reg_loss = lam_box * reg_loss
    theta_loss = LAMBDA_THETA * theta_loss
    conf_loss = lam_obj * conf_loss
    cls_loss = lam_cls * cls_loss
    total = reg_loss + conf_loss + cls_loss + theta_loss

    items = {
        "reg_loss": reg_loss,
        "theta_loss": theta_loss,
        "conf_loss": conf_loss,
        "cls_loss": cls_loss,
        "total_loss": total,
    }
    return total, items
