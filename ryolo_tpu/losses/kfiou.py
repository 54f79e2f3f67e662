"""KFIoU training loss, fixed-shape masked version.

Functional equivalent of ``ComputeKFIoULoss`` (``lib/loss.py:334-492``):
Kalman-filter-IoU regression over (x, y, w, h, θ), KFIoU-scored objectness
BCE (obj logit is channel 5 — ``lib/loss.py:407``), one-hot class BCE.
The loss-side angle decode uses ``(σ(tθ) - 0.5)·1.1 + θ_anchor`` with
``norm_angle`` — intentionally *different* from the inference decode's
0.5236 width (``model/yololayer.py:96`` vs ``lib/loss.py:390``), preserved
for behavior parity (SURVEY.md §7 hard part 6).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ryolo_tpu.geometry import norm_angle
from ryolo_tpu.losses.assign import (
    build_candidates,
    gather_predictions,
    scatter_conf,
)
from ryolo_tpu.losses.common import bce_loss, kf_loss

GR = 1.0  # lib/loss.py:353


def kfiou_loss(
    outputs: Sequence[jax.Array],   # 3 × (B, gh, gw, na·(nc+6)) NHWC heads
    tgt: jax.Array,                 # (B, T, 6) [cls, x, y, w, h, θ] normalized
    tgt_mask: jax.Array,            # (B, T) bool
    anchors: Sequence[jax.Array],   # per-level (na, 3) [w, h, θ] grid anchors
    nc: int,
    hyp: dict,
):
    """Returns ``(total_loss, loss_items)`` matching ``lib/loss.py:368-425``."""
    lam_box = hyp["box"]
    lam_obj = hyp["obj"]
    lam_cls = hyp["cls"]
    obj_pw = hyp.get("obj_pw", 1.0)
    cls_pw = hyp.get("cls_pw", 1.0)
    fl_gamma = hyp.get("fl_gamma", 0.0)

    reg_loss = 0.0
    conf_loss = 0.0
    cls_loss = 0.0

    for pi, anc in zip(outputs, anchors):
        anc = jnp.asarray(anc)
        na = anc.shape[0]
        B, gh, gw, c = pi.shape
        nf = c // na
        cand = build_candidates(tgt, tgt_mask, anc, gh, gw, angle_gate=True)
        ps = gather_predictions(pi, cand, na)  # f32 (B, K, nf)
        m = cand.valid

        anc_rows = anc[cand.anchor]  # (B, K, 3)
        pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(ps[..., 2:4]) * 2.0) ** 2 * anc_rows[..., :2]
        pa = norm_angle(
            (jax.nn.sigmoid(ps[..., 4:5]) - 0.5) * 1.1 + anc_rows[..., 2:3]
        )
        pbox = jnp.concatenate([pxy, pwh, pa], -1)
        tbox = jnp.concatenate(
            [cand.txy, cand.twh, cand.ttheta[..., None]], -1
        )
        safe = jnp.array([0.5, 0.5, 1.0, 1.0, 0.0], jnp.float32)
        pbox = jnp.where(m[..., None], pbox, safe)
        tbox = jnp.where(m[..., None], tbox, safe)

        kf, kfiou = kf_loss(pbox, tbox, fun="exp", mask=m)
        reg_loss += kf

        score = jax.lax.stop_gradient(jnp.clip(kfiou, 0.0, None))
        tconf = scatter_conf((B, gh, gw, na), cand, (1.0 - GR) + GR * score)
        # obj logit is channel 5 (lib/loss.py:407), NHWC view
        pobj = pi.reshape(B, gh, gw, na, nf)[..., 5].astype(jnp.float32)
        conf_loss += bce_loss(pobj, tconf, pos_weight=obj_pw,
                              fl_gamma=fl_gamma)

        if nc > 1:
            onehot = jax.nn.one_hot(cand.cls, nc, dtype=jnp.float32)
            cls_loss += bce_loss(ps[..., 6:], onehot, pos_weight=cls_pw,
                                 fl_gamma=fl_gamma, mask=m[..., None])

    reg_loss = lam_box * reg_loss
    conf_loss = lam_obj * conf_loss
    cls_loss = lam_cls * cls_loss
    total = reg_loss + conf_loss + cls_loss

    items = {
        "reg_loss": reg_loss,
        "conf_loss": conf_loss,
        "cls_loss": cls_loss,
        "total_loss": total,
    }
    return total, items
