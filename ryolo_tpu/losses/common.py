"""Shared loss primitives: weighted/focal BCE, CIoU, Kalman-filter IoU loss.

Re-implements ``lib/loss.py``'s `FocalLoss` (``:10-33``), `bbox_ciou`
(``:36-78``) and `KFLoss` (``:81-150``) as pure masked functions.  All
reductions are *masked means* so the fixed-shape padded candidate sets of
the TPU target assignment reproduce the reference's dynamic-shape
``.mean()`` semantics exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits, targets, pos_weight=1.0):
    """Elementwise ``BCEWithLogitsLoss`` with pos_weight (no reduction).

    loss = -(pos_weight * z * log σ(x) + (1 - z) * log(1 - σ(x)))
    """
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def focal_modulation(logits, targets, gamma: float, alpha: float = 0.25):
    """Focal-loss scaling factor applied to an elementwise BCE loss.

    Mirrors ``lib/loss.py:19-26``: ``alpha_factor * (1 - p_t)^gamma``.
    """
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1.0 - targets) * (1.0 - p)
    alpha_factor = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    return alpha_factor * (1.0 - p_t) ** gamma


def bce_loss(logits, targets, pos_weight=1.0, fl_gamma: float = 0.0,
             mask=None):
    """Masked-mean BCE with optional focal modulation (gamma=0 disables).

    With ``mask`` of shape broadcastable to ``logits``: mean over the
    unmasked *elements* (matching torch's ``reduction='mean'`` over a
    dynamically-shaped tensor).
    """
    loss = bce_with_logits(logits, targets, pos_weight)
    if fl_gamma > 0:
        loss = loss * focal_modulation(logits, targets, fl_gamma)
    if mask is None:
        return jnp.mean(loss)
    mask = jnp.broadcast_to(mask, loss.shape).astype(loss.dtype)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(loss * mask) / denom


def bbox_ciou(pred_boxes, target_boxes):
    """Complete-IoU on axis-aligned ``(x, y, w, h)`` boxes, elementwise.

    Port of ``lib/loss.py:36-78`` (same epsilons, same detached alpha,
    same ``[-1, 1]`` clamp).  Shapes ``(..., 4)`` -> ``(...)``.
    """
    x1, y1, w1, h1 = [pred_boxes[..., i] for i in range(4)]
    x2, y2, w2, h2 = [target_boxes[..., i] for i in range(4)]

    pb_min = jnp.stack([x1 - w1 / 2, y1 - h1 / 2], -1)
    pb_max = jnp.stack([x1 + w1 / 2, y1 + h1 / 2], -1)
    tb_min = jnp.stack([x2 - w2 / 2, y2 - h2 / 2], -1)
    tb_max = jnp.stack([x2 + w2 / 2, y2 + h2 / 2], -1)

    inter = jnp.clip(jnp.minimum(pb_max, tb_max) - jnp.maximum(pb_min, tb_min),
                     0, None)
    inter_area = inter[..., 0] * inter[..., 1]
    inter_diag = (x2 - x1) ** 2 + (y2 - y1) ** 2
    outer = jnp.clip(jnp.maximum(pb_max, tb_max) - jnp.minimum(pb_min, tb_min),
                     0, None)
    outer_diag = outer[..., 0] ** 2 + outer[..., 1] ** 2
    union = w1 * h1 + w2 * h2 - inter_area
    u = inter_diag / (outer_diag + 1e-15)

    iou = inter_area / (union + 1e-15)
    v = (4.0 / jnp.pi ** 2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2

    S = jax.lax.stop_gradient(1.0 - iou)
    alpha = jax.lax.stop_gradient(v) / (S + jax.lax.stop_gradient(v) + 1e-15)

    ciou = iou - (u + alpha * v)
    return jnp.clip(ciou, -1.0, 1.0)


def _sigma_inverse_quadform(diff, wh, r):
    """``diffᵀ Σ⁻¹ diff`` for Σ = R diag(w/2, h/2)² Rᵀ, closed form."""
    cos_r, sin_r = jnp.cos(r), jnp.sin(r)
    # Rotate diff into the box frame; Σ⁻¹ is diagonal there.
    dx = diff[..., 0] * cos_r + diff[..., 1] * sin_r
    dy = -diff[..., 0] * sin_r + diff[..., 1] * cos_r
    a = (0.5 * wh[..., 0]) ** 2
    b = (0.5 * wh[..., 1]) ** 2
    return dx ** 2 / a + dy ** 2 / b


def kf_loss(pred, target, fun: str = "exp", alpha: float = 3.0, mask=None):
    """Kalman-filter IoU loss on ``(x, y, w, h, θ)`` rotated boxes.

    Port of ``lib/loss.py:100-150`` with the Gaussian conversion of
    ``lib/general.py:107-133`` inlined in closed form (the reference's
    explicit 2x2 ``Sigma_t.inverse()`` bmm becomes a rotation into the
    target frame — identical numerics, no batched matrix inverse).

    Returns ``(masked-mean loss, elementwise KFIoU)``.
    """
    wh_p = jnp.clip(pred[..., 2:4], 1e-4, 1e4)
    wh_t = jnp.clip(target[..., 2:4], 1e-4, 1e4)
    r_p, r_t = pred[..., 4], target[..., 4]

    diff = pred[..., 0:2] - target[..., 0:2]
    xy_loss = jnp.log(_sigma_inverse_quadform(diff, wh_t, r_t) + 1.0)

    wp2, hp2 = wh_p[..., 0] ** 2, wh_p[..., 1] ** 2
    wt2, ht2 = wh_t[..., 0] ** 2, wh_t[..., 1] ** 2
    cos2dr = jnp.cos(r_p - r_t) ** 2
    sin2dr = jnp.sin(r_p - r_t) ** 2

    A = jnp.sqrt(1 + (wp2 * hp2) / (wt2 * ht2)
                 + (wp2 / wt2 + hp2 / ht2) * cos2dr
                 + (wp2 / ht2 + hp2 / wt2) * sin2dr)
    B = jnp.sqrt(1 + (wt2 * ht2) / (wp2 * hp2)
                 + (wt2 / wp2 + ht2 / hp2) * cos2dr
                 + (wt2 / hp2 + ht2 / wp2) * sin2dr)
    kfiou = (4.0 - alpha) / (A + B - alpha)

    if fun == "ln":
        k = -jnp.log(kfiou + 1e-6)
    elif fun == "exp":
        k = jnp.exp(1.0 - kfiou) - 1.0
    else:
        k = 1.0 - kfiou

    loss = jnp.clip(xy_loss + k, 0, None)
    if mask is None:
        return jnp.mean(loss), kfiou
    m = mask.astype(loss.dtype)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(loss * m) / denom, kfiou


def masked_mean(x, mask):
    m = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)
