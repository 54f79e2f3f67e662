"""Vectorized rotated-box geometry in pure JAX.

Re-implements the box math of the reference's ``lib/general.py`` as batched,
jit-friendly functions (the reference loops per box in Python, e.g. the
``cv2.getRotationMatrix2D`` loop at ``lib/general.py:54-56`` and the w/h swap
loop at ``lib/general.py:93-99``; here everything is vectorized).

Conventions (identical to the reference):
  * An oriented box is ``(x, y, w, h, theta)`` with ``theta`` in **radians**,
    positive rotations **clockwise** in image coordinates (y down), and
    ``theta in [-pi/2, pi/2)`` determined by the long side ``h``
    (``lib/general.py:70-104``).
  * Corner order produced by :func:`xywha2xyxyxyxy` matches the reference:
    the *long* side ``h`` spans the local x-extent and the short side ``w``
    the local y-extent before rotation (``lib/general.py:58-61``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def norm_angle(theta: jax.Array) -> jax.Array:
    """Wrap angles into ``[-pi/2, pi/2)`` with a single-period correction.

    Mirrors ``lib/general.py:7-20`` (single ``where`` step each side; inputs
    are assumed to be within one period of the target range, which holds for
    every call site in the pipeline).
    """
    theta = jnp.where(theta >= jnp.pi / 2, theta - jnp.pi, theta)
    theta = jnp.where(theta < -jnp.pi / 2, theta + jnp.pi, theta)
    return theta


def wrap_angle(theta: jax.Array) -> jax.Array:
    """Full modular wrap of angles into ``[-pi/2, pi/2)`` (any input range)."""
    return jnp.mod(theta + jnp.pi / 2, jnp.pi) - jnp.pi / 2


def xywh2xyxy(box: jax.Array) -> jax.Array:
    """``(cx, cy, w, h) -> (x1, y1, x2, y2)``; see ``lib/general.py:23-38``."""
    cx, cy, w, h = jnp.split(box, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


def xywha2xyxyxyxy(boxes: jax.Array) -> jax.Array:
    """Convert ``(..., 5)`` rotated boxes to corner polygons ``(..., 4, 2)``.

    Equivalent to ``lib/general.py:41-67`` but with batched rotation matrices
    instead of a per-box ``cv2.getRotationMatrix2D`` Python loop.  The cv2
    matrix for angle ``a`` (degrees, applied about the box center) reduces to

        ``corner = center + [[cos a, sin a], [-sin a, cos a]] @ offset``

    with offsets ``(±h/2, ±w/2)`` — note the reference puts the long side
    ``h`` on the local x axis (``lib/general.py:58-61``).
    """
    x, y, w, h, theta = jnp.split(boxes, 5, axis=-1)  # each (..., 1)
    c, s = jnp.cos(theta), jnp.sin(theta)
    # Corner offsets in local frame, reference order (TL, TR, BR, BL in the
    # unrotated frame): (-h/2,-w/2), (+h/2,-w/2), (+h/2,+w/2), (-h/2,+w/2).
    dx = jnp.stack([-h, h, h, -h], axis=-2) / 2.0  # (..., 4, 1)
    dy = jnp.stack([-w, -w, w, w], axis=-2) / 2.0  # (..., 4, 1)
    cx = x[..., None, :] + c[..., None, :] * dx + s[..., None, :] * dy
    cy = y[..., None, :] - s[..., None, :] * dx + c[..., None, :] * dy
    return jnp.concatenate([cx, cy], axis=-1)  # (..., 4, 2)


def xyxyxyxy2xywha(polys: jax.Array) -> jax.Array:
    """Convert corner polygons ``(..., 8)`` to ``(x, y, w, h, theta)``.

    Vectorized port of ``lib/general.py:70-104``: corners assumed clockwise;
    the output uses the long-side-``h`` convention with
    ``theta in [-pi/2, pi/2)``.  The per-box Python w/h-swap loop
    (``lib/general.py:93-99``) becomes a ``where``.
    """
    x1, y1, x2, y2, x3, y3, x4, y4 = [polys[..., i] for i in range(8)]

    x = (x1 + x2 + x3 + x4) / 4
    y = (y1 + y2 + y3 + y4) / 4
    w = (
        jnp.hypot(x2 - x3, y2 - y3) + jnp.hypot(x1 - x4, y1 - y4)
    ) / 2
    h = (
        jnp.hypot(x1 - x2, y1 - y2) + jnp.hypot(x4 - x3, y4 - y3)
    ) / 2
    theta = -(jnp.arctan2(y1 - y2, x1 - x2) + jnp.arctan2(y4 - y3, x4 - x3)) / 2

    swap = w >= h
    w_, h_ = jnp.where(swap, h, w), jnp.where(swap, w, h)
    theta = jnp.where(
        swap,
        jnp.where(theta > 0, theta - jnp.pi / 2, theta + jnp.pi / 2),
        theta,
    )
    theta = norm_angle(theta)
    return jnp.stack([x, y, w_, h_, theta], axis=-1)


def xywhr2xywhrsigma(xywhr: jax.Array):
    """Rotated box -> 2-D Gaussian ``(xy, wh, r, sigma)``.

    Port of ``lib/general.py:107-133``: ``sigma = R diag(w/2, h/2)^2 R^T``
    with wh clamped to ``[1e-4, 1e4]``.  Accepts any leading batch shape.
    """
    xy = xywhr[..., :2]
    wh = jnp.clip(xywhr[..., 2:4], 1e-4, 1e4)
    r = xywhr[..., 4]

    cos_r, sin_r = jnp.cos(r), jnp.sin(r)
    # R = [[cos, -sin], [sin, cos]] (same matrix the reference builds).
    R = jnp.stack(
        [
            jnp.stack([cos_r, -sin_r], axis=-1),
            jnp.stack([sin_r, cos_r], axis=-1),
        ],
        axis=-2,
    )  # (..., 2, 2)
    S2 = jnp.zeros(R.shape, dtype=xywhr.dtype)
    S2 = S2.at[..., 0, 0].set((0.5 * wh[..., 0]) ** 2)
    S2 = S2.at[..., 1, 1].set((0.5 * wh[..., 1]) ** 2)
    sigma = R @ S2 @ jnp.swapaxes(R, -1, -2)
    return xy, wh, r, sigma


def csl_gaussian_labels(theta_deg_plus90: jax.Array, num_bins: int = 180,
                        sig: float = 6.0) -> jax.Array:
    """Circular Smooth Labels for angle classification.

    JAX twin of the reference's ``gaussian_label``
    (``datasets/base_dataset.py:13-31``): a Gaussian window of std ``sig``
    centered (via circular roll) on the truncated integer bin of the label.
    ``theta_deg_plus90`` is ``theta * 180/pi + 90`` in ``[0, 180)``
    (``datasets/base_dataset.py:145``); may be fractional — the reference
    truncates ``int(90 - label)`` toward zero, reproduced here.

    Returns ``(..., num_bins)`` float32.
    """
    x = jnp.arange(-num_bins / 2, num_bins / 2, dtype=jnp.float32)
    y_sig = jnp.exp(-(x ** 2) / (2 * sig ** 2))  # (num_bins,)
    index = jnp.trunc(num_bins / 2 - theta_deg_plus90).astype(jnp.int32)
    # concatenate([y[index:], y[:index]]) == roll(y, -index); gather form:
    j = jnp.arange(num_bins, dtype=jnp.int32)
    src = jnp.mod(j + index[..., None], num_bins)
    return y_sig[src]


def csl_gaussian_labels_np(theta_deg_plus90: np.ndarray, num_bins: int = 180,
                           sig: float = 6.0) -> np.ndarray:
    """Pure-numpy twin of :func:`csl_gaussian_labels` for the host data path."""
    theta_deg_plus90 = np.asarray(theta_deg_plus90, dtype=np.float64)
    x = np.arange(-num_bins / 2, num_bins / 2, dtype=np.float64)
    y_sig = np.exp(-(x ** 2) / (2 * sig ** 2))
    index = np.trunc(num_bins / 2 - theta_deg_plus90).astype(np.int64)
    j = np.arange(num_bins)
    src = np.mod(j + index[..., None], num_bins)
    return y_sig[src].astype(np.float32)
