"""Rotated YOLO heads: reshape + jit-fused anchor decode.

Pure-function re-design of ``model/yololayer.py`` (YoloCSLLayer ``:8-56``,
YoloKFIoULayer ``:59-105``).  Unlike the reference (which decodes with
per-level Python tensor building every call), the decode here is a pure
static-shape function that XLA fuses straight into the forward graph — the
"single kernel" decode of the BASELINE north star.

Channel-layout parity with the reference (for checkpoint interop): a neck
output channel ``c = a * nf + f`` (anchor-major), where per-anchor features
are
  * CSL   (``nf = nc + 185``): ``[x, y, w, h, obj, cls..., 180 θ-bins]``
    (``model/yololayer.py:25,44-47``)
  * KFIoU (``nf = nc + 6``):   ``[x, y, w, h, θ, obj, cls...]``
    (``model/yololayer.py:76,94-98``)

Decode (inference only), the grid-sensitivity-eliminated YOLOv5 form
(``model/yololayer.py:42-43,94-96``):
  ``pxy = (2σ(txy) − 0.5 + grid) · stride``;
  ``pwh = (2σ(twh))² · anchor · stride``;
  CSL   θ: ``argmax`` over 180 bins → ``(bin − 90)/180·π`` radians;
  KFIoU θ: ``(σ(tθ) − 0.5)·0.5236 + anchor_angle``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def reshape_head(x: jax.Array, na: int, nf: int) -> jax.Array:
    """NHWC neck output ``(B, gs, gs, na*nf)`` -> ``(B, na, gs, gs, nf)``.

    Matches the reference's ``view(bs, na, nf, gs, gs).permute(0,1,3,4,2)``
    channel semantics (anchor-major channel packing).
    """
    b, gh, gw, _ = x.shape
    x = x.reshape(b, gh, gw, na, nf)
    return jnp.transpose(x, (0, 3, 1, 2, 4))


def _grid_xy(gh: int, gw: int, dtype) -> jax.Array:
    gx = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    gy = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
    return jnp.stack([gx, gy], axis=-1).astype(dtype)  # (gh, gw, 2)


def decode_csl(outs: Sequence[jax.Array], anchors: Sequence[jax.Array],
               strides: Sequence[int], nc: int) -> jax.Array:
    """Decode CSL raw heads ``(B, na, gs, gs, nc+185)`` -> ``(B, Σ, nc+6)``.

    Output feature order ``[x, y, w, h, θ, conf, cls...]``
    (``model/yololayer.py:51``); θ in radians ``[-π/2, π/2)``.
    """
    decoded = []
    for out, anc, stride in zip(outs, anchors, strides):
        b, na, gh, gw, nf = out.shape
        # upcast only the 5+nc box/obj/cls channels (f32 sigmoid); the
        # full-tensor f32 cast would materialize ~0.5 GB of head maps that
        # the decode never reads at full precision
        y = jax.nn.sigmoid(out[..., :5 + nc].astype(jnp.float32))
        grid = _grid_xy(gh, gw, jnp.float32)  # (gh, gw, 2)
        anc = jnp.asarray(anc, jnp.float32)  # (na, 2)

        pxy = (y[..., 0:2] * 2 - 0.5 + grid[None, None]) * stride
        pwh = (y[..., 2:4] * 2) ** 2 * anc[None, :, None, None, :] * stride
        pconf = y[..., 4:5]
        pcls = y[..., 5:5 + nc]
        # sigmoid is monotonic: argmax over the raw bin logits equals
        # argmax over their sigmoids — skips 180/(nc+185) of the decode's
        # transcendental work (the reference applies sigmoid to everything,
        # model/yololayer.py:40,48); computed in the native dtype (the
        # bf16->f32 cast is exact, so the argmax index is identical)
        pa = out[..., 5 + nc:]
        ptheta = jnp.argmax(pa, axis=-1, keepdims=True).astype(jnp.float32)
        ptheta = (ptheta - 90.0) / 180.0 * jnp.pi

        dec = jnp.concatenate([pxy, pwh, ptheta, pconf, pcls], axis=-1)
        decoded.append(dec.reshape(b, -1, nc + 6))
    return jnp.concatenate(decoded, axis=1)


def decode_kfiou(outs: Sequence[jax.Array], anchors: Sequence[jax.Array],
                 strides: Sequence[int], nc: int) -> jax.Array:
    """Decode KFIoU raw heads ``(B, na, gs, gs, nc+6)`` -> ``(B, Σ, nc+6)``.

    θ regressed ±0.2618 rad (±15°) around the 6 rotated-anchor angles
    (``model/yololayer.py:96``; NOTE the intentional train/infer asymmetry —
    the loss decode uses ±0.55 + norm_angle, ``lib/loss.py:390``).
    """
    decoded = []
    for out, anc, stride in zip(outs, anchors, strides):
        b, na, gh, gw, nf = out.shape
        y = jax.nn.sigmoid(out.astype(jnp.float32))
        grid = _grid_xy(gh, gw, jnp.float32)
        anc = jnp.asarray(anc, jnp.float32)  # (na, 3): w, h, angle(rad)

        pxy = (y[..., 0:2] * 2 - 0.5 + grid[None, None]) * stride
        pwh = (y[..., 2:4] * 2) ** 2 * anc[None, :, None, None, :2] * stride
        pa = (y[..., 4:5] - 0.5) * 0.5236 + anc[None, :, None, None, 2:3]
        pconf = y[..., 5:6]
        pcls = y[..., 6:]

        dec = jnp.concatenate([pxy, pwh, pa, pconf, pcls], axis=-1)
        decoded.append(dec.reshape(b, -1, nc + 6))
    return jnp.concatenate(decoded, axis=1)
