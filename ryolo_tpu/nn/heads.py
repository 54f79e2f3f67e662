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
    """Decode CSL heads from the RAW neck tensors -> ``(B, Σ, nc+6)``.

    ``outs`` are the untransposed neck outputs ``(B, gs, gs, na*nf)``: all
    decode math (sigmoids, the 180-bin argmax) runs in the conv-native
    channel-minor layout — the minor-axis reduce fuses into the conv
    epilogue instead of forcing layout copies of the transposed head maps
    (profiled at ~1.5 ms/step @800px) — and only the small decoded
    ``(…, nc+6)`` tensor is transposed to the reference's anchor-major
    candidate order (``model/yololayer.py:51``; ordering must match for
    NMS tie behavior).  Output rows ``[x, y, w, h, θ(rad), conf, cls...]``.
    """
    decoded = []
    for x, anc, stride in zip(outs, anchors, strides):
        b, gh, gw, _ = x.shape
        anc = jnp.asarray(anc, jnp.float32)  # (na, 2)
        na = anc.shape[0]
        nf = x.shape[-1] // na
        grid = _grid_xy(gh, gw, jnp.float32)  # (gh, gw, 2)

        # Per-anchor channel SLICES keep every tensor 4-D in the conv's
        # native tiled layout — the (…, na, nf) reshape has a 128-unaligned
        # minor dim that forced slow re-tiled argmax reduces (profiled at
        # ~1 ms/step on the 50² level alone).
        per_anchor = []
        for a in range(na):
            xa = jax.lax.slice_in_dim(x, a * nf, a * nf + 5 + nc, axis=3)
            # upcast only the 5+nc box/obj/cls channels (f32 sigmoid); a
            # full-tensor f32 cast would materialize ~0.5 GB of head maps
            y = jax.nn.sigmoid(xa.astype(jnp.float32))
            pxy = (y[..., 0:2] * 2 - 0.5 + grid[None]) * stride
            pwh = (y[..., 2:4] * 2) ** 2 * anc[a] * stride
            pconf = y[..., 4:5]
            pcls = y[..., 5:5 + nc]
            # sigmoid is monotonic: argmax over the raw bin logits equals
            # argmax over their sigmoids — skips 180/(nc+185) of the
            # decode's transcendental work (the reference sigmoids
            # everything, model/yololayer.py:40,48); bf16->f32 is exact so
            # the argmax index is identical
            pa = jax.lax.slice_in_dim(x, a * nf + 5 + nc, (a + 1) * nf,
                                      axis=3)
            ptheta = jnp.argmax(pa, axis=-1, keepdims=True).astype(
                jnp.float32)
            ptheta = (ptheta - 90.0) / 180.0 * jnp.pi
            per_anchor.append(
                jnp.concatenate([pxy, pwh, ptheta, pconf, pcls], axis=-1)
            )
        # (B, na, gh, gw, F) -> reference candidate order (B, na·gh·gw, F)
        dec = jnp.stack(per_anchor, axis=1)
        decoded.append(dec.reshape(b, -1, nc + 6))
    return jnp.concatenate(decoded, axis=1)


def decode_csl_defer(outs: Sequence[jax.Array],
                     anchors: Sequence[jax.Array],
                     strides: Sequence[int],
                     nc: int) -> jax.Array:
    """CSL decode WITHOUT the 180-bin theta argmax (theta column = 0).

    The full-width theta argmax reads every head map's 180-bin block and
    was profiled at 4.5 ms/step @800px (the channel-slice variadic reduce
    lowers poorly in the head cluster's layout).  A trained detector keeps
    tens of candidates above the detect confidence, so theta is instead
    resolved AFTER top-k selection by
    :func:`ryolo_tpu.eval.postprocess.deferred_theta` — a (B, k) row
    gather + narrow argmax over the same logits, bit-identical bins.
    Candidate order and all other columns match :func:`decode_csl`.
    """
    decoded = []
    for x, anc, stride in zip(outs, anchors, strides):
        b, gh, gw, _ = x.shape
        anc = jnp.asarray(anc, jnp.float32)
        na = anc.shape[0]
        nf = x.shape[-1] // na
        grid = _grid_xy(gh, gw, jnp.float32)
        per_anchor = []
        for a in range(na):  # never touches the theta channels
            xa = jax.lax.slice_in_dim(x, a * nf, a * nf + 5 + nc, axis=3)
            y = jax.nn.sigmoid(xa.astype(jnp.float32))
            pxy = (y[..., 0:2] * 2 - 0.5 + grid[None]) * stride
            pwh = (y[..., 2:4] * 2) ** 2 * anc[a] * stride
            ptheta = jnp.zeros_like(y[..., 4:5])
            per_anchor.append(
                jnp.concatenate([pxy, pwh, ptheta, y[..., 4:5],
                                 y[..., 5:5 + nc]], axis=-1)
            )
        dec = jnp.stack(per_anchor, axis=1)
        decoded.append(dec.reshape(b, -1, nc + 6))
    return jnp.concatenate(decoded, axis=1)


def decode_kfiou(outs: Sequence[jax.Array], anchors: Sequence[jax.Array],
                 strides: Sequence[int], nc: int) -> jax.Array:
    """Decode KFIoU heads from the RAW neck tensors -> ``(B, Σ, nc+6)``.

    Same conv-native-layout strategy as :func:`decode_csl`.  θ regressed
    ±0.2618 rad (±15°) around the 6 rotated-anchor angles
    (``model/yololayer.py:96``; NOTE the intentional train/infer asymmetry —
    the loss decode uses ±0.55 + norm_angle, ``lib/loss.py:390``).
    """
    decoded = []
    for x, anc, stride in zip(outs, anchors, strides):
        b, gh, gw, _ = x.shape
        anc = jnp.asarray(anc, jnp.float32)  # (na, 3): w, h, angle(rad)
        na = anc.shape[0]
        nf = x.shape[-1] // na
        grid = _grid_xy(gh, gw, jnp.float32)

        per_anchor = []
        for a in range(na):  # 4-D slices: see decode_csl
            xa = jax.lax.slice_in_dim(x, a * nf, (a + 1) * nf, axis=3)
            y = jax.nn.sigmoid(xa.astype(jnp.float32))
            pxy = (y[..., 0:2] * 2 - 0.5 + grid[None]) * stride
            pwh = (y[..., 2:4] * 2) ** 2 * anc[a, :2] * stride
            pa = (y[..., 4:5] - 0.5) * 0.5236 + anc[a, 2]
            pconf = y[..., 5:6]
            pcls = y[..., 6:]
            per_anchor.append(
                jnp.concatenate([pxy, pwh, pa, pconf, pcls], axis=-1)
            )
        dec = jnp.stack(per_anchor, axis=1)
        decoded.append(dec.reshape(b, -1, nc + 6))
    return jnp.concatenate(decoded, axis=1)
