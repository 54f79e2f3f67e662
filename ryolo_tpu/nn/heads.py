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


def decode_kfiou_scores(outs: Sequence[jax.Array], na: int,
                        nc: int) -> Tuple[jax.Array, jax.Array]:
    """KFIoU candidate scores WITHOUT the box decode -> ``(conf, cls_id)``.

    The 18-anchor KFIoU head decodes ~6× more rows than CSL; materializing
    the full ``(B, N, nc+6)`` decoded tensor (~166 MB @800px B=8) is the
    dominant HBM cost of its post-process.  Selection only needs the
    per-candidate confidence, so this computes ``conf = max_c σ(cls_c) ·
    σ(obj)`` and ``cls_id = argmax_c`` full-width with EXACTLY the
    arithmetic :func:`ryolo_tpu.eval.postprocess.post_process_fixed`
    applies to the full :func:`decode_kfiou` output (σ in f32, then the
    product, then max/argmax) — elementwise, so it fuses into the head
    read; bit-identical conf AND tie-identical argmax (a raw-logit argmax
    disagrees on ~0.1% of rows where f32 σ rounding collapses nearby
    logits into ties).  Box fields resolve after top-k selection via
    :func:`deferred_kfiou_box`.  Candidate order matches
    :func:`decode_kfiou` exactly (anchor-major, row-major, levels
    concatenated).  Score semantics: ``lib/general.py:155-157``.
    """
    confs, ids = [], []
    for x in outs:
        b, gh, gw, C = x.shape
        nf = C // na
        nc_lvl = nf - 6

        # max/argmax over the class channels as ONE dependent elementwise
        # select chain, on a feature-PLANAR relayout of the head map.
        # Alternatives, all profiled @800px B8: ``jnp.max/argmax`` = one
        # narrow iota-reduce per anchor (0.59 ms × 18 = 10.6 ms/step);
        # per-ANCHOR select chains = 18 independent fusions each
        # re-reading every lane tile of the interleaved map (12.4 ms);
        # per-CLASS strided slices = 17 standalone slice ops, each again
        # reading all lane tiles (0.29 × 17 = 4.8 ms).  One transpose to
        # (B, nf, na, gh, gw) makes every feature plane a leading-dim
        # view: the chain fuses into a single pass over well-tiled
        # (gh, gw) minors, and (conf, cls_id) come out directly in the
        # anchor-major candidate order (no output transpose).  Tie-exact
        # with argmax: identical f32 σ·σ products, ascending class order
        # + strict ``>`` keeps first-max-wins.
        xt = jnp.transpose(x.reshape(b, gh, gw, na, nf), (0, 4, 3, 1, 2))

        sobj = jax.nn.sigmoid(xt[:, 5].astype(jnp.float32))
        conf = jax.nn.sigmoid(xt[:, 6].astype(jnp.float32)) * sobj
        cls_id = jnp.zeros_like(conf, jnp.int32)
        for c in range(1, nc_lvl):
            s = jax.nn.sigmoid(xt[:, 6 + c].astype(jnp.float32)) * sobj
            hit = s > conf
            conf = jnp.where(hit, s, conf)
            cls_id = jnp.where(hit, c, cls_id)

        # (B, na, gh, gw) -> anchor-major rows (matches decode_kfiou)
        confs.append(conf.reshape(b, -1))
        ids.append(cls_id.reshape(b, -1))
    return jnp.concatenate(confs, 1), jnp.concatenate(ids, 1)


def deferred_kfiou_box(neck_outs: Sequence[jax.Array], idx: jax.Array,
                       na: int, anchors: Sequence[jax.Array],
                       strides: Sequence[int]) -> jax.Array:
    """Resolve KFIoU boxes for the selected candidates only -> ``(B, k, 5)``.

    ``idx``: ``(B, k)`` global candidate indices in the
    :func:`decode_kfiou` order.  Gathers each candidate's head-map row and
    applies the anchor decode (``model/yololayer.py:94-96``) to those k
    rows alone — bit-identical fields to the full-width decode at ~k/N of
    the work.  Anchor parameters resolve through a static select chain
    over the na anchors (a table gather lowers pathologically on TPU for
    large index shapes — the r3 phantom-gather find).
    """
    b, k = idx.shape
    out = jnp.zeros((b, k, 5), jnp.float32)
    off = 0
    for x, anc, stride in zip(neck_outs, anchors, strides):
        _, gh, gw, C = x.shape
        nf = C // na
        hw = gh * gw
        anc = jnp.asarray(anc, jnp.float32)  # (na, 3): w, h, angle(rad)
        local = idx - off
        in_lvl = (local >= 0) & (local < na * hw)
        anchor = jnp.clip(local // hw, 0, na - 1)
        pos = jnp.clip(local - anchor * hw, 0, hw - 1)
        r, c = pos // gw, pos % gw
        rows = jax.vmap(lambda xb, rb, cb: xb[rb, cb, :])(x, r, c)  # (B,k,C)
        raw = jnp.zeros((b, k, 5), rows.dtype)
        anc_wh = jnp.zeros((b, k, 2), jnp.float32)
        anc_th = jnp.zeros((b, k), jnp.float32)
        for a in range(na):
            ch = jax.lax.slice_in_dim(rows, a * nf, a * nf + 5, axis=2)
            hit = anchor == a
            raw = jnp.where(hit[..., None], ch, raw)
            anc_wh = jnp.where(hit[..., None], anc[a, :2], anc_wh)
            anc_th = jnp.where(hit, anc[a, 2], anc_th)
        y = jax.nn.sigmoid(raw.astype(jnp.float32))
        grid = jnp.stack([c, r], -1).astype(jnp.float32)  # (B, k, 2)
        pxy = (y[..., 0:2] * 2 - 0.5 + grid) * stride
        pwh = (y[..., 2:4] * 2) ** 2 * anc_wh * stride
        pth = (y[..., 4] - 0.5) * 0.5236 + anc_th
        lvl = jnp.concatenate([pxy, pwh, pth[..., None]], -1)
        out = jnp.where(in_lvl[..., None], lvl, out)
        off += na * hw
    return out


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
