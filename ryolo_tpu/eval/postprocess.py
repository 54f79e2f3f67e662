"""Confidence filtering + rotated NMS over decoded predictions.

TPU re-design of ``lib/general.py:136-183`` (``post_process``): the
reference loops per image in Python with dynamic shapes and calls the
detectron2 CUDA NMS; here the whole batch runs as one fixed-shape jitted
program — top-K selection, class-offset trick, rad→deg conversion, masked
greedy NMS — and only the final (already tiny) results are pulled to host.

Semantics preserved exactly:
  * score = obj_conf × max class conf (``lib/general.py:155-157``)
  * keep score > conf_thres (``:161``), sort desc (``:166``), cap
    ``max_nms=5000`` (``:167``)
  * NMS on boxes offset by ``class_id * 4096`` so classes never suppress
    each other (``:171-173``), angles in degrees (``:174``)
  * cap ``max_det=1500`` (``:178``)
  * output rows ``[x, y, w, h, θ(rad), conf, cls]`` per image.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ryolo_tpu.ops.rotated_nms import nms_rotated_masked

MAX_WH = 4096.0   # class-offset separation, lib/general.py:147
MAX_NMS = 5000    # lib/general.py:148
MAX_DET = 1500    # lib/general.py:149


# Static candidate cap of the count-conditioned fast path: when every image
# has at most this many above-threshold rows (always true at detect-CLI
# confidences), selection/NMS/compaction run at this width instead of
# max_nms — exactly the same result, ~10x less sort/buffer work.
SMALL_K = 512


def _select_nms_compact(payload, sel, k: int, iou_thres, max_det: int,
                        use_topk: bool, theta_fn=None, box_fn=None):
    """Top-k select + rotated NMS + compaction at static width ``k``.

    Candidate selection: near N ≈ k a single variadic stable sort carrying
    the box columns as payload is ~free (and dynamic row gathers of (N, 7)
    rows were measured pathologically slow on TPU, ~60 ms/batch).  When
    N ≫ k (the 18-anchor KFIoU head decodes ~6× more rows, or the SMALL_K
    fast path), top_k + per-COLUMN gathers of only k entries is cheaper
    than sorting the full width with 7 payloads.  Both orderings are
    identical: descending score, ties by candidate index.

    ``box_fn`` (fully deferred decode, KFIoU): payload carries only
    ``[cls_id]`` and every box field resolves post-selection via
    ``box_fn(idx) -> (B, k, 5)``.
    """
    if box_fn is not None:
        top_scores, idx = jax.lax.top_k(sel, k)  # (B, k) desc, ties by idx
        tcls = jnp.take_along_axis(payload[0], idx, axis=1)
        box = box_fn(idx)
        bx, by, bw, bh, bt = (box[..., i] for i in range(5))
    elif use_topk or theta_fn is not None:
        top_scores, idx = jax.lax.top_k(sel, k)  # (B, k) desc, ties by idx
        bx, by, bw, bh, bt, tcls = (
            jnp.take_along_axis(o, idx, axis=1) for o in payload
        )
        if theta_fn is not None:  # deferred theta: resolve for top-k only
            bt = theta_fn(idx)
    else:
        sorted_all = jax.lax.sort([-sel] + payload, dimension=-1, num_keys=1,
                                  is_stable=True)
        top_scores = -sorted_all[0][:, :k]
        bx, by, bw, bh, bt, tcls = (o[:, :k] for o in sorted_all[1:])
    tvalid = top_scores > 0.0  # only above-threshold rows

    # class offset + degrees for suppression geometry (lib/general.py:171-174)
    nms_boxes = jnp.stack(
        [bx + tcls * MAX_WH, by + tcls * MAX_WH, bw, bh,
         bt * (180.0 / jnp.pi)],
        axis=-1,
    )

    def per_image(boxes_i, scores_i, valid_i):
        _, keep = nms_rotated_masked(boxes_i, scores_i, valid_i,
                                     jnp.float32(iou_thres),
                                     max_keep=max_det, presorted=True)
        return keep

    keep = jax.vmap(per_image)(nms_boxes, top_scores, tvalid)  # (B, k)

    # Compact kept rows into the first max_det slots with a second small
    # sort (kept rows keep their score order; dropped rows sink).
    comp_key = jnp.where(
        keep, jax.lax.broadcasted_iota(jnp.int32, keep.shape, 1), k
    )
    rows = [bx, by, bw, bh, bt, top_scores, tcls]
    comp = jax.lax.sort([comp_key] + rows, dimension=-1, num_keys=1,
                        is_stable=True)
    md = min(max_det, k)
    dets = jnp.stack([o[:, :md] for o in comp[1:]], axis=-1)
    n_keep = jnp.minimum(jnp.sum(keep, axis=1), md)
    out_valid = jnp.arange(md)[None, :] < n_keep[:, None]
    dets = jnp.where(out_valid[..., None], dets, 0.0)
    if md < max_det:  # keep the advertised (B, max_det) output shape
        dets = jnp.pad(dets, ((0, 0), (0, max_det - md), (0, 0)))
        out_valid = jnp.pad(out_valid, ((0, 0), (0, max_det - md)))
    return dets, out_valid


@functools.partial(jax.jit,
                   static_argnames=("max_nms", "max_det", "use_topk"))
def post_process_fixed(predictions: jax.Array, conf_thres: float,
                       iou_thres: float, max_nms: int = MAX_NMS,
                       max_det: int = MAX_DET, use_topk: bool | None = None):
    """Batched fixed-shape post-process.

    Args:
      predictions: ``(B, N, nc+6)`` decoded rows ``[x, y, w, h, θ(rad),
        obj, cls...]`` (the jit-fused decode output).
      use_topk: candidate-selection strategy (None = by shape, see
        ``_select_nms_compact``).
    Returns:
      dets:  ``(B, max_det, 7)`` rows ``[x, y, w, h, θ(rad), conf, cls]``
      valid: ``(B, max_det)`` bool.
    """
    B, N, _ = predictions.shape

    conf, cls_id = _class_max(predictions)
    sel = jnp.where(conf > conf_thres, conf, -1.0)

    payload = [predictions[..., i] for i in range(5)] + [cls_id]
    return _pp_tail(payload, sel, N, iou_thres, max_nms, max_det, use_topk)


def _class_max(predictions):
    """``max/argmax`` of ``cls·obj`` over the class axis, fused.

    ``jnp.max/argmax`` over the (minor, < lane-width) class dim of the
    ``(B, N, nc+6)`` decoded tensor lowers to a narrow iota-reduce
    (profiled ~0.6 ms per reduce @800px); an elementwise select chain
    over per-class slices fuses into one pass.  Identical results: same
    f32 products (``lib/general.py:155-157``), ascending class order +
    strict ``>`` reproduces argmax's first-max-wins tie rule.
    """
    nc = predictions.shape[-1] - 6
    obj = predictions[..., 5]
    conf = predictions[..., 6] * obj
    cls_id = jnp.zeros_like(conf, jnp.int32)
    for c in range(1, nc):
        s = predictions[..., 6 + c] * obj
        hit = s > conf
        conf = jnp.where(hit, s, conf)
        cls_id = jnp.where(hit, c, cls_id)
    return conf, cls_id.astype(jnp.float32)


def deferred_theta(neck_outs, idx, na: int, nc: int):
    """Resolve CSL theta for the selected candidates only.

    ``neck_outs``: raw per-level head maps ``(B, gh, gw, na·nf)``;
    ``idx``: ``(B, k)`` global candidate indices (anchor-major, row-major
    spatial, levels concatenated — the :func:`decode_csl` order).  Gathers
    each candidate's 180-bin block and argmaxes it — bit-identical bins to
    the full-width argmax (same logits, same first-tie reduce), at ~k/N of
    the traffic (profiled: full-width costs 4.5 ms/step @800px, this runs
    in ~0.1 ms at k=512).
    """
    b, k = idx.shape
    theta_bin = jnp.zeros((b, k), jnp.int32)
    off = 0
    for x in neck_outs:
        _, gh, gw, C = x.shape
        nf = C // na
        hw = gh * gw
        local = idx - off
        in_lvl = (local >= 0) & (local < na * hw)
        anchor = jnp.clip(local // hw, 0, na - 1)
        pos = jnp.clip(local - anchor * hw, 0, hw - 1)
        # direct 4-D gather: a (b, hw, C) reshape of the head map is a real
        # relayout copy in the conv layout (h and w are not adjacent there;
        # profiled ~0.9 ms/step over the three levels)
        r, c = pos // gw, pos % gw
        rows = jax.vmap(lambda xb, rb, cb: xb[rb, cb, :])(x, r, c)  # (B,k,C)
        th = jnp.zeros((b, k), jnp.int32)
        for a in range(na):
            bins = jax.lax.slice_in_dim(rows, a * nf + 5 + nc,
                                        (a + 1) * nf, axis=2)
            th_a = jnp.argmax(bins, axis=-1).astype(jnp.int32)
            th = jnp.where(anchor == a, th_a, th)
        theta_bin = jnp.where(in_lvl, th, theta_bin)
        off += na * hw
    return (theta_bin.astype(jnp.float32) - 90.0) / 180.0 * jnp.pi


@functools.partial(jax.jit,
                   static_argnames=("na", "nc", "max_nms", "max_det"))
def post_process_defer(predictions, neck_outs, na: int, nc: int,
                       conf_thres: float, iou_thres: float,
                       max_nms: int = MAX_NMS, max_det: int = MAX_DET):
    """Post-process with deferred theta (``Yolo(..., decode="defer")``).

    ``predictions``: rows from :func:`decode_csl_defer` (theta column 0);
    ``neck_outs``: the raw head maps.  Theta is gathered+argmaxed only for
    the top-k selected candidates — results identical to
    :func:`post_process_fixed` on the full decode.
    """
    theta_fn = lambda idx: deferred_theta(neck_outs, idx, na, nc)  # noqa: E731

    B, N, _ = predictions.shape
    conf, cls_id = _class_max(predictions)
    sel = jnp.where(conf > conf_thres, conf, -1.0)
    payload = [predictions[..., i] for i in range(5)] + [cls_id]
    return _pp_tail(payload, sel, N, iou_thres, max_nms, max_det, None,
                    theta_fn=theta_fn)


@functools.partial(jax.jit,
                   static_argnames=("na", "max_nms", "max_det"))
def post_process_kfiou_defer(scores, neck_outs, na: int, anchors, strides,
                             conf_thres: float, iou_thres: float,
                             max_nms: int = MAX_NMS, max_det: int = MAX_DET):
    """Post-process with FULLY deferred KFIoU decode
    (``Yolo(..., decode="defer")`` in kfiou mode).

    ``scores``: ``(conf, cls_id)`` from :func:`ryolo_tpu.nn.heads.
    decode_kfiou_scores`; ``neck_outs``: the raw head maps.  The box
    fields (x, y, w, h, θ) are gathered+decoded only for the top-k
    selected candidates (:func:`ryolo_tpu.nn.heads.deferred_kfiou_box`) —
    results identical to :func:`post_process_fixed` on the full
    :func:`decode_kfiou` output, skipping its ``(B, N, nc+6)``
    materialization (~166 MB @800px B=8 for the 18-anchor head).
    ``anchors``/``strides``: the model's per-level grid-unit rotated
    anchors (``Yolo.anchors``) and STRIDES — static constants.
    """
    from ryolo_tpu.nn.heads import deferred_kfiou_box

    conf, cls_id = scores
    N = conf.shape[1]
    sel = jnp.where(conf > conf_thres, conf, -1.0)
    box_fn = lambda idx: deferred_kfiou_box(  # noqa: E731
        neck_outs, idx, na, anchors, strides)
    payload = [cls_id.astype(jnp.float32)]
    return _pp_tail(payload, sel, N, iou_thres, max_nms, max_det, None,
                    box_fn=box_fn)


def _pp_tail(payload, sel, N: int, iou_thres, max_nms: int, max_det: int,
             use_topk, theta_fn=None, box_fn=None):
    k = min(max_nms, N)
    if use_topk is None:
        use_topk = N > 2 * k

    if k <= SMALL_K:
        return _select_nms_compact(payload, sel, k, iou_thres, max_det,
                                   use_topk, theta_fn, box_fn)
    # Count-conditioned fast path: when no image exceeds SMALL_K
    # above-threshold candidates, the top-SMALL_K already contains every
    # candidate NMS can see — identical result at a fraction of the
    # sort/buffer width.  lax.cond keeps one fixed output shape.
    n_max = jnp.max(jnp.sum(sel > 0.0, axis=1))
    return jax.lax.cond(
        n_max <= SMALL_K,
        lambda: _select_nms_compact(payload, sel, SMALL_K, iou_thres,
                                    max_det, True, theta_fn, box_fn),
        lambda: _select_nms_compact(payload, sel, k, iou_thres, max_det,
                                    use_topk, theta_fn, box_fn),
    )


def post_process(predictions, conf_thres: float = 0.5,
                 iou_thres: float = 0.4, max_nms: int = MAX_NMS,
                 max_det: int = MAX_DET) -> List[np.ndarray]:
    """Host-facing wrapper with the reference's list-of-arrays contract.

    Returns a list (length B) of ``(n_i, 7)`` numpy arrays
    ``[x, y, w, h, θ(rad), conf, cls]`` — same as ``lib/general.py:136``.
    """
    dets, valid = post_process_fixed(
        jnp.asarray(predictions), float(conf_thres), float(iou_thres),
        max_nms=max_nms, max_det=max_det,
    )
    dets = np.asarray(dets)
    valid = np.asarray(valid)
    return [dets[b][valid[b]] for b in range(dets.shape[0])]
