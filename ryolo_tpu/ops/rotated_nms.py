"""Fixed-shape rotated NMS for TPU.

Replaces detectron2's CUDA ``nms_rotated`` (reference call site
``lib/general.py:177``) with an exact greedy suppression over a static-shape
candidate set: the IoU matrix is computed once with the vectorized
Sutherland–Hodgman kernel, and the inherently sequential greedy pass runs as
a ``fori_loop`` of cheap K-vector updates on device.

Semantics match detectron2: candidates are processed in descending score
order; a candidate is suppressed when its IoU with any *kept*
higher-scoring candidate exceeds ``iou_threshold`` (strictly greater).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ryolo_tpu.ops.rotated_iou import pairwise_rotated_iou

NEG_INF = jnp.float32(-1e30)


@functools.partial(jax.jit, static_argnames=())
def nms_rotated_masked(boxes: jax.Array, scores: jax.Array, valid: jax.Array,
                       iou_threshold: jax.Array):
    """Greedy rotated NMS on a fixed-size padded candidate set.

    Args:
      boxes:  ``(K, 5)`` rotated boxes ``(cx, cy, w, h, angle_deg)``.
      scores: ``(K,)`` confidence scores.
      valid:  ``(K,)`` bool, False for padding rows.
      iou_threshold: scalar suppression threshold.

    Returns:
      order: ``(K,)`` int32 — candidate indices sorted by descending score
        (padding pushed to the end).
      keep:  ``(K,)`` bool — keep decision aligned with ``order``.

    ``boxes[order[keep]]`` (in order) reproduces detectron2's
    ``nms_rotated`` output ordering.
    """
    k = scores.shape[0]
    if k == 0:  # static shape: nothing to suppress
        return jnp.zeros((0,), jnp.int32), jnp.zeros((0,), bool)
    sort_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-sort_scores).astype(jnp.int32)
    sboxes = boxes[order]
    svalid = valid[order]

    iou = pairwise_rotated_iou(sboxes, sboxes)  # (K, K)
    suppress = iou > iou_threshold  # strict, per detectron2

    def body(i, keep):
        # Suppressed iff any kept higher-score candidate overlaps too much.
        hit = jnp.any(keep & suppress[:, i])
        keep_i = svalid[i] & jnp.logical_not(hit)
        return keep.at[i].set(keep_i)

    keep = jax.lax.fori_loop(0, k, body, jnp.zeros((k,), bool))
    return order, keep


def nms_rotated(boxes, scores, iou_threshold: float):
    """Eager convenience wrapper mirroring detectron2's ``nms_rotated`` API.

    Returns kept indices (into the input arrays) sorted by descending score,
    as a dynamically-sized numpy-backed array — use :func:`nms_rotated_masked`
    inside jitted pipelines.
    """
    import numpy as np

    boxes = jnp.asarray(boxes, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    valid = jnp.ones(scores.shape, bool)
    order, keep = nms_rotated_masked(boxes, scores, valid,
                                     jnp.float32(iou_threshold))
    order = np.asarray(order)
    keep = np.asarray(keep)
    return jnp.asarray(order[keep])
