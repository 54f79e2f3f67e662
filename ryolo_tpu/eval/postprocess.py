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


@functools.partial(jax.jit, static_argnames=("max_nms", "max_det"))
def post_process_fixed(predictions: jax.Array, conf_thres: float,
                       iou_thres: float, max_nms: int = MAX_NMS,
                       max_det: int = MAX_DET):
    """Batched fixed-shape post-process.

    Args:
      predictions: ``(B, N, nc+6)`` decoded rows ``[x, y, w, h, θ(rad),
        obj, cls...]`` (the jit-fused decode output).
    Returns:
      dets:  ``(B, max_det, 7)`` rows ``[x, y, w, h, θ(rad), conf, cls]``
      valid: ``(B, max_det)`` bool.
    """
    B, N, _ = predictions.shape
    k = min(max_nms, N)

    def per_image(pred):
        obj = pred[:, 5:6]
        cls_scores = pred[:, 6:] * obj
        conf = jnp.max(cls_scores, axis=1)
        cls_id = jnp.argmax(cls_scores, axis=1).astype(jnp.float32)
        ok = conf > conf_thres

        sel_scores = jnp.where(ok, conf, -1.0)
        top_scores, top_idx = jax.lax.top_k(sel_scores, k)
        tvalid = top_scores > 0.0  # only above-threshold rows
        tboxes = pred[top_idx, :5]
        tcls = cls_id[top_idx]

        # class offset + degrees for suppression geometry
        nms_boxes = jnp.concatenate(
            [
                tboxes[:, 0:2] + tcls[:, None] * MAX_WH,
                tboxes[:, 2:4],
                tboxes[:, 4:5] * (180.0 / jnp.pi),
            ],
            axis=1,
        )
        # top_k output is already descending with padding last
        order, keep = nms_rotated_masked(nms_boxes, top_scores, tvalid,
                                         jnp.float32(iou_thres),
                                         max_keep=max_det, presorted=True)
        # Compact kept rows (score order) into the first max_det slots:
        # rank = position among kept candidates; scatter (drop beyond cap).
        rank = jnp.where(keep, jnp.cumsum(keep) - 1, max_det)
        src = jnp.zeros((max_det,), jnp.int32).at[rank].set(
            jnp.arange(k, dtype=jnp.int32), mode="drop"
        )
        n_keep = jnp.minimum(jnp.sum(keep), max_det)
        out_valid = jnp.arange(max_det) < n_keep

        rows = jnp.concatenate(
            [tboxes, top_scores[:, None], tcls[:, None]], axis=1
        )  # (k, 7) in top_idx (score-sorted) order
        srows = rows[order]  # align with `keep`/`rank` positions
        dets = srows[src]
        dets = jnp.where(out_valid[:, None], dets, 0.0)
        return dets, out_valid

    return jax.vmap(per_image)(predictions)


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
