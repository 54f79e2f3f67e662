"""Rotated mAP evaluation: per-image matching + PR/AP computation.

Host-side ports of ``test.py``'s evaluation stack with the detectron2 CUDA
IoU replaced by the XLA pairwise kernel:

  * :func:`get_batch_statistics`  — greedy per-class max-IoU matching with
    detected-set dedup (``test.py:102-149``); order-dependent semantics
    reproduced exactly (SURVEY.md §7 hard part 4).
  * :func:`ap_per_class` / :func:`compute_ap` — PR curves at 1000
    confidence points, 101-point COCO-interp AP, F1-max operating point
    (``test.py:16-99``).
  * :func:`calculate_eval_stats` — aggregation (``test.py:152-164``).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

def pairwise_rotated_iou_host(boxes1, boxes2):
    """Small-matrix pairwise skew-IoU for the host matching loop.

    Prefers the native C++ kernel: eval matching issues many tiny
    (n_pred × n_tgt) calls per image/class, and a device dispatch costs a
    tunnel round-trip (~20 ms) — far more than computing a few thousand
    clips on the host.  Falls back to the bucketed XLA kernel if the
    native library cannot build.
    """
    try:
        from ryolo_tpu.ops.native import pairwise_rotated_iou_native

        return pairwise_rotated_iou_native(boxes1, boxes2)
    except Exception:
        from ryolo_tpu.ops.rotated_iou import (
            pairwise_rotated_iou_host as xla_host,
        )

        return xla_host(boxes1, boxes2)


def compute_ap(recall, precision):
    """101-point COCO-interpolated AP (``test.py:72-99``)."""
    mrec = np.concatenate(([0.0], recall, [recall[-1] + 0.01]))
    mpre = np.concatenate(([1.0], precision, [0.0]))
    mpre = np.flip(np.maximum.accumulate(np.flip(mpre)))
    x = np.linspace(0, 1, 101)
    ap = np.trapezoid(np.interp(x, mrec, mpre), x)
    return ap, mpre, mrec


def ap_per_class(tp, conf, pred_cls, target_cls):
    """Per-class P/R/AP at the F1-max operating point (``test.py:16-69``)."""
    i = np.argsort(-conf)
    tp, conf, pred_cls = tp[i], conf[i], pred_cls[i]

    unique_classes = np.unique(target_cls)
    nc = unique_classes.shape[0]

    px = np.linspace(0, 1, 1000)
    ap = np.zeros((nc, tp.shape[1]))
    p = np.zeros((nc, 1000))
    r = np.zeros((nc, 1000))
    for ci, c in enumerate(unique_classes):
        sel = pred_cls == c
        n_l = (target_cls == c).sum()
        n_p = sel.sum()
        if n_p == 0 or n_l == 0:
            continue
        fpc = (1 - tp[sel]).cumsum(0)
        tpc = tp[sel].cumsum(0)
        recall = tpc / (n_l + 1e-16)
        r[ci] = np.interp(-px, -conf[sel], recall[:, 0], left=0)
        precision = tpc / (tpc + fpc)
        p[ci] = np.interp(-px, -conf[sel], precision[:, 0], left=1)
        for j in range(tp.shape[1]):
            ap[ci, j], _, _ = compute_ap(recall[:, j], precision[:, j])

    f1 = 2 * p * r / (p + r + 1e-16)
    i = f1.mean(0).argmax()
    return p[:, i], r[:, i], ap, f1[:, i], unique_classes.astype("int32")


def get_batch_statistics(outputs: Sequence[np.ndarray], targets: np.ndarray,
                         iouv: np.ndarray, niou: int):
    """True-positive flags per detection at each IoU threshold.

    Args:
      outputs: per-image ``(n_i, 7)`` arrays ``[x, y, w, h, θ(rad), conf,
        cls]`` (post_process output).
      targets: ``(M, 7)`` reference-layout rows ``[img_idx, cls, x, y, w, h,
        θ(rad)]`` in pixels.
      iouv: IoU thresholds (typically linspace(.5, .95, 10)).

    Port of ``test.py:102-149`` including the greedy matching order and the
    rad→deg conversion before the skew-IoU call (``test.py:127-128``).
    """
    batch_stats = []
    for sample_i, pred in enumerate(outputs):
        tar = targets[targets[:, 0] == sample_i, 1:]
        nl = len(tar)
        tcls = tar[:, 0].tolist() if nl else []

        if len(pred) == 0:
            if nl:
                batch_stats.append(
                    (np.zeros((0, niou), bool), np.empty(0), np.empty(0), tcls)
                )
            continue

        pred_boxes = pred[:, :5].copy()
        pred_scores = pred[:, 5]
        pred_labels = pred[:, 6]
        true_positives = np.zeros((pred.shape[0], niou), bool)

        if nl:
            detected = set()
            target_labels = tar[:, 0]
            target_boxes = tar[:, 1:6].copy()
            pred_boxes[:, 4] = pred_boxes[:, 4] / np.pi * 180
            target_boxes[:, 4] = target_boxes[:, 4] / np.pi * 180

            for cls in np.unique(target_labels):
                ti = np.nonzero(cls == target_labels)[0]
                pi = np.nonzero(cls == pred_labels)[0]
                if not pi.shape[0]:
                    continue
                iou_mat = pairwise_rotated_iou_host(pred_boxes[pi],
                                                    target_boxes[ti])
                ious = iou_mat.max(1)
                best = iou_mat.argmax(1)
                for j in np.nonzero(ious > iouv[0])[0]:
                    d = int(ti[best[j]])
                    if d not in detected:
                        detected.add(d)
                        true_positives[pi[j]] = ious[j] > iouv
                        if len(detected) == nl:
                            break

        batch_stats.append((true_positives, pred_scores, pred_labels, tcls))
    return batch_stats


def calculate_eval_stats(stats, num_classes: int):
    """Aggregate statistics into mAP numbers (``test.py:152-164``)."""
    p = r = f1 = mp = mr = map50 = map5095 = 0.0
    ap50, ap, ap_class = [], [], []
    if len(stats) and stats[0].any():
        p, r, ap, f1, ap_class = ap_per_class(*stats)
        ap50, ap = ap[:, 0], ap.mean(1)
        mp, mr, map50, map5095 = p.mean(), r.mean(), ap50.mean(), ap.mean()
        nt = np.bincount(stats[3].astype(np.int64), minlength=num_classes)
    else:
        nt = np.zeros(1)
    return nt, p, r, ap50, ap, f1, ap_class, mp, mr, map50, map5095
