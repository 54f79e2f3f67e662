"""Detection drawing utilities (port of ``lib/plot.py``)."""

from __future__ import annotations

import math
import os

import cv2
import numpy as np

from ryolo_tpu.data.datasets import xywha_to_polys_np


def rescale_boxes(boxes: np.ndarray, current_dim: int, original_shape):
    """Undo the letterbox: network-square coords -> original image coords.

    Port of ``lib/plot.py:9-29``; boxes rows ``[x, y, w, h, ...]``.
    """
    boxes = boxes.copy()
    orig_h, orig_w = original_shape
    pad_x = max(orig_h - orig_w, 0) * (current_dim / max(original_shape))
    pad_y = max(orig_w - orig_h, 0) * (current_dim / max(original_shape))
    unpad_h = current_dim - pad_y
    unpad_w = current_dim - pad_x
    x, y, w, h = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    x1, y1 = x - w / 2, y - h / 2
    x2, y2 = x + w / 2, y + h / 2
    x1 = (x1 - pad_x // 2) / unpad_w * orig_w
    y1 = (y1 - pad_y // 2) / unpad_h * orig_h
    x2 = (x2 - pad_x // 2) / unpad_w * orig_w
    y2 = (y2 - pad_y // 2) / unpad_h * orig_h
    boxes[:, 0] = (x1 + x2) / 2
    boxes[:, 1] = (y1 + y2) / 2
    boxes[:, 2] = x2 - x1
    boxes[:, 3] = y2 - y1
    return boxes


def get_color(c, x, max_val):
    """Class-id rainbow color (port of ``lib/plot.py:32-40``)."""
    colors = np.array(
        [[1, 0, 1], [0, 0, 1], [0, 1, 1], [0, 1, 0], [1, 1, 0], [1, 0, 0]],
        np.float32,
    )
    ratio = float(x) / max_val * 5
    i, j = int(math.floor(ratio)), int(math.ceil(ratio))
    ratio -= i
    r = (1 - ratio) * colors[i][c] + ratio * colors[j][c]
    return int(r * 255)


def plot_boxes(img_path: str, boxes: np.ndarray, class_names, img_size: int,
               output_folder: str, color=None):
    """Draw rotated detections on the original image and save it.

    Port of ``lib/plot.py:43-70`` with the per-box cv2 rotation loop
    replaced by the vectorized polygon conversion.
    """
    img = cv2.imread(img_path)
    nc = len(class_names)
    if len(boxes):
        boxes = rescale_boxes(np.asarray(boxes, np.float64), img_size,
                              img.shape[:2])
        polys = xywha_to_polys_np(boxes[:, :5].astype(np.float32))
        polys = polys.astype(np.intp)
        preds = boxes[:, 5:]
        for poly, pred in zip(polys, preds):
            cls_id = int(pred[1])
            offset = cls_id * 93 % nc
            rgb = color or (get_color(2, offset, nc), get_color(1, offset, nc),
                            get_color(0, offset, nc))
            cv2.drawContours(img, [poly], 0, rgb, 2)
            img = cv2.putText(
                img, f"{class_names[cls_id]}:{round(float(pred[0]), 2)}",
                tuple(poly[0]), cv2.FONT_HERSHEY_SIMPLEX, 0.6, rgb, 1,
            )
    os.makedirs(output_folder, exist_ok=True)
    out_path = os.path.join(output_folder, os.path.split(img_path)[-1])
    cv2.imwrite(out_path, img)
    return out_path
