"""Detection drawing: map boxes back to the source image and render them.

Behavior contract: ``/root/reference/lib/plot.py`` — output images must
match pixel-for-pixel (same un-letterbox arithmetic including the
integer-halved padding, same class->color ramp, same text format), but the
implementation here works directly on box centers/sizes instead of the
reference's xywh->xyxy->xywh round-trip, and polygon corners come from the
vectorized geometry helper instead of a per-box cv2 rotation-matrix loop.
"""

from __future__ import annotations

import os

import cv2
import numpy as np

from ryolo_tpu.data.datasets import xywha_to_polys_np

# Six-anchor color ramp in (B, G, R) channel order — a parity constant
# (lib/plot.py:33): class colors interpolate along this ramp.
_COLOR_RAMP = np.array(
    [[1, 0, 1], [0, 0, 1], [0, 1, 1], [0, 1, 0], [1, 1, 0], [1, 0, 0]],
    np.float32,
)


def rescale_boxes(boxes: np.ndarray, current_dim: int, original_shape):
    """Undo the letterbox: network-square coords -> original-image coords.

    The letterbox scales the long side of the original image to
    ``current_dim`` and pads the short side symmetrically; the reference
    floors the half-padding (``// 2``, ``lib/plot.py:21-24``), which we
    reproduce.  Centers translate-and-scale; sizes only scale — this is
    algebraically identical to the reference's corner-space round-trip.

    Args:
      boxes: ``(n, >=4)`` rows ``[cx, cy, w, h, ...]`` in network coords.
    """
    orig_h, orig_w = original_shape
    scale = current_dim / max(orig_h, orig_w)
    pad_x = max(orig_h - orig_w, 0) * scale
    pad_y = max(orig_w - orig_h, 0) * scale
    span_x = current_dim - pad_x
    span_y = current_dim - pad_y

    out = np.array(boxes, np.float64, copy=True)
    out[:, 0] = (out[:, 0] - pad_x // 2) * (orig_w / span_x)
    out[:, 1] = (out[:, 1] - pad_y // 2) * (orig_h / span_y)
    out[:, 2] *= orig_w / span_x
    out[:, 3] *= orig_h / span_y
    return out


def get_color(channel: int, x, max_val) -> int:
    """One color channel off the ramp at position ``x / max_val``
    (``lib/plot.py:32-40`` contract; kept for API parity)."""
    t = float(x) / max_val * 5
    lo, hi = int(np.floor(t)), int(np.ceil(t))
    frac = t - lo
    value = (1 - frac) * _COLOR_RAMP[lo, channel] \
        + frac * _COLOR_RAMP[hi, channel]
    return int(value * 255)


def class_color(cls_id: int, n_classes: int):
    """The reference's scrambled class->color mapping: class ids are spread
    along the ramp by the coprime stride 93 (``lib/plot.py:56-63``)."""
    pos = cls_id * 93 % n_classes
    return tuple(get_color(ch, pos, n_classes) for ch in (2, 1, 0))


def plot_boxes(img_path: str, boxes: np.ndarray, class_names, img_size: int,
               output_folder: str, color=None) -> str:
    """Draw rotated detections on the original image and save it.

    Args:
      boxes: ``(n, 7)`` detections ``[x, y, w, h, θ, conf, cls]`` in
        network coords.

    Returns the written file path.
    """
    img = cv2.imread(img_path)
    boxes = np.asarray(boxes, np.float64)
    if len(boxes):
        boxes = rescale_boxes(boxes, img_size, img.shape[:2])
        corners = xywha_to_polys_np(boxes[:, :5].astype(np.float32))
        corners = corners.astype(np.intp)
        for quad, det in zip(corners, boxes):
            cls_id = int(det[6])
            pen = color or class_color(cls_id, len(class_names))
            cv2.drawContours(img, [quad], 0, pen, 2)
            label = f"{class_names[cls_id]}:{round(float(det[5]), 2)}"
            img = cv2.putText(img, label, tuple(quad[0]),
                              cv2.FONT_HERSHEY_SIMPLEX, 0.6, pen, 1)
    os.makedirs(output_folder, exist_ok=True)
    out_path = os.path.join(output_folder, os.path.split(img_path)[-1])
    cv2.imwrite(out_path, img)
    return out_path
