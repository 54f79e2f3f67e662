"""TPU-native rotated-geometry ops.

Replaces the reference's two external detectron2 CUDA kernels
(``nms_rotated`` used at ``lib/general.py:177`` and ``pairwise_iou_rotated``
used at ``test.py:135``) with fixed-shape, vectorized XLA implementations
(plus a Pallas fast path and a C++ host oracle for parity tests).
"""

from ryolo_tpu.ops.rotated_iou import (  # noqa: F401
    pairwise_rotated_iou,
    rotated_iou_pairs,
)
from ryolo_tpu.ops.rotated_nms import nms_rotated  # noqa: F401
