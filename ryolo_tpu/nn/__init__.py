"""Flax model layer: blocks, backbones (v4/v5/v7), PAN necks, rotated heads."""

from ryolo_tpu.nn.yolo import Yolo, make_anchors, make_rotated_anchors  # noqa: F401
from ryolo_tpu.nn.deploy import fuse_for_inference, fuse_variables  # noqa: F401
