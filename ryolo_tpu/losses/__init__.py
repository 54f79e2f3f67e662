"""Losses and target assignment (CSL + KFIoU), fixed-shape and jit-native."""

from ryolo_tpu.losses.csl import csl_loss  # noqa: F401
from ryolo_tpu.losses.kfiou import kfiou_loss  # noqa: F401
