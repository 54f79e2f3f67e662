"""C++ host kernels vs XLA kernels vs float64 python oracle (3-way parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ryolo_tpu.ops.native import (
    nms_rotated_native,
    pairwise_rotated_iou_native,
)
from ryolo_tpu.ops.rotated_iou import pairwise_rotated_iou
from ryolo_tpu.ops.rotated_nms import nms_rotated
from tests.oracles import nms_oracle, pairwise_iou_oracle


def rand_boxes(n, seed, spread=60.0):
    rng = np.random.default_rng(seed)
    return np.stack([
        rng.uniform(0, spread, n), rng.uniform(0, spread, n),
        rng.uniform(2, 40, n), rng.uniform(2, 40, n),
        rng.uniform(-180, 180, n),
    ], -1).astype(np.float32)


class TestNativeIoU:
    def test_vs_python_oracle(self):
        b1, b2 = rand_boxes(50, 1), rand_boxes(60, 2)
        got = pairwise_rotated_iou_native(b1, b2)
        want = pairwise_iou_oracle(b1, b2)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_vs_xla_kernel(self):
        b1, b2 = rand_boxes(40, 3), rand_boxes(45, 4)
        native = pairwise_rotated_iou_native(b1, b2)
        xla = np.asarray(pairwise_rotated_iou(jnp.asarray(b1), jnp.asarray(b2)))
        np.testing.assert_allclose(native, xla, atol=2e-4)

    def test_empty(self):
        assert pairwise_rotated_iou_native(
            np.zeros((0, 5), np.float32), rand_boxes(3, 0)
        ).shape == (0, 3)


class TestNativeNMS:
    def test_vs_python_oracle(self):
        for seed in range(3):
            boxes = rand_boxes(80, seed + 10, spread=40.0)
            scores = np.random.default_rng(seed).uniform(0, 1, 80).astype(np.float32)
            got = nms_rotated_native(boxes, scores, 0.3)
            want = nms_oracle(boxes, scores, 0.3)
            np.testing.assert_array_equal(got, want)

    def test_vs_xla_kernel(self):
        boxes = rand_boxes(64, 42, spread=35.0)
        scores = np.random.default_rng(0).uniform(0, 1, 64).astype(np.float32)
        native = nms_rotated_native(boxes, scores, 0.4)
        xla = np.asarray(nms_rotated(boxes, scores, 0.4))
        np.testing.assert_array_equal(native, xla)

    def test_empty(self):
        out = nms_rotated_native(np.zeros((0, 5), np.float32),
                                 np.zeros((0,), np.float32), 0.5)
        assert out.shape == (0,)
