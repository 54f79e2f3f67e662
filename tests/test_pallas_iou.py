"""Pallas tile-kernel parity (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ryolo_tpu.ops.pallas_iou import pairwise_rotated_iou_pallas
from tests.oracles import pairwise_iou_oracle

INTERPRET = jax.devices()[0].platform != "tpu"


def rand_boxes(n, seed, spread=60.0):
    rng = np.random.default_rng(seed)
    return np.stack([
        rng.uniform(0, spread, n), rng.uniform(0, spread, n),
        rng.uniform(2, 40, n), rng.uniform(2, 40, n),
        rng.uniform(-180, 180, n),
    ], -1).astype(np.float32)


def test_vs_oracle_small():
    b1, b2 = rand_boxes(40, 0, 30.0), rand_boxes(50, 1, 30.0)
    got = np.asarray(pairwise_rotated_iou_pallas(
        jnp.asarray(b1), jnp.asarray(b2), tm=16, tn=128, interpret=INTERPRET))
    want = pairwise_iou_oracle(b1, b2)
    assert (want > 0).mean() > 0.1
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_vs_xla_kernel_padded_tiles():
    from ryolo_tpu.ops.rotated_iou import pairwise_rotated_iou

    b1, b2 = rand_boxes(130, 2), rand_boxes(257, 3)  # forces padding
    got = np.asarray(pairwise_rotated_iou_pallas(
        jnp.asarray(b1), jnp.asarray(b2), tm=16, tn=128, interpret=INTERPRET))
    want = np.asarray(pairwise_rotated_iou(jnp.asarray(b1), jnp.asarray(b2)))
    diff = np.abs(got - want)
    # knife-edge pairs (a vertex within ±eps of a clip line) may resolve
    # differently between the two implementations; bound their frequency.
    assert np.mean(diff > 1e-3) < 5e-4, np.sort(diff.ravel())[-5:]
    assert np.median(diff) < 1e-6


def test_identical_boxes_diag():
    b = rand_boxes(16, 4)
    got = np.asarray(pairwise_rotated_iou_pallas(
        jnp.asarray(b), jnp.asarray(b), tm=16, tn=128, interpret=INTERPRET))
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-5)
