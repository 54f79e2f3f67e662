"""Golden parity tests for the rotated IoU / NMS kernels (SURVEY.md §4b)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ryolo_tpu.ops.rotated_iou import (
    pairwise_rotated_iou,
    rotated_iou_pairs,
    box_to_corners,
)
from ryolo_tpu.ops.rotated_nms import nms_rotated, nms_rotated_masked
from tests.oracles import (
    monte_carlo_iou,
    nms_oracle,
    pairwise_iou_oracle,
    rotated_iou_oracle,
)


def rand_d2_boxes(n, seed=0, spread=100.0):
    rng = np.random.default_rng(seed)
    return np.stack(
        [
            rng.uniform(0, spread, n),
            rng.uniform(0, spread, n),
            rng.uniform(2, 40, n),
            rng.uniform(2, 40, n),
            rng.uniform(-180, 180, n),
        ],
        -1,
    ).astype(np.float32)


class TestCorners:
    def test_axis_aligned(self):
        c = np.asarray(box_to_corners(jnp.array([[0.0, 0.0, 4.0, 2.0, 0.0]])))[0]
        assert sorted(map(tuple, c.tolist())) == sorted(
            [(2, 1), (-2, 1), (-2, -1), (2, -1)]
        )

    def test_rotation_90(self):
        c = np.asarray(box_to_corners(jnp.array([[0.0, 0.0, 4.0, 2.0, 90.0]])))[0]
        assert sorted(map(tuple, np.round(c, 5).tolist())) == sorted(
            [(1, 2), (-1, 2), (-1, -2), (1, -2)]
        )


class TestIoUAnalytic:
    def test_identical(self):
        b = jnp.array([[10.0, 10.0, 8.0, 4.0, 33.0]])
        np.testing.assert_allclose(rotated_iou_pairs(b, b), [1.0], atol=1e-5)

    def test_disjoint(self):
        b1 = jnp.array([[0.0, 0.0, 2.0, 2.0, 15.0]])
        b2 = jnp.array([[100.0, 100.0, 2.0, 2.0, -40.0]])
        np.testing.assert_allclose(rotated_iou_pairs(b1, b2), [0.0], atol=1e-7)

    def test_half_overlap_axis_aligned(self):
        b1 = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b2 = jnp.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
        # inter = 2, union = 6
        np.testing.assert_allclose(rotated_iou_pairs(b1, b2), [1 / 3], atol=1e-5)

    def test_contained(self):
        b1 = jnp.array([[0.0, 0.0, 10.0, 10.0, 0.0]])
        b2 = jnp.array([[0.0, 0.0, 2.0, 2.0, 45.0]])
        np.testing.assert_allclose(rotated_iou_pairs(b1, b2), [4 / 100], atol=1e-5)

    def test_crossed_45(self):
        # Two long thin boxes crossing at 45 deg through the origin.
        b1 = np.array([0.0, 0.0, 20.0, 2.0, 0.0])
        b2 = np.array([0.0, 0.0, 20.0, 2.0, 45.0])
        got = float(rotated_iou_pairs(jnp.asarray(b1[None]), jnp.asarray(b2[None]))[0])
        exact = rotated_iou_oracle(b1, b2)
        assert got == pytest.approx(exact, abs=1e-5)
        assert got == pytest.approx(monte_carlo_iou(b1, b2), abs=5e-3)

    def test_symmetry(self):
        b1 = rand_d2_boxes(64, 1)
        b2 = rand_d2_boxes(64, 2)
        a = np.asarray(rotated_iou_pairs(jnp.asarray(b1), jnp.asarray(b2)))
        b = np.asarray(rotated_iou_pairs(jnp.asarray(b2), jnp.asarray(b1)))
        np.testing.assert_allclose(a, b, atol=2e-5)


class TestIoUOracleParity:
    def test_random_dense_overlaps(self):
        b1 = rand_d2_boxes(40, 11, spread=30.0)  # tight spread -> many overlaps
        b2 = rand_d2_boxes(50, 12, spread=30.0)
        got = np.asarray(pairwise_rotated_iou(jnp.asarray(b1), jnp.asarray(b2)))
        want = pairwise_iou_oracle(b1, b2)
        assert (want > 0).mean() > 0.2  # the test is only meaningful with overlaps
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_angle_grid(self):
        base = np.array([10.0, 10.0, 12.0, 6.0, 0.0], np.float32)
        angles = np.arange(-180, 181, 7.5, dtype=np.float32)
        others = np.tile(base, (len(angles), 1))
        others[:, 4] = angles
        others[:, 0] += 3.0
        got = np.asarray(
            rotated_iou_pairs(jnp.asarray(np.tile(base, (len(angles), 1))), jnp.asarray(others))
        )
        want = np.array([rotated_iou_oracle(base, o) for o in others])
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_near_degenerate_alignment(self):
        # Same box shifted by epsilon, nearly identical angles — the classic
        # numerically-touchy NMS configuration.
        b = np.array([50.0, 50.0, 20.0, 10.0, 30.0])
        eps_shift = b + np.array([1e-3, -1e-3, 0, 0, 1e-3])
        got = float(rotated_iou_pairs(jnp.asarray(b[None]), jnp.asarray(eps_shift[None]))[0])
        want = rotated_iou_oracle(b, eps_shift)
        assert got == pytest.approx(want, abs=1e-3)
        assert got > 0.99

    def test_large_matrix_tiling(self):
        b1 = rand_d2_boxes(300, 5, spread=60.0)
        b2 = rand_d2_boxes(77, 6, spread=60.0)
        got = np.asarray(pairwise_rotated_iou(jnp.asarray(b1), jnp.asarray(b2), row_block=128))
        want = pairwise_iou_oracle(b1, b2)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_empty_inputs(self):
        out = pairwise_rotated_iou(jnp.zeros((0, 5)), jnp.asarray(rand_d2_boxes(3)))
        assert out.shape == (0, 3)


class TestNMS:
    def test_simple_suppression(self):
        boxes = np.array(
            [
                [0, 0, 10, 10, 0],
                [0.5, 0.5, 10, 10, 2],  # heavy overlap with 0
                [40, 40, 10, 10, 30],  # isolated
            ],
            np.float32,
        )
        scores = np.array([0.9, 0.8, 0.7], np.float32)
        keep = np.asarray(nms_rotated(boxes, scores, 0.5))
        np.testing.assert_array_equal(keep, [0, 2])

    def test_oracle_parity_random(self):
        for seed in range(5):
            boxes = rand_d2_boxes(60, seed + 100, spread=50.0)
            rng = np.random.default_rng(seed)
            scores = rng.uniform(0.01, 1, 60).astype(np.float32)
            got = np.asarray(nms_rotated(boxes, scores, 0.3))
            want = nms_oracle(boxes, scores, 0.3)
            np.testing.assert_array_equal(got, want)

    def test_max_keep_cap_and_early_exit(self):
        """Buffer-full semantics: with max_keep << kept-count the output is
        the oracle's kept sequence truncated at max_keep and every later
        candidate dropped — identical whether the chunk loop runs to the
        last valid chunk or exits early once the buffer fills (the
        early-exit path is otherwise never hit by the parity tests)."""
        import jax.numpy as jnp

        from ryolo_tpu.ops.rotated_nms import nms_rotated_masked

        for seed, max_keep in ((0, 7), (1, 16), (2, 33)):
            n = 200
            boxes = rand_d2_boxes(n, seed + 300, spread=400.0)  # sparse:
            scores = np.random.default_rng(seed).uniform(
                0.01, 1, n).astype(np.float32)  # little suppression ->
            # the kept buffer fills well before the last chunk
            order, keep = nms_rotated_masked(
                jnp.asarray(boxes), jnp.asarray(scores),
                jnp.ones(n, bool), jnp.float32(0.3),
                max_keep=max_keep, chunk=32, pallas=False,
            )
            got = np.asarray(order)[np.asarray(keep)]
            want = nms_oracle(boxes, scores, 0.3)
            assert len(want) > max_keep  # the cap must actually bind
            np.testing.assert_array_equal(got, want[:max_keep])

    def test_chunk_width_independence_at_eval_load(self):
        """Greedy semantics are chunk-width-independent by construction:
        a wide-chunk run at eval-like load must reproduce the default
        kept sequence exactly (the knob only trades loop overhead against
        dead-slot pair work — see nms_rotated_masked)."""
        import jax.numpy as jnp

        from ryolo_tpu.ops.rotated_nms import nms_rotated_masked

        n = 2200
        boxes = rand_d2_boxes(n, 77, spread=900.0)
        scores = np.sort(np.random.default_rng(7).uniform(
            0.01, 1, n).astype(np.float32))[::-1].copy()
        valid = jnp.ones(n, bool)
        args = (jnp.asarray(boxes), jnp.asarray(scores), valid,
                jnp.float32(0.4))
        o_auto, k_auto = nms_rotated_masked(*args, max_keep=257,
                                            chunk=128, presorted=True,
                                            pallas=False)
        o_64, k_64 = nms_rotated_masked(*args, max_keep=257, chunk=64,
                                        presorted=True, pallas=False)
        np.testing.assert_array_equal(np.asarray(o_auto)[np.asarray(k_auto)],
                                      np.asarray(o_64)[np.asarray(k_64)])

    def test_masked_padding_rows_never_kept(self):
        boxes = np.zeros((8, 5), np.float32)
        boxes[:, 2:4] = 1.0
        boxes[:4, 0] = np.arange(4) * 100
        scores = np.linspace(1, 0.5, 8).astype(np.float32)
        valid = np.array([True] * 4 + [False] * 4)
        order, keep = nms_rotated_masked(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), jnp.float32(0.5)
        )
        kept = np.asarray(order)[np.asarray(keep)]
        assert set(kept.tolist()) == {0, 1, 2, 3}

    def test_threshold_strictness(self):
        # IoU exactly at threshold must NOT suppress (detectron2 uses >).
        boxes = np.array([[0, 0, 2, 2, 0], [1, 0, 2, 2, 0]], np.float32)  # IoU 1/3
        scores = np.array([0.9, 0.8], np.float32)
        keep = np.asarray(nms_rotated(boxes, scores, 1 / 3))
        np.testing.assert_array_equal(sorted(keep.tolist()), [0, 1])
        keep2 = np.asarray(nms_rotated(boxes, scores, 1 / 3 - 1e-4))
        np.testing.assert_array_equal(keep2, [0])
