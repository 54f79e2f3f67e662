"""Unit tests for ryolo_tpu.geometry (SURVEY.md §4a: pure-function geometry)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ryolo_tpu import geometry as G


def rand_boxes(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(50, 500, n)
    y = rng.uniform(50, 500, n)
    w = rng.uniform(5, 60, n)
    h = w + rng.uniform(1, 60, n)  # long-side-h convention: h > w
    t = rng.uniform(-np.pi / 2, np.pi / 2 - 1e-3, n)
    return np.stack([x, y, w, h, t], -1).astype(np.float32)


class TestNormAngle:
    def test_in_range_identity(self):
        t = jnp.array([-1.5, 0.0, 1.5])
        np.testing.assert_allclose(G.norm_angle(t), t)

    def test_single_period_wrap(self):
        np.testing.assert_allclose(
            G.norm_angle(jnp.array([jnp.pi / 2, -jnp.pi / 2 - 0.1])),
            np.array([-np.pi / 2, np.pi / 2 - 0.1]),
            atol=1e-6,
        )

    def test_wrap_angle_full_mod(self):
        t = jnp.array([10.0, -7.0, 3 * jnp.pi])
        w = G.wrap_angle(t)
        assert np.all(np.asarray(w) >= -np.pi / 2) and np.all(np.asarray(w) < np.pi / 2)
        np.testing.assert_allclose(np.cos(2 * np.asarray(w)), np.cos(2 * np.asarray(t)), atol=1e-5)


class TestXYWH:
    def test_xywh2xyxy(self):
        box = jnp.array([[10.0, 20.0, 4.0, 6.0]])
        np.testing.assert_allclose(G.xywh2xyxy(box), [[8, 17, 12, 23]])


class TestPolyRoundTrip:
    def test_axis_aligned(self):
        box = jnp.array([[100.0, 50.0, 10.0, 30.0, 0.0]])
        poly = G.xywha2xyxyxyxy(box)
        # long side h=30 spans x, short side w=10 spans y (lib/general.py:58-61)
        np.testing.assert_allclose(
            np.asarray(poly)[0],
            [[85, 45], [115, 45], [115, 55], [85, 55]],
            atol=1e-4,
        )

    def test_round_trip_random(self):
        boxes = rand_boxes(256)
        poly = G.xywha2xyxyxyxy(jnp.asarray(boxes)).reshape(-1, 8)
        rec = np.asarray(G.xyxyxyxy2xywha(poly))
        np.testing.assert_allclose(rec, boxes, rtol=1e-3, atol=1e-2)

    def test_matches_reference_cv2_matrix(self):
        """Cross-check the batched rotation against cv2.getRotationMatrix2D."""
        cv = pytest.importorskip("cv2")
        boxes = rand_boxes(32, seed=3)
        ours = np.asarray(G.xywha2xyxyxyxy(jnp.asarray(boxes)))
        for i, (x, y, w, h, t) in enumerate(boxes):
            R = cv.getRotationMatrix2D((float(x), float(y)), float(t * 180 / np.pi), 1)
            base = np.array(
                [
                    [x - h / 2, y - w / 2, 1],
                    [x + h / 2, y - w / 2, 1],
                    [x + h / 2, y + w / 2, 1],
                    [x - h / 2, y + w / 2, 1],
                ]
            )
            ref = base @ R.T
            np.testing.assert_allclose(ours[i], ref, atol=1e-3)


class TestGaussianSigma:
    def test_axis_aligned_sigma(self):
        box = jnp.array([[0.0, 0.0, 4.0, 10.0, 0.0]])
        _, _, _, sigma = G.xywhr2xywhrsigma(box)
        np.testing.assert_allclose(
            np.asarray(sigma)[0], [[4.0, 0.0], [0.0, 25.0]], atol=1e-5
        )

    def test_rotation_preserves_eigvals(self):
        box = jnp.array([[0.0, 0.0, 4.0, 10.0, 0.7]])
        _, _, _, sigma = G.xywhr2xywhrsigma(box)
        ev = np.linalg.eigvalsh(np.asarray(sigma)[0])
        np.testing.assert_allclose(sorted(ev), [4.0, 25.0], atol=0.05)

    def test_wh_clamp(self):
        box = jnp.array([[0.0, 0.0, 0.0, 1e9, 0.0]])
        _, wh, _, _ = G.xywhr2xywhrsigma(box)
        np.testing.assert_allclose(np.asarray(wh)[0], [1e-4, 1e4])


class TestCSLLabels:
    def _reference_gaussian_label(self, label, num_class=180, u=0, sig=6.0):
        # transcription of datasets/base_dataset.py:13-31 semantics in numpy
        x = np.arange(-num_class / 2, num_class / 2)
        y_sig = np.exp(-((x - u) ** 2) / (2 * sig ** 2))
        index = int(num_class / 2 - label)
        return np.concatenate([y_sig[index:], y_sig[:index]], axis=0)

    @pytest.mark.parametrize("angle", [0.0, 45.3, 90.0, 133.7, 179.99, 1.2])
    def test_matches_reference(self, angle):
        ref = self._reference_gaussian_label(angle)
        ours = np.asarray(G.csl_gaussian_labels(jnp.float32(angle)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)
        ours_np = G.csl_gaussian_labels_np(np.array(angle))
        np.testing.assert_allclose(ours_np, ref, atol=1e-6)

    def test_peak_at_label_bin(self):
        lab = np.asarray(G.csl_gaussian_labels(jnp.float32(117.0)))
        assert lab.argmax() == 117
        assert lab.max() == pytest.approx(1.0)

    def test_circular_wraparound(self):
        lab = np.asarray(G.csl_gaussian_labels(jnp.float32(0.0)))
        # bins near 179 are circular neighbors of bin 0
        assert lab[179] == pytest.approx(np.exp(-1 / 72), abs=1e-5)
