"""Data pipeline tests: parsers, letterbox, augment semantics, padded collate."""

import os
import sys

import numpy as np
import pytest

from ryolo_tpu.data.augment import (
    filter_by_center,
    horizontal_flip,
    normalize_targets,
    pad_to_square,
    random_warping,
    vertical_flip,
)
from ryolo_tpu.data.datasets import (
    CustomDataset,
    polys_to_xywha_np,
    xywha_to_polys_np,
)
from ryolo_tpu.data.loader import load_data

HYP = {
    "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
    "rotate": 45, "translate": 0.1, "scale": 0.5,
    "flipud": 0.5, "fliplr": 0.5, "mosaic": 1.0, "mixup": 0.15,
}


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    sys.path.insert(0, os.path.dirname(__file__))
    from make_synth_data import main

    main(root, n_images=6, img_size=128, seed=1)
    return root


class TestLetterbox:
    def test_square_input_unchanged_dims(self):
        img = np.zeros((100, 100, 3), np.uint8)
        out, (dh, dw) = pad_to_square(img, (64, 64), (114, 114, 114))
        assert out.shape == (64, 64, 3)
        assert dh == 0 and dw == 0

    def test_wide_input_pads_height(self):
        img = np.zeros((50, 100, 3), np.uint8)
        out, (dh, dw) = pad_to_square(img, (64, 64), (114, 114, 114))
        assert out.shape == (64, 64, 3)
        assert dh > 0 and dw == 0
        assert (out[0] == 114).all()  # top padding row


class TestAugment:
    def test_flips_round_trip(self):
        img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        tgt = np.array([[0, 0.1, 0.2, 0.3, 0.2, 0.3, 0.4, 0.1, 0.4]],
                       np.float32)
        i2, t2 = horizontal_flip(img.copy(), tgt.copy())
        i3, t3 = horizontal_flip(i2.copy(), t2.copy())
        np.testing.assert_allclose(t3, tgt, atol=1e-6)
        np.testing.assert_array_equal(i3, img)
        i2, t2 = vertical_flip(img.copy(), tgt.copy())
        i3, t3 = vertical_flip(i2.copy(), t2.copy())
        np.testing.assert_allclose(t3, tgt, atol=1e-6)

    def test_warp_preserves_box_geometry(self):
        """Affine warp must keep polygon side ratios (rigid + uniform scale)."""
        rng = np.random.default_rng(0)
        img = np.full((128, 128, 3), 50, np.uint8)
        poly = np.array([[0, 30, 30, 70, 30, 70, 50, 30, 50]], np.float32)
        _, t2 = random_warping(img, poly.copy(), rng, degrees=30, scale=0.2,
                               translate=0.1)
        p0 = poly[0, 1:].reshape(4, 2)
        p1 = t2[0, 1:].reshape(4, 2)
        d0 = np.linalg.norm(p0[0] - p0[1]) / np.linalg.norm(p0[1] - p0[2])
        d1 = np.linalg.norm(p1[0] - p1[1]) / np.linalg.norm(p1[1] - p1[2])
        assert d1 == pytest.approx(d0, rel=1e-4)

    def test_filter_by_center(self):
        tgt = np.zeros((2, 9), np.float32)
        tgt[0, 1::2] = 10  # center (10, 10)
        tgt[1, 1::2] = 90
        tgt[0, 2::2] = 10
        tgt[1, 2::2] = 90
        out = filter_by_center(tgt, (0, 50, 0, 50))
        assert len(out) == 1

    def test_normalize(self):
        tgt = np.ones((1, 9), np.float32) * 50
        out = normalize_targets(tgt, (100, 200))
        assert out[0, 1] == pytest.approx(0.25)  # x / 200
        assert out[0, 2] == pytest.approx(0.5)   # y / 100


class TestPolyConversions:
    def test_np_round_trip(self):
        rng = np.random.default_rng(2)
        n = 64
        boxes = np.stack([
            rng.uniform(50, 150, n), rng.uniform(50, 150, n),
            rng.uniform(5, 20, n), rng.uniform(25, 60, n),
            rng.uniform(-np.pi / 2, np.pi / 2 - 1e-3, n),
        ], -1).astype(np.float32)
        rec = polys_to_xywha_np(xywha_to_polys_np(boxes).reshape(-1, 8))
        np.testing.assert_allclose(rec, boxes, rtol=1e-3, atol=1e-2)


class TestLoader:
    def test_custom_dataset_parses(self, synth):
        ds = CustomDataset(os.path.join(synth, "train"), ["a", "b"], HYP,
                           img_size=128, augment=False, csl=True)
        assert len(ds) == 6
        path, img, labels = ds.get_sample(0, np.random.default_rng(0))
        assert img.shape == (128, 128, 3)
        assert img.dtype == np.float32 and img.max() <= 1.0
        assert labels.shape[1] == 187
        assert len(labels) >= 1
        # normalized coords and in-range angles
        assert (labels[:, 2:6] >= 0).all() and (labels[:, 2:6] <= 1).all()
        assert (labels[:, 6] >= -np.pi / 2).all() and (labels[:, 6] < np.pi / 2).all()
        # CSL peak bin equals the angle bin
        peak = labels[:, 7:].argmax(1)
        want = np.trunc(labels[:, 6] * 180 / np.pi + 90)
        np.testing.assert_array_equal(peak, want.astype(int))

    def test_image_uint8_mode_matches_f32(self, synth):
        """uint8 samples must be exactly the pre-/255 f32 samples, for both
        the labelled dataset and the detect-CLI ImageDataset."""
        from ryolo_tpu.data.datasets import ImageDataset

        ds32 = CustomDataset(os.path.join(synth, "train"), ["a", "b"], HYP,
                             img_size=128, augment=False, csl=True)
        ds8 = CustomDataset(os.path.join(synth, "train"), ["a", "b"], HYP,
                            img_size=128, augment=False, csl=True)
        ds8.image_uint8 = True
        _, img32, lab32 = ds32.get_sample(0, np.random.default_rng(0))
        _, img8, lab8 = ds8.get_sample(0, np.random.default_rng(0))
        assert img8.dtype == np.uint8
        np.testing.assert_array_equal(img8.astype(np.float32) / 255.0, img32)
        np.testing.assert_array_equal(lab8, lab32)

        d32 = ImageDataset(os.path.join(synth, "train"), img_size=128)
        d8 = ImageDataset(os.path.join(synth, "train"), img_size=128,
                          image_uint8=True)
        _, i32 = d32[0]
        _, i8 = d8[0]
        assert i8.dtype == np.uint8
        np.testing.assert_array_equal(i8.astype(np.float32) / 255.0, i32)

    def test_augmented_sample_runs(self, synth):
        ds = CustomDataset(os.path.join(synth, "train"), ["a", "b"], HYP,
                           img_size=128, augment=True, csl=False)
        for seed in range(4):
            _, img, labels = ds.get_sample(0, np.random.default_rng(seed))
            assert img.shape == (128, 128, 3)
            assert labels.shape[1] == 7

    def test_padded_batches(self, synth):
        _, loader = load_data(
            os.path.join(synth, "train"), ["a", "b"], "custom", HYP,
            csl=True, img_size=128, batch_size=4, augment=False,
            shuffle=False, max_targets=16,
        )
        batches = list(loader)
        assert len(batches) == 2  # 6 imgs / bs 4 -> 2 (last partial)
        b = batches[0]
        assert b["images"].shape == (4, 128, 128, 3)
        assert b["tgt"].shape == (4, 16, 6)
        assert b["tgt_csl"].shape == (4, 16, 180)
        assert b["tgt_mask"].shape == (4, 16)
        assert b["tgt_mask"].sum() >= 4
        assert batches[1]["images"].shape[0] == 2

    def test_determinism_same_seed(self, synth):
        _, l1 = load_data(os.path.join(synth, "train"), ["a", "b"], "custom",
                          HYP, csl=False, img_size=128, batch_size=2,
                          augment=True, shuffle=True, seed=7)
        _, l2 = load_data(os.path.join(synth, "train"), ["a", "b"], "custom",
                          HYP, csl=False, img_size=128, batch_size=2,
                          augment=True, shuffle=True, seed=7)
        b1, b2 = next(iter(l1)), next(iter(l2))
        np.testing.assert_array_equal(b1["images"], b2["images"])
        np.testing.assert_array_equal(b1["tgt"], b2["tgt"])

    def test_epoch_changes_augmentation(self, synth):
        _, loader = load_data(os.path.join(synth, "train"), ["a", "b"],
                              "custom", HYP, csl=False, img_size=128,
                              batch_size=2, augment=True, shuffle=False,
                              seed=7)
        b1 = next(iter(loader))
        loader.set_epoch(1)
        b2 = next(iter(loader))
        assert not np.array_equal(b1["images"], b2["images"])

    def test_host_sharded_loading(self, synth):
        """shard=(host, n) slices each epoch across hosts in lockstep
        (SURVEY §5.8 host-sharded loading for multi-host DP)."""
        def paths_of(shard):
            _, loader = load_data(os.path.join(synth, "train"), ["a", "b"],
                                  "custom", HYP, csl=False, img_size=128,
                                  batch_size=2, augment=False, shuffle=True,
                                  seed=7, shard=shard)
            return [p for b in loader for p in b["paths"]], len(loader)

        full, _ = paths_of(None)
        p0, l0 = paths_of((0, 2))
        p1, l1 = paths_of((1, 2))
        assert l0 == l1  # lockstep: same number of steps on every host
        assert len(p0) == len(p1) == len(full) // 2
        assert not (set(p0) & set(p1))        # disjoint (6 images, no wrap)
        assert set(p0) | set(p1) == set(full)  # complete coverage
