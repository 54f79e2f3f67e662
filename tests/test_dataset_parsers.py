"""DOTA / UCAS-AOD parser tests on miniature fake dataset trees."""

import os

import cv2
import numpy as np
import pytest

from ryolo_tpu.data.datasets import DOTADataset, UCASAODDataset
from ryolo_tpu.data.loader import load_data

HYP = {
    "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
    "rotate": 45, "translate": 0.1, "scale": 0.5,
    "flipud": 0.5, "fliplr": 0.5, "mosaic": 1.0, "mixup": 0.15,
}
DOTA_NAMES = ["plane", "small vehicle"]


def _poly_line(cx, cy, w, h):
    # axis-aligned rectangle polygon
    return (f"{cx-w/2:.1f} {cy-h/2:.1f} {cx+w/2:.1f} {cy-h/2:.1f} "
            f"{cx+w/2:.1f} {cy+h/2:.1f} {cx-w/2:.1f} {cy+h/2:.1f}")


@pytest.fixture(scope="module")
def dota_tree(tmp_path_factory):
    """DOTA layout: images/*.png + annfiles/*.txt with 'x1..y4 name' rows
    (datasets/DOTA_dataset.py:11-32; names use '-' for spaces)."""
    root = tmp_path_factory.mktemp("dota")
    os.makedirs(root / "images")
    os.makedirs(root / "annfiles")
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(0, 255, (200, 200, 3)).astype(np.uint8)
        cv2.imwrite(str(root / "images" / f"P{i:04d}.png"), img)
        with open(root / "annfiles" / f"P{i:04d}.txt", "w") as f:
            f.write(_poly_line(60, 60, 30, 50) + " plane\n")
            f.write(_poly_line(140, 120, 20, 44) + " small-vehicle\n")
    return str(root)


@pytest.fixture(scope="module")
def ucas_tree(tmp_path_factory):
    """UCAS-AOD layout: flat *.png + *.txt with tab-separated
    'name\\tx1..y4[...]' rows (datasets/UCASAOD_dataset.py:20-34)."""
    root = tmp_path_factory.mktemp("ucas")
    rng = np.random.default_rng(1)
    for i in range(3):
        img = rng.integers(0, 255, (160, 160, 3)).astype(np.uint8)
        cv2.imwrite(str(root / f"img{i}.png"), img)
        poly = _poly_line(80, 70, 24, 40).replace(" ", "\t")
        with open(root / f"img{i}.txt", "w") as f:
            f.write(f"car\t{poly}\textra\tcols\n")
    return str(root)


class TestDOTA:
    def test_parse_and_sample(self, dota_tree):
        ds = DOTADataset(dota_tree, DOTA_NAMES, HYP, img_size=128,
                         augment=False, csl=True)
        assert len(ds) == 3
        _, img, labels = ds.get_sample(0, np.random.default_rng(0))
        assert img.shape == (128, 128, 3)
        assert labels.shape == (2, 187)
        # class-name mapping with space->dash normalization
        assert set(labels[:, 1].astype(int)) == {0, 1}
        # box geometry survives letterbox: plane box is 30x50 at (60,60)
        # in a 200->128 resize: w=30*0.64=19.2/128, h=50*0.64=32/128
        row = labels[labels[:, 1] == 0][0]
        assert row[4] * 128 == pytest.approx(19.2, abs=0.5)
        assert row[5] * 128 == pytest.approx(32.0, abs=0.5)

    def test_loader_end_to_end(self, dota_tree):
        _, loader = load_data(dota_tree, DOTA_NAMES, "DOTA", HYP, csl=True,
                              img_size=128, batch_size=3, augment=True,
                              shuffle=False, max_targets=32)
        b = next(iter(loader))
        assert b["images"].shape == (3, 128, 128, 3)
        assert b["tgt_mask"].any()


class TestUCAS:
    def test_parse_and_sample(self, ucas_tree):
        ds = UCASAODDataset(ucas_tree, ["car", "airplane"], HYP,
                            img_size=96, augment=False, csl=False)
        assert len(ds) == 3
        _, img, labels = ds.get_sample(1, np.random.default_rng(0))
        assert img.shape == (96, 96, 3)
        assert labels.shape == (1, 7)
        assert labels[0, 1] == 0  # car
        # long-side-h convention: h >= w
        assert labels[0, 5] >= labels[0, 4]
