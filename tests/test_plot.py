"""Pixel-for-pixel parity of the drawing utilities vs the reference."""

import sys
import types

import cv2
import numpy as np
import pytest

from ryolo_tpu.utils.plot import class_color, get_color, plot_boxes, \
    rescale_boxes


def _reference_plot():
    pytest.importorskip("torch")
    for name in ("detectron2", "detectron2.layers", "detectron2.layers.nms"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["detectron2.layers.nms"].nms_rotated = None
    if "/root/reference" in sys.path:
        sys.path.remove("/root/reference")
    sys.path.insert(0, "/root/reference")
    for name in list(sys.modules):
        if name.split(".")[0] == "lib":
            sys.modules.pop(name)
    import lib.plot as ref_plot

    return ref_plot


def _random_dets(rng, n, img_size, nc):
    out = np.zeros((n, 7))
    out[:, 0:2] = rng.uniform(img_size * 0.2, img_size * 0.8, (n, 2))
    out[:, 2:4] = rng.uniform(10, 80, (n, 2))
    out[:, 4] = rng.uniform(-np.pi / 2, np.pi / 2, n)
    out[:, 5] = rng.uniform(0.3, 1.0, n)
    out[:, 6] = rng.integers(0, nc, n)
    return out


@pytest.mark.parametrize("shape", [(480, 640), (640, 480), (333, 333)])
def test_rescale_boxes_matches_reference(shape):
    ref = _reference_plot()
    rng = np.random.default_rng(0)
    boxes = _random_dets(rng, 20, 416, 5)
    import torch

    got = rescale_boxes(boxes, 416, shape)
    want = ref.rescale_boxes(torch.from_numpy(boxes.copy()), 416,
                             shape).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)


def test_color_ramp_matches_reference():
    ref = _reference_plot()
    for nc in (1, 2, 15, 16):
        for cls_id in range(nc):
            off = cls_id * 93 % nc
            assert class_color(cls_id, nc) == tuple(
                ref.get_color(ch, off, nc) for ch in (2, 1, 0)
            )
            for ch in range(3):
                assert get_color(ch, off, nc) == ref.get_color(ch, off, nc)


def test_plot_boxes_pixel_parity(tmp_path):
    ref = _reference_plot()
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (300, 420, 3), np.uint8)
    src = str(tmp_path / "scene.png")
    cv2.imwrite(src, img)

    names = [f"c{i}" for i in range(15)]
    dets = _random_dets(rng, 12, 416, len(names))

    ours_dir = tmp_path / "ours"
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    import torch

    out = plot_boxes(src, dets.copy(), names, 416, str(ours_dir))
    ref.plot_boxes(src, torch.from_numpy(dets.astype(np.float32)), names,
                   416, str(ref_dir))

    got = cv2.imread(out)
    want = cv2.imread(str(ref_dir / "scene.png"))
    assert got.shape == want.shape
    # allow rare 1-px antialiasing divergence from float rounding in corner
    # coords; require overwhelming agreement
    mismatch = (got != want).any(axis=2).mean()
    assert mismatch < 0.001, f"pixel mismatch fraction {mismatch}"
