"""Integration test for the full evaluate() loop (model -> mAP numbers)."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ryolo_tpu.eval.evaluator import evaluate, padded_targets_to_rows
from ryolo_tpu.geometry import csl_gaussian_labels_np
from ryolo_tpu.losses import csl_loss
from ryolo_tpu.nn import Yolo
from ryolo_tpu.nn.yolo import STRIDES, make_anchors

CFG = {
    "anchors": [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
                [142, 110, 192, 243, 459, 401]],
    "angles": [-90, -60, -30, 0, 30, 60],
}
HYP = {"box": 0.05, "obj": 1.0, "cls": 0.5, "obj_pw": 1.0, "cls_pw": 1.0,
       "fl_gamma": 0.0,
       "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4, "rotate": 45,
       "translate": 0.1, "scale": 0.5, "flipud": 0.5, "fliplr": 0.5,
       "mosaic": 1.0, "mixup": 0.15}


def test_padded_targets_to_rows():
    tgt = np.zeros((2, 3, 6), np.float32)
    mask = np.zeros((2, 3), bool)
    tgt[0, 0] = [1, 0.5, 0.25, 0.1, 0.2, 0.3]
    tgt[1, 0] = [0, 0.1, 0.9, 0.05, 0.1, -1.0]
    tgt[1, 1] = [1, 0.3, 0.3, 0.2, 0.4, 0.5]
    mask[0, 0] = mask[1, 0] = mask[1, 1] = True
    rows = padded_targets_to_rows(tgt, mask, 128)
    assert rows.shape == (3, 7)
    np.testing.assert_allclose(rows[0], [0, 1, 64, 32, 12.8, 25.6, 0.3],
                               rtol=1e-5)
    assert (rows[1:, 0] == 1).all()


def test_evaluate_end_to_end(tmp_path):
    sys.path.insert(0, os.path.dirname(__file__))
    from make_synth_data import main

    root = str(tmp_path / "synth")
    main(root, n_images=4, img_size=96, seed=3)

    nc = 2
    model = Yolo(n_classes=nc, model_config=CFG, mode="csl", ver="yolov5")
    variables = dict(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    )
    anchors = make_anchors(STRIDES, CFG["anchors"])

    def loss_fn(outputs, batch):
        return csl_loss(outputs, jnp.asarray(batch["tgt"]),
                        jnp.asarray(batch["tgt_csl"]),
                        jnp.asarray(batch["tgt_mask"]), anchors, nc, HYP)

    data = {"val": f"{root}/val", "names": ["a", "b"], "type": "custom"}
    mp, mr, map50, map5095, losses = evaluate(
        model, variables, loss_fn, data, HYP, True, 96, 2,
        conf_thres=0.001, iou_thres=0.65, max_targets=32, progress=False,
    )
    # untrained model: metrics near zero but well-defined; losses finite
    for v in (mp, mr, map50, map5095):
        assert 0.0 <= float(v) <= 1.0
    assert losses and all(np.isfinite(v) for v in losses.values())
    assert map5095 <= map50 + 1e-9
