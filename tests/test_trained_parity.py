"""Trained-checkpoint cross-framework mAP parity (BASELINE ±0.5 bar).

Overfits yolov5-CSL on the synthetic dataset, exports the ordered ``.pth``,
then runs BOTH eval stacks on the same val split with the reference protocol
(conf 0.001, NMS-IoU 0.65, mAP@.5:.95 over 10 thresholds,
``/root/reference/test.py:167-222``):

  * reference torch: ``model.yolo`` forward + ``lib.general.post_process`` +
    ``test.get_batch_statistics`` / ``calculate_eval_stats`` — detectron2
    stubbed with the oracle-verified native C++ kernels;
  * ours: ``ryolo_tpu.eval.evaluator.evaluate`` end to end.

Asserts mAP@.5 and mAP@.5:.95 agree within ±0.005 (±0.5 points) on weights
that actually detect (mAP@.5 > 0.5 for CSL; a sanity floor for KFIoU,
whose anchor-angle-quantized inference decode plus chaotic tiny-overfit
endpoints make a hard quality floor untenable — see the floor comment in
the test body), for BOTH angle strategies (the KFIoU case additionally
pins the 18-rotated-anchor decode and its train/infer asymmetry end to
end through trained weights).
"""

import importlib.util
import logging
import os
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

from ryolo_tpu.ops.native import (  # noqa: E402
    nms_rotated_native,
    pairwise_rotated_iou_native,
)

MODEL_CFG = {
    "anchors": [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
                [142, 110, 192, 243, 459, 401]],
    "angles": [-90, -60, -30, 0, 30, 60],
}
HYP = {"box": 0.05, "obj": 1.0, "cls": 0.5, "obj_pw": 1.0, "cls_pw": 1.0,
       "fl_gamma": 0.0, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
       "rotate": 45, "translate": 0.1, "scale": 0.5, "flipud": 0.5,
       "fliplr": 0.5, "mosaic": 1.0, "mixup": 0.15}
NC = 2
IMG = 96


def _ref_test_module():
    """Import /root/reference/test.py with its CUDA/colorlog deps stubbed."""
    if "colorlog" not in sys.modules:
        colorlog = types.ModuleType("colorlog")

        class _Fmt(logging.Formatter):
            def __init__(self, fmt=None, *a, **k):
                super().__init__()

        colorlog.ColoredFormatter = _Fmt
        sys.modules["colorlog"] = colorlog

    def nms_stub(rboxes, scores, thr):
        keep = nms_rotated_native(rboxes.numpy(), scores.numpy(), float(thr))
        return torch.from_numpy(keep)

    def pairwise_stub(b1, b2):
        return torch.from_numpy(
            pairwise_rotated_iou_native(b1.numpy(), b2.numpy())
        )

    for name in ("detectron2", "detectron2.layers"):
        sys.modules.setdefault(name, types.ModuleType(name))
    nms_mod = types.ModuleType("detectron2.layers.nms")
    nms_mod.nms_rotated = nms_stub
    sys.modules["detectron2.layers.nms"] = nms_mod
    rb_mod = types.ModuleType("detectron2.layers.rotated_boxes")
    rb_mod.pairwise_iou_rotated = pairwise_stub
    sys.modules["detectron2.layers.rotated_boxes"] = rb_mod

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    sys.modules.pop("lib.general", None)
    # The reference's dataloader pulls in its `datasets/` dir, which is a
    # namespace package and loses the import race to the installed
    # HuggingFace `datasets`.  This test feeds images by hand, so stub the
    # loader module (test.py only does `from lib.load import load_data`).
    import lib  # noqa: F401 -- ensure the real reference package is bound

    load_stub = types.ModuleType("lib.load")
    load_stub.load_data = None
    sys.modules["lib.load"] = load_stub
    spec = importlib.util.spec_from_file_location(
        "ref_test", "/root/reference/test.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _read_val_split(root):
    return _read_val_split_dir(os.path.join(root, "val"))


def _read_val_split_dir(val):
    """Load a split dir's images (RGB float CHW, the reference's tensor
    convention, ``datasets/base_dataset.py:155-157``) + pixel-space target
    rows."""
    names = sorted(f for f in os.listdir(val) if f.endswith(".png"))
    imgs, rows = [], []
    for idx, fname in enumerate(names):
        bgr = cv2.imread(os.path.join(val, fname))
        imgs.append(bgr[..., ::-1].transpose(2, 0, 1).astype(np.float32) / 255)
        labels = np.loadtxt(os.path.join(val, fname[:-4] + ".txt"),
                            ndmin=2)  # cx cy w h theta cls (pixels)
        for cx, cy, w, h, th, cls in labels:
            rows.append([idx, cls, cx, cy, w, h, th])
    return np.stack(imgs), np.asarray(rows, np.float32)


def _train_overfit(root, steps=None, mode="csl"):
    import math

    from ryolo_tpu.data.loader import load_data
    from ryolo_tpu.losses import csl_loss, kfiou_loss
    from ryolo_tpu.nn import Yolo
    from ryolo_tpu.nn.yolo import (
        STRIDES,
        make_anchors,
        make_rotated_anchors,
    )
    from ryolo_tpu.train.trainer import Trainer, weights_init_normal

    model = Yolo(n_classes=NC, model_config=MODEL_CFG, mode=mode,
                 ver="yolov5")
    if mode == "csl":
        anchors = make_anchors(STRIDES, MODEL_CFG["anchors"])

        def loss_fn(outputs, b):
            return csl_loss(outputs, b["tgt"], b["tgt_csl"], b["tgt_mask"],
                            anchors, NC, HYP)
    else:
        angles = [a * math.pi / 180 for a in MODEL_CFG["angles"]]
        anchors = make_rotated_anchors(STRIDES, MODEL_CFG["anchors"], angles)

        def loss_fn(outputs, b):
            return kfiou_loss(outputs, b["tgt"], b["tgt_mask"], anchors, NC,
                              HYP)

    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)), train=False))
    variables["params"] = weights_init_normal(variables["params"],
                                              jax.random.PRNGKey(1))
    trainer = Trainer(model, loss_fn, "Adam", 2e-3)
    state = trainer.init_state(variables)

    _, loader = load_data(os.path.join(root, "train"), ["a", "b"], "custom",
                          HYP, csl=(mode == "csl"), img_size=IMG,
                          batch_size=4, augment=False, shuffle=True,
                          max_targets=16)
    # KFIoU wanders under a constant lr once the loss plateaus (measured
    # mAP@.5 swings 0.10-0.41 across step counts); a 10x decay after step
    # 400 pins the endpoint in the 0.32-0.40 band.  CSL converges fine on
    # the constant schedule.
    if steps is None:
        steps = 520 if mode == "csl" else 900
    step = 0
    losses = []
    while step < steps:
        for batch in loader:
            if step >= steps:
                break
            arrays = {k: jnp.asarray(np.asarray(v))
                      for k, v in batch.items() if k != "paths"}
            base = 2e-3 if (mode == "csl" or step < 400) else 2e-4
            lr = base * min(1.0, (step + 1) / 50)
            state, loss, _ = trainer.train_step(state, arrays,
                                                jnp.float32(lr), jnp.int32(1))
            losses.append(float(loss))
            step += 1
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < 0.5 * np.mean(losses[:10])
    return model, {"params": state.params, "batch_stats": state.batch_stats}


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["csl", "kfiou"])
def test_trained_checkpoint_map_parity(tmp_path, mode):
    sys.path.insert(0, os.path.dirname(__file__))
    from make_synth_data import main as make_synth

    from ryolo_tpu.eval.evaluator import evaluate
    from ryolo_tpu.nn import fuse_for_inference
    from ryolo_tpu.utils.checkpoint import save_pth

    root = str(tmp_path / "synth")
    # larger, squarer boxes: skew-IoU@.5 on thin rotated rectangles is
    # angle-hypersensitive, which tests the matcher, not the training loop
    make_synth(root, n_images=8, img_size=IMG, seed=11,
               w_range=(0.18, 0.28), ratio=(1.2, 1.6))

    model, variables = _train_overfit(root, mode=mode)
    pth = str(tmp_path / "trained.pth")
    save_pth(variables, "yolov5", pth)

    # ---- ours: full evaluator (deploy-fused, the production eval path)
    data = {"val": os.path.join(root, "val"), "names": ["a", "b"],
            "type": "custom"}
    dep_model, dep_vars = fuse_for_inference(model, variables)
    _, _, map50, map5095, _ = evaluate(
        dep_model, dep_vars, None, data, HYP, mode == "csl", IMG, 4,
        conf_thres=0.001, iou_thres=0.65, max_targets=32, progress=False,
    )

    # ---- reference: torch model + reference eval protocol on the same split
    ref_test = _ref_test_module()
    from model.yolo import Yolo as RefYolo

    ref_model = RefYolo(NC, MODEL_CFG, mode, "yolov5")
    ref_model.load_state_dict(
        torch.load(pth, map_location="cpu", weights_only=False)
    )
    ref_model.eval()

    imgs, target_rows = _read_val_split(root)
    iouv = torch.linspace(0.5, 0.95, 10)
    stats = []
    with torch.no_grad():
        for i in range(0, len(imgs), 4):
            chunk = torch.from_numpy(imgs[i:i + 4])
            _, infer = ref_model(chunk, training=False)
            outputs = ref_test.post_process(infer, conf_thres=0.001,
                                            iou_thres=0.65)
            rows = target_rows[np.isin(target_rows[:, 0],
                                       np.arange(i, i + 4))].copy()
            rows[:, 0] -= i
            stats += ref_test.get_batch_statistics(
                outputs, torch.from_numpy(rows), iouv, len(iouv)
            )
    stats = [np.concatenate(x, 0) for x in zip(*stats)]
    (_, _, _, _, _, _, _, _, _, ref_map50, ref_map5095
     ) = ref_test.calculate_eval_stats(stats, NC)

    # parity first (the BASELINE bar), quality floor second.  The KFIoU
    # floor is a sanity floor only: its inference decode takes theta from
    # the discrete anchor angle (30-degree quantization, heads.py KFIoU
    # branch == reference models/yolo.py KFIoU decode), which caps this
    # tiny overfit at ~0.4 mAP@.5 even when it converges well — and the
    # endpoint is chaotically sensitive to reduction-order numerics
    # (measured 0.05-0.41 across identical-seed runs that differ only in
    # XLA CPU virtual-device count).  The parity assertion above is the
    # actual cross-framework contract and holds at every endpoint; the
    # floor just rejects a model that detects nothing at all.
    assert abs(map50 - ref_map50) <= 5e-3, (map50, ref_map50)
    assert abs(map5095 - ref_map5095) <= 5e-3, (map5095, ref_map5095)
    floor = 0.5 if mode == "csl" else 0.02
    assert map50 > floor, f"model failed to learn (ours mAP@.5 = {map50})"

    if mode == "csl":
        # int8 deploy path on the SAME trained weights: mAP must stay
        # within the BASELINE ±0.5-point parity envelope of the f32 eval
        q_model, q_vars = fuse_for_inference(model, variables, quantize=True)
        _, _, q_map50, q_map5095, _ = evaluate(
            q_model, q_vars, None, data, HYP, True, IMG, 4,
            conf_thres=0.001, iou_thres=0.65, max_targets=32,
            progress=False,
        )
        assert abs(q_map50 - map50) <= 5e-3, (q_map50, map50)
        assert abs(q_map5095 - map5095) <= 1e-2, (q_map5095, map5095)


@pytest.mark.slow
def test_trained_parity_dota_density(tmp_path):
    """Cross-framework mAP parity at DOTA-like matching density.

    The ±0.5-mAP bar is only hard where matching is hard: crowded
    same-class targets make the reference's greedy max-IoU dedup
    (``/root/reference/test.py:130-144``) order-dependent, and any
    divergence in candidate ordering, NMS tie behavior, or the matcher's
    detected-set semantics shows up as a mAP gap.  Trains the usual tiny
    CSL overfit, then evaluates BOTH frameworks on a DENSE val split —
    ≥60 crowded targets per image at the trained object scale — and
    asserts the two eval stacks still agree within the BASELINE gate
    (VERDICT r3 item 7).
    """
    sys.path.insert(0, os.path.dirname(__file__))
    from make_synth_data import main as make_synth, make_split

    from ryolo_tpu.eval.evaluator import evaluate
    from ryolo_tpu.nn import fuse_for_inference
    from ryolo_tpu.utils.checkpoint import save_pth

    root = str(tmp_path / "synth")
    make_synth(root, n_images=8, img_size=IMG, seed=11,
               w_range=(0.18, 0.28), ratio=(1.2, 1.6))
    model, variables = _train_overfit(root, mode="csl")
    pth = str(tmp_path / "trained.pth")
    save_pth(variables, "yolov5", pth)

    # Dense split at 2x resolution, SAME object pixel size as training
    # (0.09-0.14 × 192 px ≈ 0.18-0.28 × 96 px): the detector fires on
    # dozens of crowded instances per scene.
    dense_img = IMG * 2
    dense_dir = str(tmp_path / "dense_val")
    rng = np.random.default_rng(23)
    make_split(dense_dir, n_images=4, img_size=dense_img, rng=rng,
               w_range=(0.09, 0.14), ratio=(1.2, 1.6), min_obj=60,
               max_obj=81)

    imgs, target_rows = _read_val_split_dir(dense_dir)
    per_image = np.bincount(target_rows[:, 0].astype(int), minlength=4)
    assert per_image.min() >= 60, per_image  # the density this test is about

    data = {"val": dense_dir, "names": ["a", "b"], "type": "custom"}
    dep_model, dep_vars = fuse_for_inference(model, variables)
    _, _, map50, map5095, _ = evaluate(
        dep_model, dep_vars, None, data, HYP, True, dense_img, 2,
        conf_thres=0.001, iou_thres=0.65, max_targets=96, progress=False,
    )

    ref_test = _ref_test_module()
    from model.yolo import Yolo as RefYolo

    ref_model = RefYolo(NC, MODEL_CFG, "csl", "yolov5")
    ref_model.load_state_dict(
        torch.load(pth, map_location="cpu", weights_only=False)
    )
    ref_model.eval()

    iouv = torch.linspace(0.5, 0.95, 10)
    stats = []
    n_det = 0
    with torch.no_grad():
        for i in range(0, len(imgs), 2):
            chunk = torch.from_numpy(imgs[i:i + 2])
            _, infer = ref_model(chunk, training=False)
            outputs = ref_test.post_process(infer, conf_thres=0.001,
                                            iou_thres=0.65)
            n_det += sum(0 if o is None else len(o) for o in outputs)
            rows = target_rows[np.isin(target_rows[:, 0],
                                       np.arange(i, i + 2))].copy()
            rows[:, 0] -= i
            stats += ref_test.get_batch_statistics(
                outputs, torch.from_numpy(rows), iouv, len(iouv)
            )
    stats = [np.concatenate(x, 0) for x in zip(*stats)]
    (_, _, _, _, _, _, _, _, _, ref_map50, ref_map5095
     ) = ref_test.calculate_eval_stats(stats, NC)

    # the matcher must have real work: many detections over many targets
    assert n_det >= 100, n_det
    assert abs(map50 - ref_map50) <= 5e-3, (map50, ref_map50)
    assert abs(map5095 - ref_map5095) <= 5e-3, (map5095, ref_map5095)
