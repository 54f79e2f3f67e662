"""Full-pipeline detection parity: reference torch stack vs ryolo_tpu.

The BASELINE north star asks for detections within 1e-3 skew-IoU of the
PyTorch reference.  Without released pretrained weights this is checked on
shared random weights: the reference model + reference post_process (with
the oracle-verified native NMS as the detectron2 stub) against our jitted
forward + fixed-shape post-process, end to end on the same image batch —
across all three backbone versions, both head modes, up to 416px, and
through the deploy-fused inference graph.

BN running stats are calibrated with a few train-mode batches first so
eval-mode activations stay in the sigmoids' linear range — random-weight
saturation produced whole groups of bitwise-tied confidences in round 1,
which greedy NMS orders arbitrarily; calibrated weights make detections
(near-)unique so the parity bar can be strict.
"""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from ryolo_tpu.ops.native import nms_rotated_native  # noqa: E402

MODEL_CFG = {
    "anchors": [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
                [142, 110, 192, 243, 459, 401]],
    "angles": [-90, -60, -30, 0, 30, 60],
}
NC = 3


def _ref_modules():
    def nms_stub(rboxes, scores, thr):
        keep = nms_rotated_native(rboxes.numpy(), scores.numpy(), float(thr))
        return torch.from_numpy(keep)

    for name in ("detectron2", "detectron2.layers",
                 "detectron2.layers.rotated_boxes"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["detectron2.layers.rotated_boxes"].pairwise_iou_rotated = None
    nms_mod = types.ModuleType("detectron2.layers.nms")
    nms_mod.nms_rotated = nms_stub
    sys.modules["detectron2.layers.nms"] = nms_mod
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    sys.modules.pop("lib.general", None)
    import lib.general as ref_general
    from model.yolo import Yolo as RefYolo

    return RefYolo, ref_general


def _calibrated_ref_model(mode, ver, img, seed=7):
    """Reference model with BN stats adapted to the test input statistics."""
    RefYolo, ref_general = _ref_modules()
    torch.manual_seed(seed)
    ref_model = RefYolo(NC, MODEL_CFG, mode, ver)
    ref_model.train()
    rng = np.random.default_rng(99)
    with torch.no_grad():
        for _ in range(4):
            cal = rng.uniform(0, 1, (2, 3, img, img)).astype(np.float32)
            ref_model(torch.tensor(cal), training=True)
    ref_model.eval()
    return ref_model, ref_general


def _gap_threshold(ref_dec, lo=20, hi=150):
    """Confidence threshold at the widest gap among the top candidates.

    A fixed 0.25 lands in the dense bulk of a random-weight confidence
    distribution, so f32 rounding across frameworks flips threshold
    decisions.  Thresholding mid-gap makes the candidate SET identical
    unless the two stacks disagree by more than half the gap.
    """
    conf = (ref_dec[..., 5] * ref_dec[..., 6:].max(dim=-1).values)
    top = conf.flatten().sort(descending=True).values[:hi + 1].numpy()
    gaps = top[lo:hi] - top[lo + 1:hi + 1]
    k = lo + int(np.argmax(gaps))
    return float((top[k] + top[k + 1]) / 2)


def _run_pair(mode, ver, img, deploy, iou=0.4):
    from ryolo_tpu.eval.postprocess import post_process
    from ryolo_tpu.nn import Yolo, fuse_for_inference
    from ryolo_tpu.utils.checkpoint import import_state_dict

    ref_model, ref_general = _calibrated_ref_model(mode, ver, img)

    rng = np.random.default_rng(3)
    imgs = rng.uniform(0, 1, (2, 3, img, img)).astype(np.float32)
    with torch.no_grad():
        _, ref_dec = ref_model(torch.tensor(imgs), training=False)
        conf = _gap_threshold(ref_dec)
        ref_dets = ref_general.post_process(ref_dec.clone(), conf_thres=conf,
                                            iou_thres=iou)

    model = Yolo(n_classes=NC, model_config=MODEL_CFG, mode=mode, ver=ver)
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)), train=False))
    variables, _ = import_state_dict(ref_model.state_dict(), variables)
    if deploy:
        model, variables = fuse_for_inference(model, variables)
    _, dec = model.apply(variables, jnp.asarray(imgs.transpose(0, 2, 3, 1)),
                         train=False, decode=True)
    dets = post_process(np.asarray(dec), conf_thres=conf, iou_thres=iou)
    return dets, [d.numpy() for d in ref_dets], np.asarray(dec)


def _assert_detections_match(dets, ref_dets, dec_np, max_count_slack,
                             round_dp=3):
    assert len(dets) == len(ref_dets)
    total = 0
    for b, (got, want) in enumerate(zip(dets, ref_dets)):
        total += len(got)
        assert abs(len(got) - len(want)) <= max_count_slack, (
            len(got), len(want))
        # conf values occurring more than once in this image's candidates:
        # greedy NMS on exact ties is order-dependent, both outcomes valid
        cand_conf = dec_np[b][:, 5] * dec_np[b][:, 6:].max(-1)
        u, c = np.unique(cand_conf.astype(np.float32), return_counts=True)
        tied = set(u[c > 1].tolist())

        g_rows = {tuple(np.round(r, round_dp)) for r in got}
        w_rows = {tuple(np.round(r, round_dp)) for r in want}
        for row in g_rows ^ w_rows:
            assert np.float32(row[5]) in tied or any(
                abs(t - row[5]) < 10.0 ** -round_dp for t in tied
            ), f"non-tied detection disagrees: {row}"
    assert total > 0, "test vacuous: no detections above threshold"


def _assert_detections_match_skewiou(dets, ref_dets, dec_np,
                                     max_count_slack, iou_slack=1e-3,
                                     conf_tol=1e-3):
    """The BASELINE bar measured directly: every (non-tied) detection must
    have a same-class partner within ``iou_slack`` of perfect skew-IoU and
    matching confidence — instead of rounding rows to N decimals."""
    from ryolo_tpu.ops.native import pairwise_rotated_iou_native

    assert len(dets) == len(ref_dets)
    total = 0
    for b, (got, want) in enumerate(zip(dets, ref_dets)):
        total += len(got)
        assert abs(len(got) - len(want)) <= max_count_slack, (
            len(got), len(want))
        cand_conf = dec_np[b][:, 5] * dec_np[b][:, 6:].max(-1)
        u, c = np.unique(cand_conf.astype(np.float32), return_counts=True)
        tied = set(u[c > 1].tolist())

        def to_deg(rows):
            out = rows[:, :5].astype(np.float64).copy()
            out[:, 4] *= 180.0 / np.pi
            return out.astype(np.float32)

        if len(got) and len(want):
            iou = pairwise_rotated_iou_native(to_deg(got), to_deg(want))
        else:
            iou = np.zeros((len(got), len(want)))
        for i, row in enumerate(got):
            ok = False
            for j, wrow in enumerate(want):
                if (iou[i, j] >= 1.0 - iou_slack
                        and row[6] == wrow[6]
                        and abs(row[5] - wrow[5]) <= conf_tol):
                    ok = True
                    break
            is_tied = np.float32(row[5]) in tied or any(
                abs(t - row[5]) < conf_tol for t in tied)
            assert ok or is_tied, (
                f"detection without a skew-IoU>={1 - iou_slack} partner: "
                f"{row}")
    assert total > 0, "test vacuous: no detections above threshold"


@pytest.mark.parametrize("ver,mode,img,deploy", [
    ("yolov5", "csl", 96, False),
    ("yolov5", "kfiou", 96, False),
    ("yolov4", "csl", 128, False),
    ("yolov7", "csl", 128, True),   # through the deploy-fused graph
    ("yolov7", "kfiou", 128, False),
])
def test_detections_match_reference(ver, mode, img, deploy):
    dets, ref_dets, dec_np = _run_pair(mode, ver, img, deploy)
    # calibrated BN keeps confidences unsaturated: at most 1 tie-flip
    if deploy:
        # fused graph: exact linear algebra, measured against the BASELINE
        # bar directly (skew-IoU within 1e-3 of a reference detection)
        _assert_detections_match_skewiou(dets, ref_dets, dec_np,
                                         max_count_slack=1)
    else:
        _assert_detections_match(dets, ref_dets, dec_np, max_count_slack=1,
                                 round_dp=3)


@pytest.mark.slow
def test_detections_match_reference_416():
    """The BASELINE config-1 image size (416px, yolov5+CSL)."""
    dets, ref_dets, dec_np = _run_pair("csl", "yolov5", 416, False)
    _assert_detections_match(dets, ref_dets, dec_np, max_count_slack=1)
