"""Full-pipeline detection parity: reference torch stack vs ryolo_tpu.

The BASELINE north star asks for detections within 1e-3 skew-IoU of the
PyTorch reference.  Without released pretrained weights this is checked on
shared random weights: the reference model + reference post_process (with
the oracle-verified native NMS as the detectron2 stub) against our jitted
forward + fixed-shape post-process, end to end on the same image batch.
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


@pytest.mark.parametrize("mode", ["csl", "kfiou"])
def test_detections_match_reference(mode):
    RefYolo, ref_general = _ref_modules()
    from ryolo_tpu.eval.postprocess import post_process
    from ryolo_tpu.nn import Yolo
    from ryolo_tpu.utils.checkpoint import import_state_dict

    torch.manual_seed(7)
    ref_model = RefYolo(NC, MODEL_CFG, mode, "yolov5")
    ref_model.eval()

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (2, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        _, ref_dec = ref_model(torch.tensor(img), training=False)
        ref_dets = ref_general.post_process(ref_dec.clone(), conf_thres=0.25,
                                            iou_thres=0.4)

    model = Yolo(n_classes=NC, model_config=MODEL_CFG, mode=mode, ver="yolov5")
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)), train=False))
    variables, _ = import_state_dict(ref_model.state_dict(), variables)
    _, dec = model.apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
                         train=False, decode=True)
    dets = post_process(np.asarray(dec), conf_thres=0.25, iou_thres=0.4)

    # Random weights produce groups of bitwise-identical confidences (dozens
    # of saturated cells decode interchangeable boxes), and greedy NMS on
    # exact ties is order-dependent — both outcomes are equally valid.  The
    # precise parity claim: every disagreement is attributable to a conf
    # tie; all non-tied detections must match exactly.
    assert len(dets) == len(ref_dets)
    total = 0
    dec_np = np.asarray(dec)
    for b, (got, want) in enumerate(zip(dets, ref_dets)):
        want = want.numpy()
        total += len(got)
        assert abs(len(got) - len(want)) <= max(3, 0.05 * len(want)), (
            len(got), len(want))
        # conf values occurring more than once in this image's candidates
        cand_conf = dec_np[b][:, 5] * dec_np[b][:, 6:].max(-1)
        u, c = np.unique(cand_conf.astype(np.float32), return_counts=True)
        tied = set(u[c > 1].tolist())

        g_rows = {tuple(np.round(r, 3)) for r in got}
        w_rows = {tuple(np.round(r, 3)) for r in want}
        for row in g_rows ^ w_rows:
            assert np.float32(row[5]) in tied or any(
                abs(t - row[5]) < 1e-3 for t in tied
            ), f"non-tied detection disagrees: {row}"
    assert total > 0, "test vacuous: no detections above threshold"
