"""post_process parity vs the reference implementation.

Runs the reference's ``lib/general.py:post_process`` with our *native C++
NMS* injected as the detectron2 stub (itself oracle-verified in
test_native_ops), and checks the fixed-shape batched TPU post-process
produces identical detections — covering the conf-product, max-class,
threshold, sort, class-offset, rad→deg, and cap semantics
(``lib/general.py:136-183``).
"""

import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from ryolo_tpu.ops.native import nms_rotated_native  # noqa: E402


def _install_ref(monkeypatch=None):
    def nms_stub(rboxes, scores, thr):
        keep = nms_rotated_native(rboxes.numpy(), scores.numpy(), float(thr))
        return torch.from_numpy(keep)

    d2 = types.ModuleType("detectron2")
    layers = types.ModuleType("detectron2.layers")
    nms_mod = types.ModuleType("detectron2.layers.nms")
    nms_mod.nms_rotated = nms_stub
    rb = types.ModuleType("detectron2.layers.rotated_boxes")
    rb.pairwise_iou_rotated = None
    sys.modules.update({
        "detectron2": d2, "detectron2.layers": layers,
        "detectron2.layers.nms": nms_mod,
        "detectron2.layers.rotated_boxes": rb,
    })
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # force re-import with the live stub
    sys.modules.pop("lib.general", None)
    import lib.general as ref_general

    return ref_general


def _rand_predictions(rng, B, N, nc):
    pred = np.zeros((B, N, nc + 6), np.float32)
    pred[..., 0:2] = rng.uniform(0, 400, (B, N, 2))
    pred[..., 2:4] = rng.uniform(4, 60, (B, N, 2))
    pred[..., 4] = rng.uniform(-np.pi / 2, np.pi / 2, (B, N))
    pred[..., 5] = rng.uniform(0, 1, (B, N)) ** 3  # sparse high conf
    pred[..., 6:] = rng.uniform(0, 1, (B, N, nc))
    return pred


@pytest.mark.parametrize("conf,iou,seed", [(0.5, 0.4, 0), (0.25, 0.65, 1),
                                           (0.9, 0.2, 2)])
def test_parity_with_reference(conf, iou, seed):
    ref_general = _install_ref()
    from ryolo_tpu.eval.postprocess import post_process

    rng = np.random.default_rng(seed)
    pred = _rand_predictions(rng, 2, 600, 3)

    ref_out = ref_general.post_process(
        torch.tensor(pred.copy()), conf_thres=conf, iou_thres=iou
    )
    ours = post_process(pred, conf_thres=conf, iou_thres=iou, max_nms=600,
                        max_det=600)

    assert len(ours) == len(ref_out)
    for got, want in zip(ours, ref_out):
        want = want.numpy()
        assert got.shape == want.shape, (got.shape, want.shape)
        if len(got):
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_empty_when_all_below_threshold():
    _install_ref()
    from ryolo_tpu.eval.postprocess import post_process

    pred = np.zeros((1, 100, 8), np.float32)
    pred[..., 2:4] = 10.0
    pred[..., 5] = 0.01
    pred[..., 6:] = 0.5
    out = post_process(pred, conf_thres=0.5, iou_thres=0.4)
    assert len(out) == 1 and out[0].shape == (0, 7)


def test_max_det_cap():
    _install_ref()
    from ryolo_tpu.eval.postprocess import post_process

    rng = np.random.default_rng(3)
    # many spread-out boxes, none suppress each other
    N = 64
    pred = np.zeros((1, N, 7), np.float32)
    pred[0, :, 0] = np.arange(N) * 500.0
    pred[0, :, 1] = 50.0
    pred[0, :, 2:4] = 10.0
    pred[0, :, 5] = rng.uniform(0.8, 1.0, N)
    pred[0, :, 6] = 1.0
    out = post_process(pred, conf_thres=0.5, iou_thres=0.4, max_nms=64,
                       max_det=10)
    assert out[0].shape == (10, 7)
    # kept are the top-10 by conf, descending
    assert (np.diff(out[0][:, 5]) <= 1e-6).all()


def test_small_count_fast_path_exact(monkeypatch):
    """The count-conditioned SMALL_K branch must equal the full-width
    post-process bit-for-bit whenever it fires (it only fires when every
    above-threshold candidate fits in the small width)."""
    import ryolo_tpu.eval.postprocess as pp

    rng = np.random.default_rng(11)
    B, N, nc = 2, 1500, 4
    pred = np.zeros((B, N, nc + 6), np.float32)
    pred[..., :2] = rng.uniform(0, 700, (B, N, 2))
    pred[..., 2:4] = rng.uniform(5, 80, (B, N, 2))
    pred[..., 4] = rng.uniform(-1.5, 1.5, (B, N))
    pred[..., 5] = rng.uniform(0, 1, (B, N)) ** 4   # ~100 rows above 0.5
    pred[..., 6:] = rng.uniform(0.5, 1, (B, N, nc))
    pred_j = jnp.asarray(pred)

    f = pp.post_process_fixed.__wrapped__  # eager: globals read per call
    kw = dict(max_nms=1200, max_det=100, use_topk=None)
    above = (np.max(pred[..., 6:] * pred[..., 5:6], -1) > 0.5).sum(1)
    assert (above < pp.SMALL_K).all() and pp.SMALL_K < 1200  # branch fires

    d_fast, v_fast = f(pred_j, 0.5, 0.4, **kw)
    monkeypatch.setattr(pp, "SMALL_K", 0)  # force the full-width branch
    d_full, v_full = f(pred_j, 0.5, 0.4, **kw)
    np.testing.assert_array_equal(np.asarray(v_fast), np.asarray(v_full))
    np.testing.assert_array_equal(np.asarray(d_fast), np.asarray(d_full))


def test_topk_and_sort_selection_identical():
    """The two candidate-selection strategies must agree bit-for-bit
    (same ordering contract: descending score, ties by candidate index)."""
    import jax.numpy as jnp

    from ryolo_tpu.eval.postprocess import post_process_fixed

    rng = np.random.default_rng(5)
    B, N, nc = 2, 2000, 3
    pred = np.zeros((B, N, nc + 6), np.float32)
    pred[..., :2] = rng.uniform(0, 600, (B, N, 2))
    pred[..., 2:4] = rng.uniform(5, 80, (B, N, 2))
    pred[..., 4] = rng.uniform(-1.5, 1.5, (B, N))
    pred[..., 5] = rng.uniform(0, 1, (B, N))
    # quantized class probs force plenty of exact score ties
    pred[..., 6:] = np.round(rng.uniform(0, 1, (B, N, nc)), 1)

    kw = dict(max_nms=500, max_det=100)
    d1, v1 = post_process_fixed(jnp.asarray(pred), 0.05, 0.4,
                                use_topk=False, **kw)
    d2, v2 = post_process_fixed(jnp.asarray(pred), 0.05, 0.4,
                                use_topk=True, **kw)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_deferred_theta_matches_full_decode():
    """decode='defer' + post_process_defer == decode=True + post_process_fixed.

    The deferred path resolves the CSL 180-bin theta argmax only for the
    top-k selected candidates (postprocess.deferred_theta); detections must
    be identical to the full-width decode at every confidence load,
    including the >SMALL_K count-conditioned branch.
    """
    import jax
    import jax.numpy as jnp

    from ryolo_tpu.eval.postprocess import (post_process_defer,
                                            post_process_fixed)
    from ryolo_tpu.nn import Yolo

    cfg = {"anchors": [[12, 16, 19, 36, 40, 28],
                       [36, 75, 76, 55, 72, 146],
                       [142, 110, 192, 243, 459, 401]],
           "angles": [-90, -60, -30, 0, 30, 60]}
    nc = 3
    model = Yolo(n_classes=nc, model_config=cfg, mode="csl", ver="yolov5")
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3)), train=False)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 96, 96, 3))

    _, dec = model.apply(variables, images, train=False, decode=True)
    _, (dec_nt, neck) = model.apply(variables, images, train=False,
                                    decode="defer")
    # the no-theta rows must agree everywhere except the theta column
    np.testing.assert_array_equal(np.asarray(dec_nt[..., :4]),
                                  np.asarray(dec[..., :4]))
    np.testing.assert_array_equal(np.asarray(dec_nt[..., 5:]),
                                  np.asarray(dec[..., 5:]))
    assert np.all(np.asarray(dec_nt[..., 4]) == 0.0)

    for conf in (0.2, 0.26):  # random init: scores ~0.25 -> wide and narrow
        d1, v1 = post_process_fixed(dec, conf, 0.4)
        d2, v2 = post_process_defer(dec_nt, neck, 3, nc, conf, 0.4)
        assert np.asarray(v1).sum() == np.asarray(v2).sum()
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        d1, d2 = np.asarray(d1), np.asarray(d2)
        # theta: same bin, but XLA fuses (bin-90)/180*pi differently in
        # the two graphs -> 1-ulp slack; everything else must be exact
        np.testing.assert_array_equal(d1[..., [0, 1, 2, 3, 5, 6]],
                                      d2[..., [0, 1, 2, 3, 5, 6]])
        np.testing.assert_allclose(d1[..., 4], d2[..., 4], atol=1e-6)


def test_deferred_kfiou_matches_full_decode():
    """kfiou decode='defer' + post_process_kfiou_defer == full decode path.

    The fully deferred KFIoU path computes only (conf, cls_id) full-width
    (heads.decode_kfiou_scores) and resolves x/y/w/h/theta for the top-k
    selected candidates (heads.deferred_kfiou_box); detections must match
    the full-width decode_kfiou + post_process_fixed at every confidence
    load, including the >SMALL_K count-conditioned branch.
    """
    import math

    import jax
    import jax.numpy as jnp

    from ryolo_tpu.eval.postprocess import (post_process_fixed,
                                            post_process_kfiou_defer)
    from ryolo_tpu.nn import Yolo
    from ryolo_tpu.nn.yolo import STRIDES, make_rotated_anchors

    cfg = {"anchors": [[12, 16, 19, 36, 40, 28],
                       [36, 75, 76, 55, 72, 146],
                       [142, 110, 192, 243, 459, 401]],
           "angles": [-90, -60, -30, 0, 30, 60]}
    nc = 3
    model = Yolo(n_classes=nc, model_config=cfg, mode="kfiou", ver="yolov5")
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3)), train=False)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 96, 96, 3))

    angles = [a * math.pi / 180 for a in cfg["angles"]]
    anchors = make_rotated_anchors(STRIDES, cfg["anchors"], angles)

    _, dec = model.apply(variables, images, train=False, decode=True)
    _, ((conf, cls_id), neck) = model.apply(variables, images, train=False,
                                            decode="defer")

    # full-width scores must equal the decoded-tensor score computation
    dec_np = np.asarray(dec)
    obj = dec_np[..., 5]
    cls_scores = dec_np[..., 6:] * obj[..., None]
    np.testing.assert_array_equal(np.asarray(conf),
                                  cls_scores.max(-1))
    np.testing.assert_array_equal(np.asarray(cls_id),
                                  cls_scores.argmax(-1))

    for thr in (0.2, 0.26):  # random init: scores ~0.25 -> wide and narrow
        d1, v1 = post_process_fixed(dec, thr, 0.4)
        d2, v2 = post_process_kfiou_defer((conf, cls_id), neck,
                                          len(anchors[0]), anchors, STRIDES,
                                          thr, 0.4)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        d1, d2 = np.asarray(d1), np.asarray(d2)
        # the two graphs fuse the decode arithmetic differently -> tiny
        # float slack on the box fields; scores/classes must be exact
        np.testing.assert_array_equal(d1[..., 5:], d2[..., 5:])
        np.testing.assert_allclose(d1[..., :5], d2[..., :5],
                                   rtol=0, atol=1e-4)
