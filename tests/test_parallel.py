"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4f)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from ryolo_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


def test_mesh_shapes():
    mesh = make_mesh(8, sp=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("dp", "sp")


def test_shard_batch_places_data():
    mesh = make_mesh(8, sp=2)
    batch = {
        "images": np.zeros((8, 64, 64, 3), np.float32),
        "tgt": np.zeros((8, 4, 6), np.float32),
        "tgt_mask": np.zeros((8, 4), bool),
        "paths": ["x"] * 8,
    }
    out = shard_batch(batch, mesh)
    assert "paths" not in out
    assert out["images"].sharding.spec == P("dp", "sp", None, None)
    assert out["tgt"].sharding.spec == P("dp")


def test_data_parallel_gradient_allreduce():
    """Replicated-params grad over a dp-sharded batch == single-device grad."""
    mesh = make_mesh(8, sp=1)

    w = jnp.ones((16, 16))
    x = np.random.default_rng(0).normal(size=(8, 16)).astype(np.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_single = jax.grad(loss)(w, jnp.asarray(x))

    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
    ws = jax.device_put(w, replicate(mesh))
    g_sharded = jax.jit(jax.grad(loss))(ws, xs)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-5)


def test_full_train_step_dryrun():
    """The driver's dryrun_multichip contract on the 8-device CPU mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles_single_device():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn).lower(*args)  # compile-check only (abstract lowering)
    assert out is not None


def test_sharded_evaluate_matches_single_device(tmp_path):
    """evaluate(mesh=...) on the 8-device mesh == single-device numbers."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from make_synth_data import main

    from ryolo_tpu.eval.evaluator import evaluate
    from ryolo_tpu.losses import csl_loss
    from ryolo_tpu.nn import Yolo
    from ryolo_tpu.nn.yolo import STRIDES, make_anchors

    CFG = {
        "anchors": [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
                    [142, 110, 192, 243, 459, 401]],
        "angles": [-90, -60, -30, 0, 30, 60],
    }
    HYP = {"box": 0.05, "obj": 1.0, "cls": 0.5, "obj_pw": 1.0, "cls_pw": 1.0,
           "fl_gamma": 0.0, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
           "rotate": 45, "translate": 0.1, "scale": 0.5, "flipud": 0.5,
           "fliplr": 0.5, "mosaic": 1.0, "mixup": 0.15}

    root = str(tmp_path / "synth")
    main(root, n_images=6, img_size=96, seed=5)  # 6 images, batch 4 -> pad

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
    kw = dict(conf_thres=0.001, iou_thres=0.65, max_targets=32,
              progress=False)

    single = evaluate(model, variables, loss_fn, data, HYP, True, 96, 4, **kw)
    mesh = make_mesh(4, sp=1)
    sharded = evaluate(model, variables, loss_fn, data, HYP, True, 96, 4,
                       mesh=mesh, **kw)

    for s, m in zip(single[:4], sharded[:4]):
        np.testing.assert_allclose(float(s), float(m), atol=1e-5)
    for k in single[4]:
        np.testing.assert_allclose(single[4][k], sharded[4][k], atol=1e-4)


def test_sharded_evaluate_rejects_bad_batch():
    from ryolo_tpu.eval.evaluator import evaluate
    from ryolo_tpu.nn import Yolo

    mesh = make_mesh(8, sp=1)
    model = Yolo(n_classes=2, model_config={
        "anchors": [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
                    [142, 110, 192, 243, 459, 401]],
        "angles": [-90, -60, -30, 0, 30, 60]}, mode="csl", ver="yolov5")
    with pytest.raises(ValueError, match="not divisible"):
        evaluate(model, {}, None, {"val": "/nonexistent", "names": ["a"],
                                   "type": "custom"},
                 {}, True, 96, 3, conf_thres=0.001, iou_thres=0.65, mesh=mesh)
