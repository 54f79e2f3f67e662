"""Shape/jit tests for backbones × necks × heads (SURVEY.md §4d)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ryolo_tpu.nn import Yolo

MODEL_CFG = {
    "anchors": [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
                [142, 110, 192, 243, 459, 401]],
    "angles": [-90, -60, -30, 0, 30, 60],
}
NC = 2


def _build(ver, mode, img=64, batch=1):
    model = Yolo(n_classes=NC, model_config=MODEL_CFG, mode=mode, ver=ver)
    x = jnp.zeros((batch, img, img, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


@pytest.mark.parametrize("ver,mode", [
    ("yolov5", "csl"),
    ("yolov5", "kfiou"),
    ("yolov4", "csl"),
    ("yolov7", "csl"),
])
def test_forward_shapes(ver, mode):
    model, variables, x = _build(ver, mode)
    na = 3 if mode == "csl" else 18
    nf = (NC + 185) if mode == "csl" else (NC + 6)
    outs, dec = model.apply(variables, x, train=False, decode=True)
    assert len(outs) == 3
    for o, s in zip(outs, (8, 16, 32)):
        assert o.shape == (1, na, 64 // s, 64 // s, nf)
    total = sum(na * (64 // s) ** 2 for s in (8, 16, 32))
    assert dec.shape == (1, total, NC + 6)
    assert np.isfinite(np.asarray(dec)).all()


def test_train_mode_returns_raw_and_updates_bn():
    model, variables, x = _build("yolov5", "csl")
    outs, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert len(outs) == 3
    assert "batch_stats" in mutated


def test_decode_matches_reference_formulas():
    """Spot-check the decode math on a crafted logit pattern."""
    from ryolo_tpu.nn.heads import decode_csl

    nc = 2
    na, gs, stride = 3, 4, 8
    out = np.full((1, na, gs, gs, nc + 185), -20.0, np.float32)  # σ≈0
    # cell (1, 2) anchor 0: xy logits 0 (σ=0.5), wh logits 0, θ bin 100 hot
    out[0, 0, 1, 2, 0:2] = 0.0
    out[0, 0, 1, 2, 2:4] = 0.0
    out[0, 0, 1, 2, 5 + nc + 100] = 10.0
    anc = [np.array([[2.0, 3.0]] * na, np.float32)]
    # decode consumes the RAW neck layout (B, gs, gs, na*nf), anchor-major
    raw = out.transpose(0, 2, 3, 1, 4).reshape(1, gs, gs, -1)
    dec = np.asarray(decode_csl([jnp.asarray(raw)], anc, [stride], nc))
    row = dec[0, 0 * gs * gs + 1 * gs + 2]
    # pxy = (2*0.5 - 0.5 + grid) * stride, grid=(2,1)
    np.testing.assert_allclose(row[0:2], [(0.5 + 2) * 8, (0.5 + 1) * 8], atol=1e-4)
    # pwh = (2*0.5)^2 * anchor * stride
    np.testing.assert_allclose(row[2:4], [16.0, 24.0], atol=1e-4)
    # θ = (100 - 90)/180*π
    assert row[4] == pytest.approx(10 / 180 * np.pi, abs=1e-5)


def test_jit_forward_compiles_once():
    model, variables, x = _build("yolov5", "csl", img=64)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False, decode=True))
    _, d1 = fwd(variables, x)
    _, d2 = fwd(variables, x + 1)
    assert d1.shape == d2.shape


@pytest.mark.parametrize("act,n0,n1", [("swish", "cbs0", "cbs1"),
                                       ("mish", "cbm0", "cbm1")])
def test_train_s2d_stem_matches_convblocks(act, n0, n1):
    """train_s2d_stem == ConvBlock(c0,3,1)+ConvBlock(c1,3,2): identical
    variable tree AND init bits, matching fwd/batch-stats/grads to bf16
    rounding (the S2D grid changes only summation order)."""
    from flax import linen as nn

    from ryolo_tpu.nn.blocks import ConvBlock, train_s2d_stem

    class Plain(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = ConvBlock(32, 3, 1, act, dtype=jnp.bfloat16, name=n0)(
                x, train)
            return ConvBlock(64, 3, 2, act, dtype=jnp.bfloat16, name=n1)(
                x, train)

    class S2D(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return train_s2d_stem(x, train, 32, 64, act, jnp.bfloat16,
                                  n0, n1)

    jtu = jax.tree_util
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2, 32, 32, 3)).astype(np.float32))
    vp = Plain().init(jax.random.PRNGKey(7), x, train=False)
    vs = S2D().init(jax.random.PRNGKey(7), x, train=False)
    tp = jtu.tree_flatten_with_path(vp)[0]
    ts = jtu.tree_flatten_with_path(vs)[0]
    assert [jtu.keystr(k) for k, _ in tp] == [jtu.keystr(k) for k, _ in ts]
    for (_, a), (_, b) in zip(tp, ts):  # same init RNG stream -> same bits
        assert a.shape == b.shape and a.dtype == b.dtype
        assert jnp.all(a == b)

    # randomized params (defaults would hide scale/shift bugs)
    key = jax.random.PRNGKey(3)
    leaves, treedef = jtu.tree_flatten(vp)
    v = jtu.tree_unflatten(treedef, [
        l + 0.05 * jax.random.normal(jax.random.fold_in(key, i), l.shape,
                                     l.dtype)
        for i, l in enumerate(leaves)])

    yp, mp_ = Plain().apply(v, x, train=True, mutable=["batch_stats"])
    ys, ms_ = S2D().apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.float32(yp), np.float32(ys), atol=0.05)
    for (_, a), (_, b) in zip(jtu.tree_flatten_with_path(mp_)[0],
                              jtu.tree_flatten_with_path(ms_)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def lossf(params, mod):
        y, _ = mod.apply({"params": params,
                          "batch_stats": v["batch_stats"]}, x, train=True,
                         mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gp = jax.grad(lossf)(v["params"], Plain())
    gs = jax.grad(lossf)(v["params"], S2D())
    for (_, a), (_, b) in zip(jtu.tree_flatten_with_path(gp)[0],
                              jtu.tree_flatten_with_path(gs)[0]):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-2

    np.testing.assert_allclose(
        np.float32(Plain().apply(v, x, train=False)),
        np.float32(S2D().apply(v, x, train=False)), atol=0.05)


