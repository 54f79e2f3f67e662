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
