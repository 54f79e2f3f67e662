"""Deploy-time fusion parity: fused inference graph == training graph.

The fused model (BN folded, RepConv merged, Implicit priors absorbed —
ryolo_tpu/nn/deploy.py) must reproduce the training-structure forward at
``train=False`` exactly up to float32 rounding, for every backbone version
and head mode.  RepConv/Implicit semantics per the reference
(``model/utils.py:163-215``, ``model/neck.py:189-216``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ryolo_tpu.nn import Yolo, fuse_for_inference

MODEL_CFG = {
    "anchors": [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
                [142, 110, 192, 243, 459, 401]],
    "angles": [-90, -60, -30, 0, 30, 60],
}
NC = 2


def _randomized_variables(model, x, seed=0):
    """Init then jitter every param and BN stat so folds are non-trivial."""
    variables = model.init(jax.random.PRNGKey(seed), x, train=False)
    rng = np.random.default_rng(seed)

    def jitter(leaf):
        a = np.asarray(leaf)
        sigma = 0.1 * a.std() + 0.01  # scale-relative: keep activations sane
        return a + rng.normal(0, sigma, a.shape).astype(a.dtype)

    params = jax.tree_util.tree_map(jitter, variables["params"])

    def jitter_stats(path, leaf):
        a = np.asarray(leaf)
        name = path[-1].key
        if name == "var":
            return np.abs(rng.normal(1.0, 0.3, a.shape)).astype(a.dtype) + 0.2
        return a + rng.normal(0, 0.2, a.shape).astype(a.dtype)

    stats = jax.tree_util.tree_map_with_path(
        jitter_stats, variables["batch_stats"]
    )
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("ver,mode", [
    ("yolov5", "csl"),
    ("yolov4", "csl"),
    ("yolov7", "csl"),
    ("yolov7", "kfiou"),
])
def test_fused_forward_matches_training_graph(ver, mode):
    model = Yolo(n_classes=NC, model_config=MODEL_CFG, mode=mode, ver=ver)
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)), jnp.float32
    )
    variables = _randomized_variables(model, x)

    ref_outs, ref_dec = model.apply(variables, x, train=False, decode=True)
    dep_model, dep_vars = fuse_for_inference(model, variables)
    assert "batch_stats" not in dep_vars
    outs, dec = dep_model.apply(dep_vars, x, train=False, decode=True)

    for r, o in zip(ref_outs, outs):
        r = np.asarray(r)
        # atol rides the logit magnitude: the fold is exact linear algebra,
        # the residual is f32 summation-order noise through ~100 convs
        np.testing.assert_allclose(np.asarray(o), r, rtol=1e-3,
                                   atol=1e-4 * np.abs(r).max() + 1e-4)
    # decoded boxes are in pixels (up to 64): compare absolutely
    np.testing.assert_allclose(np.asarray(dec), np.asarray(ref_dec),
                               rtol=1e-3, atol=2e-2)


@pytest.mark.parametrize("ver,mode", [
    ("yolov7", "csl"),
    ("yolov5", "kfiou"),
])
def test_int8_deploy_close_to_f32(ver, mode):
    """The quantized deploy graph (per-channel int8 weights, dynamic
    per-tensor activation scales) must track the f32 deploy graph closely:
    decoded confidences within a few 1e-2, box centers within ~a pixel.
    (Exactness is impossible by construction; the mAP-level gate lives in
    tests/test_trained_parity.py.)"""
    model = Yolo(n_classes=NC, model_config=MODEL_CFG, mode=mode, ver=ver)
    x = jnp.asarray(
        np.random.default_rng(5).uniform(0, 1, (2, 64, 64, 3)), jnp.float32
    )
    variables = _randomized_variables(model, x)

    f_model, f_vars = fuse_for_inference(model, variables)
    _, f_dec = f_model.apply(f_vars, x, train=False, decode=True)
    q_model, q_vars = fuse_for_inference(model, variables, quantize=True)
    _, q_dec = q_model.apply(q_vars, x, train=False, decode=True)

    # int8 params actually present (not silently running f32)
    leaves = jax.tree_util.tree_leaves_with_path(q_vars["params"])
    n_q = sum(1 for p, l in leaves if np.asarray(l).dtype == np.int8)
    assert n_q > 20, f"only {n_q} int8 kernels in the quantized tree"

    f_dec = np.asarray(f_dec)
    q_dec = np.asarray(q_dec)
    # confidences (sigmoid-squashed): small absolute drift
    assert np.abs(q_dec[..., 5:] - f_dec[..., 5:]).max() < 0.05
    # box geometry within ~1px at this 64px scale
    assert np.abs(q_dec[..., :4] - f_dec[..., :4]).max() < 1.5

    # calibrated STATIC activation scales (deploy.calibrate_static_scales):
    # the scale VALUES are bit-identical to the dynamic reduce (the sowed
    # device max round-trips through host f32 exactly), but the OUTPUTS
    # are not bit-equal: XLA constant-folds/reassociates the conv epilogue
    # around a constant ascale differently than around the in-graph
    # reduce, and through ~20 chained quantized convs those one-ulp input
    # diffs flip round() requantization boundaries and avalanche (measured
    # up to 46% of decoded elements differing at ≤0.4% relative).  The
    # honest contract is the same functional envelope as int8-vs-f32; the
    # mAP-level gate lives in tests/test_trained_parity.py.
    from ryolo_tpu.nn.deploy import calibrate_static_scales

    s_model, s_vars = calibrate_static_scales(q_model, q_vars, [x])
    scales = [
        l for p, l in jax.tree_util.tree_leaves_with_path(s_vars["params"])
        if p[-1].key == "ascale"
    ]
    assert len(scales) > 5, f"only {len(scales)} calibrated scales"
    _, s_dec = s_model.apply(s_vars, x, train=False, decode=True)
    s_dec = np.asarray(s_dec)
    assert np.abs(s_dec[..., 5:] - q_dec[..., 5:]).max() < 0.05
    assert np.abs(s_dec[..., :4] - q_dec[..., :4]).max() < 1.5
    assert np.abs(s_dec[..., 5:] - f_dec[..., 5:]).max() < 0.05
    assert np.abs(s_dec[..., :4] - f_dec[..., :4]).max() < 1.5


def test_fused_param_count_shrinks():
    """RepConv 3-branch + BN params disappear from the deployed tree."""
    model = Yolo(n_classes=NC, model_config=MODEL_CFG, mode="csl",
                 ver="yolov7")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, dep_vars = fuse_for_inference(model, variables)
    flat = jax.tree_util.tree_leaves_with_path(dep_vars["params"])
    names = ["/".join(str(k) for k in p) for p, _ in flat]
    assert not any("bn" in n for n in names)
    assert not any("implicit" in n for n in names)
    assert not any("dense_conv" in n for n in names)
    n_ref = sum(np.asarray(l).size for l in
                jax.tree_util.tree_leaves(variables["params"]))
    n_dep = sum(np.asarray(l).size for l, in
                zip(jax.tree_util.tree_leaves(dep_vars["params"]),))
    assert n_dep < n_ref


def test_packed_input_deploy_exact():
    """The packed-input stem (host 2x2 S2D layout + 3x3 conv0) must equal
    the training graph exactly like the raw-input deploy path does."""
    from ryolo_tpu.nn.blocks import pack_input_s2d

    model = Yolo(n_classes=NC, model_config=MODEL_CFG, mode="csl",
                 ver="yolov7")
    x = np.random.default_rng(7).uniform(0, 1, (2, 64, 64, 3)).astype(
        np.float32)
    variables = _randomized_variables(model, jnp.asarray(x))

    _, ref_dec = model.apply(variables, jnp.asarray(x), train=False,
                             decode=True)
    dep_model, dep_vars = fuse_for_inference(model, variables,
                                             packed_input=True)
    xp = jnp.asarray(pack_input_s2d(x))
    assert xp.shape == (2, 32, 32, 12)
    _, dec = dep_model.apply(dep_vars, xp, train=False, decode=True)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(ref_dec),
                               rtol=1e-3, atol=2e-2)

    with pytest.raises(ValueError):
        fuse_for_inference(
            Yolo(n_classes=NC, model_config=MODEL_CFG, mode="csl",
                 ver="yolov5"), variables, packed_input=True)
