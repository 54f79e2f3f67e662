"""FusedBatchNorm: forward bit-parity with flax, closed-form backward.

The custom-VJP BN (ryolo_tpu/nn/fused_bn.py) must be a drop-in for
``nn.BatchNorm``: identical forward bits, identical running batch_stats,
identical param/variable layout; gradients equal XLA's autodiff up to
float reassociation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ryolo_tpu.nn.fused_bn import FusedBatchNorm, _channel_sum


def _pair(dtype):
    fused = FusedBatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5, dtype=dtype)
    ref = nn.BatchNorm(use_running_average=False, momentum=0.9,
                       epsilon=1e-5, dtype=dtype)
    return fused, ref


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape", [(2, 8, 8, 32), (2, 4, 4, 3, 16),
                                   (4, 6, 6, 128), (2, 5, 5, 200)])
def test_forward_bits_match_flax(dtype, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(1.5, 2.0, shape), dtype)
    fused, ref = _pair(dtype)
    vf = fused.init(jax.random.PRNGKey(0), x)
    vr = ref.init(jax.random.PRNGKey(0), x)
    # same param/variable tree
    assert jax.tree_util.tree_structure(vf) == jax.tree_util.tree_structure(vr)

    # non-trivial scale/bias
    sc = jnp.asarray(rng.normal(1.0, 0.2, shape[-1]), jnp.float32)
    bi = jnp.asarray(rng.normal(0.0, 0.2, shape[-1]), jnp.float32)
    vf = {"params": {"scale": sc, "bias": bi},
          "batch_stats": vf["batch_stats"]}

    yf, mf = fused.apply(vf, x, mutable=["batch_stats"])
    yr, mr = ref.apply(vf, x, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(yf), np.asarray(yr))
    for a, b in zip(jax.tree_util.tree_leaves(mf),
                    jax.tree_util.tree_leaves(mr)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # eval branch, using the just-updated running stats
    fe = FusedBatchNorm(use_running_average=True, momentum=0.9,
                        epsilon=1e-5, dtype=dtype)
    re_ = nn.BatchNorm(use_running_average=True, momentum=0.9,
                       epsilon=1e-5, dtype=dtype)
    ve = {"params": vf["params"], "batch_stats": mf["batch_stats"]}
    np.testing.assert_array_equal(np.asarray(fe.apply(ve, x)),
                                  np.asarray(re_.apply(ve, x)))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_backward_matches_autodiff(dtype):
    shape = (2, 8, 8, 32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0.5, 1.5, shape), dtype)
    w = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
    sc = jnp.asarray(rng.normal(1.0, 0.2, shape[-1]), jnp.float32)
    bi = jnp.asarray(rng.normal(0.0, 0.2, shape[-1]), jnp.float32)
    fused, ref = _pair(dtype)
    v0 = fused.init(jax.random.PRNGKey(0), x)
    v = {"params": {"scale": sc, "bias": bi},
         "batch_stats": v0["batch_stats"]}

    def loss(mod):
        def f(params, x):
            y, _ = mod.apply({"params": params,
                              "batch_stats": v["batch_stats"]}, x,
                             mutable=["batch_stats"])
            return jnp.sum(y.astype(jnp.float32) * w)
        return f

    (gf, gxf) = jax.grad(loss(fused), argnums=(0, 1))(v["params"], x)
    (gr, gxr) = jax.grad(loss(ref), argnums=(0, 1))(v["params"], x)
    np.testing.assert_allclose(np.asarray(gf["scale"]),
                               np.asarray(gr["scale"]), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gf["bias"]),
                               np.asarray(gr["bias"]), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gxf, np.float32), np.asarray(gxr, np.float32),
        rtol=2e-2 if dtype == jnp.bfloat16 else 2e-5,
        atol=2e-2 if dtype == jnp.bfloat16 else 1e-5)


def test_channel_sum_exact_paths():
    rng = np.random.default_rng(2)
    for shape in [(16, 32), (12, 32), (7, 200), (8, 128), (30, 64),
                  (2, 3, 5, 16)]:
        a = jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
        got = np.asarray(_channel_sum(a))
        want = np.asarray(a).astype(np.float64).reshape(
            -1, shape[-1]).sum(0)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
        assert got.shape == (shape[-1],)
