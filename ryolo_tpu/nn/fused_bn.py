"""BatchNorm with a closed-form fused backward (train-time hot path).

Drop-in replacement for ``flax.linen.BatchNorm`` (axis=-1, fast-variance,
float32 reductions — the exact configuration every conv block here uses,
mirroring the reference's ``nn.BatchNorm2d`` semantics in
``/root/reference/model/utils.py:6-32``).  The param / batch_stats layout
("scale"/"bias", "mean"/"var") and every FORWARD value are bit-identical
to flax's module; only the backward is replaced.

Why: under ``jax.grad`` flax's compositional BN (mean reduce + var reduce
+ normalize as separate traced ops) makes XLA accumulate THREE cotangent
contributions into dx — the r5 train-step profile shows the resulting
``bn/add_any`` fusions cost ~2 ms EACH for the early high-resolution
layers (cbs0-3 at 800px B8), ~10 ms of the 62.8 ms step.  The closed form

    dx = scale * rstd * (dy - mean(dy) - x_hat * mean(dy * x_hat))

produces dx in ONE pass over the activation plus one (shared-input)
reduction pass for dgamma/dbeta.  The reductions stay plain
leading-axes sums: an earlier lane-folding variant (reshape (N, C) ->
(N/k, k*C) to reduce at full 128-lane width) REGRESSED the step 121 ->
78.7 img/s — on TPU a narrow-C array is lane-padded to 128, so that
reshape is a physical repack of the whole activation, not a free
buffer reinterpretation (r5 microbench: 54.8 ms/grad-iter folded vs
42.1 plain vs 44.9 flax at (8,400,400,32)).

Exactness contract:
  * forward: the same ops in the same order as flax (`_compute_stats`
    fast-variance then `_normalize`) — outputs and running batch_stats
    are bit-identical (pinned by tests/test_fused_bn.py).
  * backward: the closed form is algebraically the standard BN gradient;
    bits differ from XLA's autodiff only by float reassociation.  The
    returned batch-stat PRIMALS feed only the (non-differentiated)
    running-average update, so their zero cotangents are dropped.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import dtypes as flax_dtypes


def _channel_sum(a: jax.Array):
    """Sum over all leading axes -> (C,).

    Collapsing the major axes is layout-free; do NOT fold lanes into the
    minor axis (see module docstring: lane-padding makes that reshape a
    full-activation repack on TPU).
    """
    return a.reshape(a.size // a.shape[-1], a.shape[-1]).sum(0)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bn_train(x, scale, bias, eps: float, out_dtype):
    y, mu, var, _ = _bn_train_core(x, scale, bias, eps, out_dtype)
    return y, mu, var


def _bn_train_core(x, scale, bias, eps: float, out_dtype):
    # flax _compute_stats(force_float32_reductions, use_fast_variance):
    # promote to f32, mean + mean-of-squares, clipped fast variance
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mu = x32.mean(axes)
    mu2 = (x32 * x32).mean(axes)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    # flax _normalize: y = (x - mean); mul = rsqrt(var+eps); mul *= scale;
    # y *= mul; y += bias — associate identically
    rstd = jax.lax.rsqrt(var + eps)
    y = (x32 - mu) * (rstd * scale) + bias
    return y.astype(out_dtype), mu, var, rstd


def _bn_train_fwd(x, scale, bias, eps: float, out_dtype):
    y, mu, var, rstd = _bn_train_core(x, scale, bias, eps, out_dtype)
    return (y, mu, var), (x, mu, rstd, scale)


def _bn_train_bwd(eps: float, out_dtype, res, cts):
    # cotangents for the stat outputs are dropped: they feed only the
    # mutable running-average update, which jax.grad never differentiates
    # (module docstring)
    x, mu, rstd, scale = res
    dy = cts[0].astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    xhat = (x32 - mu) * rstd
    n = x.size // x.shape[-1]
    dbeta = _channel_sum(dy)
    dgamma = _channel_sum(dy * xhat)
    g = scale * rstd
    dx = (dy - dbeta * (1.0 / n) - xhat * (dgamma * (1.0 / n))) * g
    return dx.astype(x.dtype), dgamma, dbeta


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


class FusedBatchNorm(nn.Module):
    """``nn.BatchNorm`` with the fused custom-VJP train backward.

    Supports exactly the configuration the conv blocks use: feature axis
    -1, use_bias/use_scale, fast variance, float32 reductions, no
    axis_name.  Same params ("scale", "bias"), same batch_stats
    ("mean", "var"), same forward bits (flax ops replicated in
    :func:`_bn_train_core` / the eval branch below).
    """

    use_running_average: bool
    momentum: float = 0.99
    epsilon: float = 1e-5
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (C,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (C,))
        scale = self.param("scale", nn.initializers.ones, (C,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,),
                          self.param_dtype)
        out_dtype = flax_dtypes.canonicalize_dtype(x, scale, bias,
                                                   dtype=self.dtype)
        if self.use_running_average:
            # eval: affine through the stored stats — plain XLA ops
            # (elementwise; nothing for a custom backward to fuse),
            # associated exactly like flax _normalize
            x32 = x.astype(jnp.float32)
            y = (x32 - ra_mean.value) * (
                jax.lax.rsqrt(ra_var.value + self.epsilon) * scale) + bias
            return y.astype(out_dtype)

        y, mu, var = _bn_train(x, scale, bias, self.epsilon, out_dtype)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1 - self.momentum) * mu)
            ra_var.value = (self.momentum * ra_var.value
                            + (1 - self.momentum) * var)
        return y
