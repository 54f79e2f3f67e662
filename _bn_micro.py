"""Microbench: BN train-mode grad at the hot early-layer shape.

Compares flax nn.BatchNorm autodiff vs FusedBatchNorm custom-VJP
(with the lane-folded reduction) vs a no-fold closed-form variant.
Chained + fetch-forced per CLAUDE.md.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ryolo_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import ryolo_tpu.nn.fused_bn as fbn

B, H, W, C = 8, 400, 400, 32
key = jax.random.PRNGKey(0)


def bench(make_mod, tag):
    mod = make_mod()
    x0 = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    v = jax.jit(lambda: mod.init(key, x0))()

    def loss(params, x):
        y, _ = mod.apply({"params": params["params"],
                          "batch_stats": v["batch_stats"]}, x,
                         mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))

    def step(params, x, chk):
        gp, gx = g(params, x)
        chk2 = gx[0, 0, 0, 0].astype(jnp.float32) + chk % 64.0 + 1
        return gx.astype(jnp.bfloat16) * (1 + chk2 * 1e-9), chk2

    step_j = jax.jit(step)
    chk = jnp.float32(1 + int.from_bytes(os.urandom(4), "little") % 1000)
    x, chk = step_j(v, x0, chk)
    jax.block_until_ready(chk)
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        x, chk = step_j(v, x, chk)
    assert np.isfinite(float(chk))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{tag:22s} {ms:7.3f} ms/grad-iter")


class FlaxBN(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=False, momentum=0.9,
                            epsilon=1e-5, dtype=jnp.bfloat16)(x)


class FusedBN(nn.Module):
    @nn.compact
    def __call__(self, x):
        return fbn.FusedBatchNorm(use_running_average=False, momentum=0.9,
                                  epsilon=1e-5, dtype=jnp.bfloat16)(x)


bench(FlaxBN, "flax autodiff")
bench(FusedBN, "fused (lane-folded)")

# no-fold variant: patch _folded_sum to the plain leading-axes sum
fbn._folded_sum = lambda a: a.reshape(a.size // a.shape[-1],
                                      a.shape[-1]).sum(0)
bench(FusedBN, "fused (plain sum)")
