"""Re-microbench the int8 conv win by channel width (VERDICT r4 #6).

The QUANT_MIN_CH=256 gate was measured in r3 with DYNAMIC activation
scales (a per-conv max-reduce + fusion barrier in the epilogue); the
static-scale epilogue landed later and may move the break-even width.
Times a chain of k×k convs at a fixed channel width in bf16 vs the
int8-MXU path with STATIC scales (the production deploy configuration),
chained + fetch-forced per CLAUDE.md.

Also prints the v7 deploy graph's conv-FLOP distribution by min(cin,
cout) bucket, so the end-to-end ceiling of any gate choice is explicit.

Usage: python scripts/prof_int8.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def time_conv_chain(ch: int, grid: int, k: int = 3, depth: int = 8,
                    iters: int = 8, int8: bool = False):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-1, 1, (8, grid, grid, ch)), jnp.bfloat16)
    kern = jnp.asarray(rng.normal(0, 0.05, (depth, k, k, ch, ch)),
                       jnp.bfloat16)
    if int8:
        wmax = jnp.max(jnp.abs(kern.astype(jnp.float32)), axis=(1, 2, 3))
        wscale = wmax / 127.0  # (depth, ch) per-out-channel
        kq = jnp.round(kern.astype(jnp.float32)
                       / wscale[:, None, None, None, :]).astype(jnp.int8)
        ascale = jnp.float32(1.0 / 127.0)  # static activation scale

        def layer(x, i):
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ascale),
                          -127, 127).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, kq[i], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = (y.astype(jnp.float32) * (wscale[i] * ascale))
            return jax.nn.silu(y).astype(jnp.bfloat16)
    else:
        def layer(x, i):
            y = jax.lax.conv_general_dilated(
                x, kern[i], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return jax.nn.silu(y).astype(jnp.bfloat16)

    @jax.jit
    def run(x, s):
        x = x + s.astype(x.dtype)  # dedup bump
        for i in range(depth):
            x = layer(x, i)
        chk = jnp.sum(x.astype(jnp.float32)) * 1e-9 + s + 1.0
        return x, chk

    _, w = run(x0, jnp.float32(1.0))
    assert np.isfinite(float(w))
    chk = jnp.float32(1.0 + int.from_bytes(os.urandom(4), "little")
                      % (1 << 22) / 2048.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        _, chk = run(x0, chk * 1e-6)
    assert np.isfinite(float(chk))
    dt = (time.perf_counter() - t0) / iters / depth * 1e3
    flops = 2 * 8 * grid * grid * k * k * ch * ch
    return dt, flops / (dt * 1e-3) / 1e12


def flop_distribution():
    """Conv-FLOP share by min(cin, cout) for the deploy-fused v7 graph."""
    import jax
    import jax.numpy as jnp

    from bench import build_model

    model, variables = build_model("bf16", True, packed=True)
    buckets = {}
    total = 0.0
    # walk the fused params: every conv kernel is (kh, kw, cin, cout);
    # spatial size by stride bookkeeping is overkill — use the actual
    # traced graph cost instead: count per-kernel MACs at the layer's
    # activation size via shape inference is complex, so approximate with
    # kernel param count x (800/stride)^2 being unavailable; report
    # kernel-shape share as the coverage proxy and let the end-to-end
    # int8_ips speak for throughput.
    def walk(tree, path):
        nonlocal total
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + "/" + k)
            return
        if hasattr(tree, "shape") and len(getattr(tree, "shape", ())) == 4:
            kh, kw, cin, cout = tree.shape
            key = 512 if min(cin, cout) >= 512 else (
                256 if min(cin, cout) >= 256 else (
                    128 if min(cin, cout) >= 128 else 64))
            macs = kh * kw * cin * cout
            buckets[key] = buckets.get(key, 0) + macs
            total += macs
    walk(jax.tree_util.tree_map(lambda x: x, variables["params"]), "")
    return {k: round(v / total, 3) for k, v in sorted(buckets.items())}


def main():
    from ryolo_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    for ch, grid in ((64, 200), (128, 100), (256, 50), (512, 25)):
        bf = time_conv_chain(ch, grid, int8=False)
        i8 = time_conv_chain(ch, grid, int8=True)
        print(f"ch={ch:4d} grid={grid:3d}: bf16 {bf[0]:.3f} ms/conv "
              f"({bf[1]:.1f} TF/s) | int8-static {i8[0]:.3f} ms/conv "
              f"({i8[1]:.1f} TF/s) | speedup {bf[0] / i8[0]:.2f}x",
              flush=True)
    print("kernel-MAC share by min(cin,cout) bucket:", flop_distribution(),
          flush=True)


if __name__ == "__main__":
    main()
