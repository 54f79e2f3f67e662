"""One-off A/B experiments for detect-step hot spots (analysis only)."""

import argparse
import sys
import time

import numpy as np


def timeit(jax, fn, args, iters=24):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp", choices=["bf16in", "argmax"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from ryolo_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    if args.exp == "bf16in":
        import bench
        from ryolo_tpu.eval.postprocess import post_process_fixed

        model, variables = bench.build_model("bf16", True, packed=True)

        def step(images):
            _, decoded = model.apply(variables, images, train=False,
                                     decode=True)
            return post_process_fixed(decoded, 0.7, 0.2)

        fn = jax.jit(step)
        batches = bench.rand_batches(4, 8, 800, packed=True)
        ms_f32 = min(timeit(jax, fn, b) for b in [batches[0]] * 1)
        ms_f32 = timeit(jax, fn, batches[0], 24)
        b16 = [(x[0].astype(jnp.bfloat16),) for x in batches]
        jax.block_until_ready([b[0] for b in b16])
        ms_bf16 = timeit(jax, fn, b16[0], 24)
        print(f"f32-in  {ms_f32:.2f} ms/batch ({8/ms_f32*1000:.1f} img/s)")
        print(f"bf16-in {ms_bf16:.2f} ms/batch ({8/ms_bf16*1000:.1f} img/s)")
        return

    if args.exp == "argmax":
        # the decode's CSL theta argmax: slice [21:201) of a 603-ch head
        # map, per anchor.  Variants of layout/staging.
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((8, 100, 100, 603)),
                        jnp.bfloat16)
        jax.block_until_ready(x)
        nf, nc = 201, 16

        @jax.jit
        def v_current(x):
            outs = []
            for a in range(3):
                pa = jax.lax.slice_in_dim(x, a * nf + 5 + nc, (a + 1) * nf,
                                          axis=3)
                outs.append(jnp.argmax(pa, axis=-1))
            return outs

        @jax.jit
        def v_concat_first(x):
            # one aligned (8,100,100,540) tensor, then 3 reduces
            pa = jnp.concatenate(
                [jax.lax.slice_in_dim(x, a * nf + 5 + nc, (a + 1) * nf, 3)
                 for a in range(3)], axis=-1)
            return [jnp.argmax(
                jax.lax.slice_in_dim(pa, a * 180, (a + 1) * 180, 3), -1)
                for a in range(3)]

        @jax.jit
        def v_reshape2d(x):
            # flatten spatial, argmax over minor axis of a (8, 10000, 180)
            outs = []
            for a in range(3):
                pa = jax.lax.slice_in_dim(x, a * nf + 5 + nc, (a + 1) * nf,
                                          axis=3)
                pa = pa.reshape(8, 10000, 180)
                outs.append(jnp.argmax(pa, axis=-1))
            return outs

        @jax.jit
        def v_two_stage(x):
            # stage 1: 180 -> reshape (.., 2, 90)? use max+compare trick:
            # compute max over bins, then first index where equal
            outs = []
            for a in range(3):
                pa = jax.lax.slice_in_dim(x, a * nf + 5 + nc, (a + 1) * nf,
                                          axis=3)
                m = jnp.max(pa, axis=-1, keepdims=True)
                eq = pa >= m
                idx = jnp.argmax(eq, axis=-1)
                outs.append(idx)
            return outs

        @jax.jit
        def v_f32(x):
            outs = []
            for a in range(3):
                pa = jax.lax.slice_in_dim(x, a * nf + 5 + nc, (a + 1) * nf,
                                          axis=3).astype(jnp.float32)
                outs.append(jnp.argmax(pa, axis=-1))
            return outs

        for name, fn in [("current(3xslice-argmax)", v_current),
                         ("concat_first", v_concat_first),
                         ("reshape2d", v_reshape2d),
                         ("two_stage_maxeq", v_two_stage),
                         ("f32_argmax", v_f32)]:
            try:
                ms = timeit(jax, fn, (x,))
                print(f"{name:28s} {ms:7.3f} ms")
            except Exception as e:
                print(f"{name:28s} FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
