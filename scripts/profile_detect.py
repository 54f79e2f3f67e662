"""Component-level timing of the 800px detect path on the attached TPU.

Times each stage of the flagship configuration (yolov7-csl, 800px) as its
own jitted program — raw forward, forward+decode, full detect step, and the
two post-process load points (detect conf .7 and eval conf .001) — plus a
bfloat16 forward variant and batch-1 latency.  Also reports the XLA FLOP
count of the forward graph (used to derive the A100 baseline anchor in
bench.py).

Prints one JSON line per measurement; run under nohup and tail the log
(remote compiles of new graphs take minutes each; results stream as they
finish).
"""

import argparse
import json
import sys
import time

import numpy as np

CFG = {
    "anchors": [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
                [142, 110, 192, 243, 459, 401]],
    "angles": [-90, -60, -30, 0, 30, 60],
}
NC = 16
IMG = 800


def emit(name, **kw):
    print(json.dumps({"measure": name, **kw}), flush=True)


def bias_objectness(variables, jnp):
    """Push objectness bias to a converged detector's background response."""
    import flax

    params = flax.core.unfreeze(variables["params"]) if hasattr(
        flax.core, "unfreeze") else dict(variables["params"])
    nf = NC + 185
    for head in ("conv5", "conv6", "conv7"):
        b = params["neck"][head]["conv"]["bias"]
        idx = np.arange(3) * nf + 4
        params["neck"][head]["conv"]["bias"] = b.at[jnp.asarray(idx)].set(-6.0)
    return {"params": params, "batch_stats": variables["batch_stats"]}


def time_fn(jax, fn, args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="", help="comma-separated subset")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    import jax
    import jax.numpy as jnp

    from ryolo_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from ryolo_tpu.eval.postprocess import post_process_fixed
    from ryolo_tpu.nn import Yolo

    emit("devices", platform=jax.devices()[0].platform,
         n=len(jax.devices()))

    def build(dtype):
        model = Yolo(n_classes=NC, model_config=CFG, mode="csl", ver="yolov7",
                     dtype=dtype)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               train=False)
        return model, bias_objectness(variables, jnp)

    model, variables = build(jnp.float32)
    rng = np.random.default_rng(0)

    def batch(b):
        return jnp.asarray(rng.uniform(0, 1, (b, IMG, IMG, 3)), jnp.float32)

    x8 = batch(8)
    jax.block_until_ready(x8)

    def run(name, fn, args_, iters=20, per_img=8):
        if only and name not in only:
            return None
        try:
            t0 = time.perf_counter()
            ms = time_fn(jax, fn, args_, iters)
            emit(name, ms_per_call=round(ms, 3),
                 ms_per_img=round(ms / per_img, 4),
                 compile_s=round(time.perf_counter() - t0 - ms * iters / 1e3,
                                 1))
            return ms
        except Exception as e:  # keep streaming later measurements
            emit(name, error=str(e)[:400])
            return None

    # --- forward-only -------------------------------------------------------
    @jax.jit
    def fwd_raw(images):
        return model.apply(variables, images, train=False, decode=False)

    @jax.jit
    def fwd_decode(images):
        return model.apply(variables, images, train=False, decode=True)[1]

    @jax.jit
    def detect_full(images):
        _, dec = model.apply(variables, images, train=False, decode=True)
        return post_process_fixed(dec, 0.7, 0.2)

    t_raw = run("fwd_raw_f32_b8", fwd_raw, (x8,))
    t_dec = run("fwd_decode_f32_b8", fwd_decode, (x8,))
    run("detect_full_f32_b8", detect_full, (x8,))
    if t_raw and t_dec:
        emit("decode_delta", ms_per_call=round(t_dec - t_raw, 3))

    # FLOPs of the decode-included forward (for the A100 anchor derivation)
    if not only or "flops" in only:
        try:
            cost = jax.jit(lambda im: model.apply(
                variables, im, train=False, decode=True
            )).lower(x8).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            emit("flops", total_gflops=round(cost.get("flops", 0) / 1e9, 1),
                 per_img_gflops=round(cost.get("flops", 0) / 8 / 1e9, 2))
        except Exception as e:
            emit("flops", error=str(e)[:400])

    # --- post-process loads --------------------------------------------------
    decoded = None
    try:
        decoded = fwd_decode(x8)
        jax.block_until_ready(decoded)
    except Exception as e:
        emit("decoded_input", error=str(e)[:400])

    if decoded is not None:
        run("pp_detect_conf.7", lambda d: post_process_fixed(d, 0.7, 0.2),
            (decoded,))
        run("pp_eval_conf.001",
            lambda d: post_process_fixed(d, 0.001, 0.65, max_nms=5000,
                                         max_det=1500),
            (decoded,), iters=10)

    # --- batch-1 latency ------------------------------------------------------
    x1 = batch(1)
    run("detect_full_f32_b1", detect_full, (x1,), per_img=1)

    # --- batch 16 -------------------------------------------------------------
    x16 = batch(16)
    run("detect_full_f32_b16", detect_full, (x16,), iters=12, per_img=16)

    # --- bfloat16 variant -----------------------------------------------------
    if not only or "fwd_decode_bf16_b8" in only:
        bmodel, bvars = build(jnp.bfloat16)

        @jax.jit
        def fwd_decode_bf16(images):
            return bmodel.apply(bvars, images, train=False, decode=True)[1]

        run("fwd_decode_bf16_b8", fwd_decode_bf16, (x8,))

    emit("done")


if __name__ == "__main__":
    main()
