"""Benchmark: images/sec/chip for the 800px detect path (BASELINE metric).

Runs the flagship inference configuration — YOLOv7 + CSL, 800 px, batch 8,
jit-fused forward+decode followed by fixed-shape rotated post-processing —
on the available accelerator and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

``vs_baseline`` is measured throughput divided by A100_BASELINE_IPS, a
documented estimate of the PyTorch reference's A100 throughput for the same
config (the reference publishes no numbers — BASELINE.md — so the rebuild's
north star "≥3× A100 images/sec/chip" is anchored to this constant; replace
it with a measured value when one exists).
"""

import json
import time

import numpy as np

# Estimated PyTorch-reference throughput on A100 for yolov7-csl @800px
# batched detect (fp16, including NMS post-processing). No published number
# exists (BASELINE.json "published": {}); this anchor is an engineering
# estimate for the vs_baseline ratio only.
A100_BASELINE_IPS = 120.0

BATCH = 8
IMG = 800
NC = 16  # DOTA


def main():
    import jax
    import jax.numpy as jnp

    from ryolo_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from ryolo_tpu.eval.postprocess import post_process_fixed
    from ryolo_tpu.nn import Yolo

    cfg = {
        "anchors": [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
                    [142, 110, 192, 243, 459, 401]],
        "angles": [-90, -60, -30, 0, 30, 60],
    }
    # f32 measured faster than explicit bf16 on v5e here (24.2 vs
    # 28.8 ms/batch device time): XLA already decomposes f32 convs into
    # MXU bf16 passes, and explicit bf16 adds conversions.
    model = Yolo(n_classes=NC, model_config=cfg, mode="csl", ver="yolov7",
                 dtype=jnp.float32)
    # init at a tiny size: conv/BN param shapes are image-size independent,
    # and eager init at 800px costs minutes on this host
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32),
                           train=False)
    # Random weights fire ~2000 false detections/image above conf 0.7,
    # which benchmarks a workload no trained detector produces.  Bias the
    # objectness channels to a converged detector's background response so
    # the post-process load is realistic (a few boxes per image).
    import flax

    params = flax.core.unfreeze(variables["params"]) if hasattr(
        flax.core, "unfreeze") else dict(variables["params"])
    nf = NC + 185
    for head in ("conv5", "conv6", "conv7"):
        b = params["neck"][head]["conv"]["bias"]
        idx = np.arange(3) * nf + 4  # obj channel per anchor
        params["neck"][head]["conv"]["bias"] = b.at[jnp.asarray(idx)].set(-6.0)
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    @jax.jit
    def detect_step(images):
        _, decoded = model.apply(variables, images, train=False, decode=True)
        dets, valid = post_process_fixed(decoded, 0.7, 0.2)
        return dets, valid, jnp.sum(dets) * 1e-12

    rng = np.random.default_rng(0)
    # distinct pre-uploaded inputs: pipelined dispatch overlaps the host
    # round-trip, and no runtime can dedupe repeated work
    batches = [
        jnp.asarray(rng.uniform(0, 1, (BATCH, IMG, IMG, 3)), jnp.float32)
        for _ in range(8)
    ]
    jax.block_until_ready(batches)

    # warmup + compile
    d, v, chk = detect_step(batches[0])
    jax.block_until_ready((d, v))

    iters = 24
    outs = []
    t0 = time.perf_counter()
    for i in range(iters):
        outs.append(detect_step(batches[i % len(batches)]))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    ips = BATCH * iters / dt
    print(json.dumps({
        "metric": "images_per_sec_chip_800px_detect_yolov7_csl",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / A100_BASELINE_IPS, 3),
    }))


if __name__ == "__main__":
    main()
