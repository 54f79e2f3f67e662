"""Benchmark: images/sec/chip for the 800px detect path (BASELINE metric).

Runs the flagship inference configuration — YOLOv7 + CSL, 800 px, batch 8,
deploy-fused (BN folding + RepConv merge, ryolo_tpu/nn/deploy.py) jitted
forward+decode+fixed-shape rotated post-processing — on the available
accelerator and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N,
     "latency_b1_ms": ..., "nms_ms_img_detect": ..., "nms_ms_img_eval": ...}

``vs_baseline`` divides by A100_BASELINE_IPS, the derived estimate of the
PyTorch reference's A100 throughput for the same config (the reference
publishes no numbers).  Full derivation in BASELINE.md §"A100 anchor
derivation"; in short: fp32-eager reference ⇒ A100 TF32 peak 156 TF/s ×
20-27 % eager utilization (published YOLOv7 V100 datapoint, batch-scaled)
÷ 190 GFLOP/img measured for this config (``python bench.py --flops``),
minus the reference's per-image Python NMS overhead ⇒ 140-195 img/s;
pinned at the midpoint.  Replace with a measured value if the reference
is ever run on an A100.
"""

import argparse
import json
import time

import numpy as np

A100_BASELINE_IPS = 165.0  # derived (BASELINE.md); round-1 guess was 120

BATCH = 8
IMG = 800
NC = 16  # DOTA


# per-scale detection-head conv names (see ryolo_tpu/nn/necks.py)
HEAD_CONVS = {
    "yolov4": ("conv22", "conv30", "conv38"),
    "yolov5": ("conv15", "conv17", "conv19"),
    "yolov7": ("conv5", "conv6", "conv7"),
}


def build_model(dtype_name: str, deploy: bool, mode: str = "csl",
                ver: str = "yolov7", packed: bool = False):
    import jax
    import jax.numpy as jnp
    import flax

    from ryolo_tpu.nn import Yolo, fuse_for_inference

    cfg = {
        "anchors": [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
                    [142, 110, 192, 243, 459, 401]],
        "angles": [-90, -60, -30, 0, 30, 60],
    }
    model = Yolo(n_classes=NC, model_config=cfg, mode=mode, ver=ver,
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
    params = flax.core.unfreeze(variables["params"]) if hasattr(
        flax.core, "unfreeze") else dict(variables["params"])
    na = 3 if mode == "csl" else 18
    nf = NC + 185 if mode == "csl" else NC + 6
    obj_ch = 4 if mode == "csl" else 5  # layout per heads.py
    for head in HEAD_CONVS[ver]:
        b = params["neck"][head]["conv"]["bias"]
        idx = np.arange(na) * nf + obj_ch  # obj channel per anchor
        params["neck"][head]["conv"]["bias"] = b.at[jnp.asarray(idx)].set(-6.0)
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
             "int8": jnp.bfloat16}[dtype_name]
    if deploy:
        # int8: BN-backed convs on the int8 MXU (per-channel weights,
        # dynamic activation scales); heads/stem/decode stay bf16/f32
        model, variables = fuse_for_inference(
            model, variables, dtype=dtype, quantize=dtype_name == "int8",
            packed_input=packed)
    elif dtype_name != "f32":
        model = model.clone(dtype=dtype)
    return model, variables


def detect_fn(model, variables, conf, iou, input_shape=None):
    """Jitted detect step; with ``input_shape`` the step is compiled with
    an AUTO input layout (XLA picks the conv-native tiling, killing the
    ~0.6 ms input retile copy) and the returned callable carries the
    chosen format as ``.input_format`` — upload batches with
    ``jax.device_put(x, fmt)`` (same bytes; the DMA engine tiles)."""
    import jax

    from ryolo_tpu.eval.postprocess import (post_process_defer,
                                            post_process_fixed)

    if model.mode == "csl":
        # deferred theta: the full-width 180-bin argmax costs ~4.5 ms/step
        # @800px; the defer path resolves theta for top-k candidates only
        def body(images):
            _, (dec, neck) = model.apply(variables, images, train=False,
                                         decode="defer")
            return post_process_defer(dec, neck, 3, model.n_classes,
                                      conf, iou)
    else:
        def body(images):
            _, decoded = model.apply(variables, images, train=False,
                                     decode=True)
            return post_process_fixed(decoded, conf, iou)

    if input_shape is None:
        return jax.jit(body)

    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout

    # bf16 upload when the deploy graph computes in bf16 anyway: flax
    # promotes the input to the conv dtype BEFORE the first conv, so a
    # host-side cast is bit-identical — and the device-side convert (~0.5
    # ms/step fused into conv0) disappears along with half the DMA bytes
    in_dtype = (jnp.bfloat16 if model.dtype == jnp.bfloat16
                else jnp.float32)
    compiled = jax.jit(body, in_shardings=Format(Layout.AUTO)).lower(
        jax.ShapeDtypeStruct(input_shape, in_dtype)).compile()
    compiled.input_format = compiled.input_formats[0][0]
    compiled.input_dtype = in_dtype
    return compiled


def time_loop(fn, args_list, iters):
    import jax

    outs = []
    t0 = time.perf_counter()
    for i in range(iters):
        outs.append(fn(*args_list[i % len(args_list)]))
    jax.block_until_ready(outs)
    return time.perf_counter() - t0


def expand_batches(batches, iters, key0: int = 0, fmt=None):
    """Expand arg-tuples to ``iters`` device-perturbed unique copies.

    The axon tunnel DEDUPS repeat executions of an identical
    (executable, inputs) pair — a timing loop that cycles a small pool of
    pre-uploaded batches re-measures only the first pass and reports
    near-zero for the rest.  Each copy here gets unique content (+k*1e-7
    for floats, +k%5 for integer images) via a tiny on-device add, so
    every timed execution is real work.  Perturbed copies are re-put to
    ``fmt`` when the consumer was compiled with a custom input layout.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def bump(x, k):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x + (k * 1e-7).astype(x.dtype)
        return x + (k % 5).astype(x.dtype)

    out = []
    for i in range(iters):
        src = batches[i % len(batches)]
        k = jnp.float32(key0 + i + 1)
        tup = tuple(bump(x, k) for x in src)
        if fmt is not None:
            tup = tuple(jax.device_put(x, fmt) for x in tup)
        out.append(tup)
    jax.block_until_ready(out)
    return out


def rand_batches(n, batch, img, packed: bool = False, fmt=None,
                 dtype=None):
    import jax
    import jax.numpy as jnp

    from ryolo_tpu.nn.blocks import pack_input_s2d

    rng = np.random.default_rng(0)
    # distinct pre-uploaded inputs: pipelined dispatch overlaps the host
    # round-trip, and no runtime can dedupe repeated work.  With
    # ``packed``, the input pipeline's letterbox emits the 2x2
    # space-to-depth layout (same bytes) — see blocks.pack_input_s2d.
    # ``fmt``/``dtype``: upload in the step's chosen input layout/dtype
    # (detect_fn compiled with an AUTO input layout).
    def make(r):
        x = r.uniform(0, 1, (batch, img, img, 3)).astype(np.float32)
        x = pack_input_s2d(x) if packed else x
        return jnp.asarray(x, dtype) if dtype is not None else x

    if fmt is not None:
        batches = [(jax.device_put(make(rng), fmt),) for _ in range(n)]
    else:
        batches = [(jnp.asarray(make(rng)),) for _ in range(n)]
    jax.block_until_ready([b[0] for b in batches])
    return batches


def bench_eval_ips(model, variables, n_images: int = 48):
    """End-to-end eval throughput at BASELINE config 3 shape.

    Drives the full ``test.py`` stack — loader (letterbox), jit-fused
    forward+decode+post-process at the reference eval protocol (conf .001,
    NMS IoU .65, max_nms 5000, max_det 1500, ``/root/reference/
    test.py:167-222``), pipelined host matching — on a 15-class synthetic
    DOTA-shaped val split at 800px, batch 8.  Returns (img/s, mAP@.5).
    """
    import os
    import sys
    import tempfile

    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from make_synth_data import class_names, main as make_synth_data

    from ryolo_tpu.eval.evaluator import evaluate

    hyp = {"hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4, "rotate": 45,
           "translate": 0.1, "scale": 0.5, "flipud": 0.5, "fliplr": 0.5,
           "mosaic": 1.0, "mixup": 0.15}
    tmp = tempfile.mkdtemp(prefix="bench_eval_")
    make_synth_data(tmp, n_images=n_images, img_size=IMG, seed=1,
                    n_classes=NC - 1, max_obj=12)
    data = {"val": os.path.join(tmp, "val"),
            "names": class_names(NC - 1), "type": "custom"}
    n_val = max(n_images // 2, 2)

    # materialize the val set once: this 1-core host's cv2 decode+letterbox
    # runs ~0.6 s/img at 800px and would swamp the protocol measurement
    # (reported separately as the e2e rate)
    from ryolo_tpu.data.loader import load_data

    t0 = time.perf_counter()
    _, loader = load_data(data["val"], data["names"], data["type"], hyp,
                          csl=True, img_size=IMG, batch_size=BATCH,
                          augment=False, shuffle=False, max_targets=64,
                          image_uint8=True)  # device normalizes, bit-exact
    batches = [dict(b) for b in loader]
    load_s = time.perf_counter() - t0

    # pre-upload to device, same convention as the detect headline (the
    # axon tunnel moves the image batches at ~tens of MB/s — a
    # host-attached deployment pays none of that); upload time is charged
    # to the e2e number
    t0 = time.perf_counter()
    batches = [
        {k: jax.device_put(np.asarray(v)) for k, v in b.items()
         if k != "paths"}
        for b in batches
    ]
    jax.block_until_ready([list(b.values()) for b in batches])
    load_s += time.perf_counter() - t0

    # pre-upload the deploy-fused weights once (they fold on host as numpy;
    # evaluate() would otherwise pay the ~150 MB tunnel upload per call)
    variables = jax.device_put(variables)
    jax.block_until_ready(variables)

    # warm pass compiles the eval step
    evaluate(model, variables, None, data, hyp, csl=True, img_size=IMG,
             batch_size=BATCH, conf_thres=0.001, iou_thres=0.65,
             max_targets=64, progress=False, batches=batches)
    t0 = time.perf_counter()
    _, _, map50, _, _ = evaluate(
        model, variables, None, data, hyp, csl=True, img_size=IMG,
        batch_size=BATCH, conf_thres=0.001, iou_thres=0.65,
        max_targets=64, progress=False, batches=batches,
    )
    dt = time.perf_counter() - t0
    return n_val / dt, float(map50), n_val / (dt + load_s)


def device_ms_from_trace(trace_dir: str, steps: int):
    """Per-step device busy time (ms) from a jax.profiler Chrome trace.

    The wall-clock batch-1 latency through the axon tunnel is dominated by
    the host<->device RTT; deployments care about the on-device time.  Sums
    the union of op intervals on each device-track pid (the tensorboard
    plugin converter is broken in this env, so the trace.json.gz is read
    directly) and divides by the traced step count.
    """
    import glob
    import gzip
    import os

    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if any(k in n for k in ("TPU", "Tpu", "/device",
                                        "Device", "axon"))
                and "Host" not in n and "python" not in n.lower()}
    best = 0.0
    for pid in dev_pids:
        iv = sorted((e["ts"], e["ts"] + e.get("dur", 0)) for e in events
                    if e.get("ph") == "X" and e.get("pid") == pid)
        if not iv:
            continue
        busy, cur_s, cur_e = 0.0, iv[0][0], iv[0][1]
        for s, t in iv[1:]:
            if s > cur_e:
                busy += cur_e - cur_s
                cur_s, cur_e = s, t
            else:
                cur_e = max(cur_e, t)
        busy += cur_e - cur_s
        best = max(best, busy)
    if best <= 0:
        return None
    return best / 1000.0 / steps  # us -> ms, per step


def bench_nms(n_valid: int, iters: int = 16):
    """ms/img of the rotated-NMS kernel alone at a given candidate load.

    detect load: a trained detector above conf .7 yields tens of candidates;
    eval load: conf .001 fills the reference's max_nms=5000 cap
    (``lib/general.py:148``).  Boxes clustered so suppression does real work.
    """
    import jax
    import jax.numpy as jnp

    from ryolo_tpu.ops.rotated_nms import nms_rotated_masked

    K = 5000
    rng = np.random.default_rng(1)
    centers = rng.uniform(100, 700, (BATCH, K, 2))
    cluster = rng.integers(0, 50, (BATCH, K))  # overlap groups
    centers = centers * 0.2 + np.stack(
        [100 + 12.0 * cluster, 100 + 12.0 * (cluster % 7)], -1)
    wh = rng.uniform(20, 120, (BATCH, K, 2))
    ang = rng.uniform(-90, 90, (BATCH, K, 1))
    boxes = jnp.asarray(np.concatenate([centers, wh, ang], -1), jnp.float32)
    scores = jnp.asarray(np.sort(rng.uniform(0.1, 1, (BATCH, K)))[:, ::-1])
    valid = jnp.arange(K)[None, :] < n_valid

    @jax.jit
    def run(boxes, scores):
        return jax.vmap(
            lambda b, s: nms_rotated_masked(b, s, valid[0],
                                            jnp.float32(0.65),
                                            presorted=True)
        )(boxes, scores)

    jax.block_until_ready(run(boxes, scores))
    # unique inputs per iter (axon dedup); a constant score shift keeps
    # the descending presort, the box shift is ~1e-5 px
    dt = time_loop(run, expand_batches([(boxes, scores)], iters), iters)
    return dt / iters / BATCH * 1e3


def bench_train(img: int, batch: int, iters: int = 12,
                dtype_name: str = "f32"):
    """Training-step throughput: device-bound ceiling vs loader-fed.

    Reports img/s for the jitted train step on pre-uploaded batches (the
    TPU capability) and for the same step fed by the real cv2 input
    pipeline (mosaic+warp+HSV), whose difference is the input-stall
    fraction.  NOTE: this host exposes ONE CPU core; production TPU-VM
    hosts have >100 — the loader-fed number is a hard lower bound.
    """
    import tempfile

    import jax
    import jax.numpy as jnp

    from ryolo_tpu.data.loader import load_data
    from ryolo_tpu.geometry import csl_gaussian_labels_np
    from ryolo_tpu.losses import csl_loss
    from ryolo_tpu.nn import Yolo
    from ryolo_tpu.nn.yolo import STRIDES, make_anchors
    from ryolo_tpu.train.trainer import Trainer

    cfg = {
        "anchors": [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
                    [142, 110, 192, 243, 459, 401]],
        "angles": [-90, -60, -30, 0, 30, 60],
    }
    hyp = {"box": 0.05, "obj": 1.0, "cls": 0.5, "obj_pw": 1.0, "cls_pw": 1.0,
           "fl_gamma": 0.0, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
           "rotate": 45, "translate": 0.1, "scale": 0.5, "flipud": 0.5,
           "fliplr": 0.5, "mosaic": 1.0, "mixup": 0.15}
    nc = NC
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype_name]
    model = Yolo(n_classes=nc, model_config=cfg, mode="csl", ver="yolov7",
                 dtype=dtype)
    anchors = make_anchors(STRIDES, cfg["anchors"])

    def loss_fn(outputs, b):
        return csl_loss(outputs, b["tgt"], b["tgt_csl"], b["tgt_mask"],
                        anchors, nc, hyp)

    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)), train=False))
    trainer = Trainer(model, loss_fn, "SGD", 0.01)
    state = trainer.init_state(variables)

    # --- device-bound ceiling: pre-uploaded synthetic batches
    rng = np.random.default_rng(0)
    T = 64
    tgt = rng.uniform(0.2, 0.6, (batch, T, 6)).astype(np.float32)
    tgt[..., 0] = rng.integers(0, nc, (batch, T))
    tgt[..., 5] = rng.uniform(-np.pi / 2, np.pi / 2, (batch, T))
    bins = csl_gaussian_labels_np(
        tgt[..., 5] * 180 / np.pi + 90).reshape(batch, T, 180)
    base = {
        "tgt": jnp.asarray(tgt), "tgt_csl": jnp.asarray(bins),
        "tgt_mask": jnp.asarray(np.ones((batch, T), bool)),
    }
    device_batches = [
        dict(base, images=jnp.asarray(
            rng.uniform(0, 1, (batch, img, img, 3)), jnp.float32))
        for _ in range(4)
    ]
    lr, acc = jnp.float32(1e-4), jnp.int32(1)
    state, *_ = trainer.train_step(state, device_batches[0], lr, acc)  # compile
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for i in range(iters):
        state, loss, _ = trainer.train_step(
            state, device_batches[i % 4], lr, acc)
    jax.block_until_ready(state)
    dt_dev = time.perf_counter() - t0
    ips_device = batch * iters / dt_dev

    # --- loader-fed: real cv2 pipeline (mosaic4/9 + warp + HSV + flips)
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from make_synth_data import main as make_synth_data

    tmp = tempfile.mkdtemp(prefix="bench_train_")
    make_synth_data(tmp, n_images=batch * 4, img_size=img, seed=0)

    ips_pipeline = None
    try:
        _, loader = load_data(os.path.join(tmp, "train"), ["a", "b"],
                              "custom", hyp, csl=True, img_size=img,
                              batch_size=batch, augment=True, shuffle=True,
                              max_targets=T, drop_last=True)
        n_img = 0
        t0 = time.perf_counter()
        for epoch in range(max(1, iters // len(loader))):
            loader.set_epoch(epoch)
            for b in loader:
                arrays = {k: jnp.asarray(np.asarray(v))
                          for k, v in b.items() if k != "paths"}
                state, loss, _ = trainer.train_step(state, arrays, lr, acc)
                n_img += batch
        jax.block_until_ready(state)
        ips_pipeline = n_img / (time.perf_counter() - t0)
    except Exception as e:  # noqa: BLE001 -- report partial results
        print(f"# loader-fed bench failed: {e!r}")

    # --- loader-fed with DEVICE-SIDE augmentation + decoded-image cache:
    # the host emits render specs (decode + label math only); mosaic/warp/
    # HSV/mixup composite on device (ryolo_tpu/data/device_augment.py)
    from ryolo_tpu.data.device_augment import pick_method, render_batch

    render_method = pick_method(hyp, img)

    def run_epochs(dloader, bank, n_epochs, first_epoch):
        nonlocal state
        n_img = 0
        t0 = time.perf_counter()
        for epoch in range(first_epoch, first_epoch + n_epochs):
            dloader.set_epoch(epoch)
            for b in dloader:
                sa = {k: jnp.asarray(np.asarray(v))
                      for k, v in b.items() if k != "paths"}
                images = render_batch(sa, n_out=batch, bank=bank,
                                      method=render_method)
                arrays = {"images": images, "tgt": sa["tgt"],
                          "tgt_csl": sa["tgt_csl"],
                          "tgt_mask": sa["tgt_mask"]}
                state, loss, _ = trainer.train_step(state, arrays, lr, acc)
                n_img += batch
        jax.block_until_ready(state)
        return n_img / (time.perf_counter() - t0)

    ips_devaug = None
    try:
        _, dloader = load_data(os.path.join(tmp, "train"), ["a", "b"],
                               "custom", hyp, csl=True, img_size=img,
                               batch_size=batch, augment=True, shuffle=True,
                               max_targets=T, drop_last=True,
                               device_augment=True, cache_images=True)
        run_epochs(dloader, None, 1, 0)  # warm: compile + fill decode cache
        ips_devaug = run_epochs(dloader, None,
                                max(2, iters // len(dloader)), 1)
    except Exception as e:  # noqa: BLE001
        print(f"# device-aug loader bench failed: {e!r}")

    # --- loader-fed with the device-RESIDENT tile bank: the decoded train
    # split pins to HBM once; batches ship only (B, T) int32 bank rows +
    # spec scalars, so even a tunnel-attached 1-core host keeps the device
    # busy (the north-star input pipeline, SURVEY §7 step 5)
    ips_devcache = None
    try:
        cds, cloader = load_data(os.path.join(tmp, "train"), ["a", "b"],
                                 "custom", hyp, csl=True, img_size=img,
                                 batch_size=batch, augment=True,
                                 shuffle=True, max_targets=T,
                                 drop_last=True, device_augment=True,
                                 device_cache=True)
        bank = jax.device_put(cds.build_tile_bank())
        jax.block_until_ready(bank)
        run_epochs(cloader, bank, 1, 0)  # warm
        ips_devcache = run_epochs(cloader, bank,
                                  max(2, iters // len(cloader)), 1)
    except Exception as e:  # noqa: BLE001
        print(f"# device-cache loader bench failed: {e!r}")

    out = {
        "metric": f"train_img_per_sec_chip_{img}px_yolov7_csl_{dtype_name}",
        "value": round(ips_device, 2),
        "unit": "img/s",
        "device_bound_img_s": round(ips_device, 2),
        "loader_fed_img_s": round(ips_pipeline, 2) if ips_pipeline else None,
        "input_stall_frac": round(1 - ips_pipeline / ips_device, 3)
        if ips_pipeline else None,
        "loader_fed_devaug_img_s": round(ips_devaug, 2) if ips_devaug
        else None,
        "input_stall_frac_devaug": round(1 - ips_devaug / ips_device, 3)
        if ips_devaug else None,
        "loader_fed_devcache_img_s": round(ips_devcache, 2) if ips_devcache
        else None,
        "input_stall_frac_devcache": round(1 - ips_devcache / ips_device, 3)
        if ips_devcache else None,
        "host_cores": os.cpu_count(),
    }
    print(json.dumps(out))


def main():
    global BATCH, IMG
    parser = argparse.ArgumentParser()
    parser.add_argument("--dtype", choices=["f32", "bf16", "int8"],
                        default="bf16")
    parser.add_argument("--mode", choices=["csl", "kfiou"], default="csl")
    parser.add_argument("--ver", choices=["yolov4", "yolov5", "yolov7"],
                        default="yolov7")
    parser.add_argument("--no-deploy", action="store_true",
                        help="benchmark the unfused training-structure graph")
    parser.add_argument("--no-eval", action="store_true",
                        help="skip the end-to-end eval throughput drive")
    parser.add_argument("--no-packed-input", action="store_true",
                        help="feed plain NHWC instead of the S2D-packed "
                             "input layout (deploy v7/v4 default: packed)")
    parser.add_argument("--flops", action="store_true",
                        help="print XLA cost analysis of the forward and exit")
    parser.add_argument("--train", action="store_true",
                        help="benchmark the training step instead of detect")
    parser.add_argument("--breakdown", action="store_true",
                        help="time forward / +decode / +post-process stages")
    parser.add_argument("--img", type=int, default=IMG)
    parser.add_argument("--batch", type=int, default=BATCH)
    parser.add_argument("--profile", type=str, default="",
                        help="dump a jax profiler trace to this directory")
    parser.add_argument("--iters", type=int, default=48)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from ryolo_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    if args.train:
        bench_train(args.img, args.batch, dtype_name=args.dtype)
        return

    BATCH, IMG = args.batch, args.img

    packed = (not args.no_deploy and not args.no_packed_input
              and args.ver in ("yolov7", "yolov4"))
    model, variables = build_model(args.dtype, not args.no_deploy,
                                   mode=args.mode, ver=args.ver,
                                   packed=packed)

    if args.flops:
        def fwd(images):
            _, decoded = model.apply(variables, images, train=False,
                                     decode=True)
            return decoded

        in_shape = ((1, IMG // 2, IMG // 2, 12) if packed
                    else (1, IMG, IMG, 3))
        lowered = jax.jit(fwd).lower(
            jax.ShapeDtypeStruct(in_shape, jnp.float32))
        cost = lowered.cost_analysis()
        if cost is None:  # axon backend: only post-compile analysis works
            cost = lowered.compile().cost_analysis()
        print(json.dumps({
            "gflops_per_img": round(cost.get("flops", 0) / 1e9, 2),
            "hbm_gb_per_img": round(
                cost.get("bytes accessed", 0) / 1e9, 3),
        }))
        return

    if args.breakdown:
        from ryolo_tpu.eval.postprocess import post_process_fixed

        @jax.jit
        def fwd_only(images):
            outs = model.apply(variables, images, train=False, decode=False)
            return [o.sum() for o in outs]  # tiny reduce: no D2H of raw heads

        @jax.jit
        def fwd_decode(images):
            _, decoded = model.apply(variables, images, train=False,
                                     decode=True)
            return decoded.sum()

        full = detect_fn(model, variables, 0.7, 0.2)
        batches = rand_batches(4, BATCH, IMG, packed=packed)
        out = {}
        for name, fn in [("forward", fwd_only), ("fwd_decode", fwd_decode),
                         ("full_detect", full)]:
            jax.block_until_ready(fn(*batches[0]))
            dt = time_loop(fn, expand_batches(batches, args.iters),
                           args.iters)
            out[name + "_ms_batch"] = round(dt / args.iters * 1e3, 2)
        print(json.dumps(out))
        return

    in_shape = ((BATCH, IMG // 2, IMG // 2, 12) if packed
                else (BATCH, IMG, IMG, 3))
    detect_step = detect_fn(model, variables, 0.7, 0.2,
                            input_shape=in_shape)
    batches = rand_batches(8, BATCH, IMG, packed=packed,
                           fmt=detect_step.input_format,
                           dtype=detect_step.input_dtype)
    jax.block_until_ready(detect_step(*batches[0]))  # warmup + compile

    if args.profile:
        with jax.profiler.trace(args.profile):
            time_loop(detect_step, batches, 4)

    # best of 3 rounds: the remote-tunnel dispatch adds multi-percent
    # run-to-run noise; the fastest round is the least-perturbed measure
    # of the device program (each round is still `iters` full steps).
    # Every round gets its own device-perturbed unique inputs — the axon
    # tunnel dedups repeat executions of identical (program, inputs).
    dt = min(
        time_loop(detect_step,
                  expand_batches(batches, args.iters, key0=r * args.iters,
                                 fmt=detect_step.input_format),
                  args.iters)
        for r in range(3)
    )
    ips = BATCH * args.iters / dt

    # batch-1 latency (the reference's per-image timing contract,
    # /root/reference/detect.py:58-62)
    b1_shape = ((1, IMG // 2, IMG // 2, 12) if packed
                else (1, IMG, IMG, 3))
    detect_b1 = detect_fn(model, variables, 0.7, 0.2, input_shape=b1_shape)
    b1 = rand_batches(4, 1, IMG, packed=packed,
                      fmt=detect_b1.input_format,
                      dtype=detect_b1.input_dtype)
    jax.block_until_ready(detect_b1(*b1[0]))
    lat_iters = 16
    b1x = expand_batches(b1, lat_iters, fmt=detect_b1.input_format)
    t0 = time.perf_counter()
    for i in range(lat_iters):  # serialized: true latency, no pipelining
        jax.block_until_ready(detect_b1(*b1x[i]))
    lat_ms = (time.perf_counter() - t0) / lat_iters * 1e3

    # device-side b1 latency from a profiler trace (the wall number above
    # includes the axon-tunnel RTT; deployments care about on-device time)
    lat_dev_ms = None
    try:
        import tempfile

        trace_dir = tempfile.mkdtemp(prefix="bench_b1_trace_")
        b1t = expand_batches(b1, 4, key0=1000, fmt=detect_b1.input_format)
        with jax.profiler.trace(trace_dir):
            for i in range(4):
                jax.block_until_ready(detect_b1(*b1t[i]))
        lat_dev_ms = device_ms_from_trace(trace_dir, steps=4)
    except Exception as e:  # noqa: BLE001
        print(f"# b1 device-latency trace failed: {e!r}")

    nms_detect = bench_nms(n_valid=32)
    nms_eval = bench_nms(n_valid=5000)

    # full eval-protocol throughput at BASELINE config-3 shape (15-class
    # 800px, conf .001, max_det 1500) — VERDICT r2 item 3
    eval_ips = eval_map50 = eval_ips_e2e = None
    if IMG == 800 and args.mode == "csl" and not args.no_eval:
        try:
            if packed:
                emodel, evars = build_model(args.dtype, not args.no_deploy,
                                            mode=args.mode, ver=args.ver,
                                            packed=False)
            else:
                emodel, evars = model, variables
            eval_ips, eval_map50, eval_ips_e2e = bench_eval_ips(emodel, evars)
        except Exception as e:  # noqa: BLE001 -- keep the headline line
            print(f"# eval-ips bench failed: {e!r}")

    out = {
        "metric": f"images_per_sec_chip_{IMG}px_detect_{args.ver}_{args.mode}",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / A100_BASELINE_IPS, 3),
        "latency_b1_ms": round(lat_ms, 2),
        "latency_b1_device_ms": round(lat_dev_ms, 2) if lat_dev_ms else None,
        "nms_ms_img_detect": round(nms_detect, 3),
        "nms_ms_img_eval": round(nms_eval, 3),
        "dtype": args.dtype,
        "deploy": not args.no_deploy,
        "packed_input": packed,
    }
    if eval_ips is not None:
        out["eval_ips_800px"] = round(eval_ips, 2)
        out["eval_ips_800px_e2e_1core"] = round(eval_ips_e2e, 2)
        out["eval_map50_synth"] = round(eval_map50, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
