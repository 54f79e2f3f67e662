"""Benchmark: images/sec/chip for the 800px detect path (BASELINE metric).

Runs the flagship inference configuration — YOLOv7 + CSL, 800 px, batch 8,
deploy-fused (BN folding + RepConv merge, ryolo_tpu/nn/deploy.py) jitted
forward+decode+fixed-shape rotated post-processing — on the available
accelerator and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N,
     "latency_b1_ms": ..., "nms_ms_img_detect": ..., "nms_ms_img_eval": ...,
     "train_ips": ..., "input_stall": ..., "eval_ips_800px": ...}

``vs_baseline`` divides by A100_BASELINE_IPS, the derived estimate of the
PyTorch reference's A100 throughput for the same config (the reference
publishes no numbers).  Full derivation in BASELINE.md §"A100 anchor
derivation"; in short: fp32-eager reference ⇒ A100 TF32 peak 156 TF/s ×
20-27 % eager utilization (published YOLOv7 V100 datapoint, batch-scaled)
÷ 190 GFLOP/img measured for this config (``python bench.py --flops``),
minus the reference's per-image Python NMS overhead ⇒ 140-195 img/s;
pinned at the midpoint.  Replace with a measured value if the reference
is ever run on an A100.

Memory discipline (the round-3 driver run died RESOURCE_EXHAUSTED inside
the old batch-expansion helper, which held ``iters`` perturbed device
copies at once):

  * The timed step takes a scalar ``k`` and perturbs the image ON DEVICE —
    only a 2-batch pool plus 4-byte scalars are ever resident.
  * The kfiou/eval/train/int8 stages run in SEQUENTIAL SUBPROCESSES: their
    weights/optimizer/tile-bank allocations are released by process exit,
    and a crash in any degrades to null fields instead of failing the
    headline.
  * The headline loop retries with halved iters/pool on RESOURCE_EXHAUSTED.

Wall-clock discipline (the round-4 driver run died rc=124 — timeout — with
an EMPTY tail, because sub-stages ran before the headline and the one JSON
line printed last):

  * The HEADLINE runs FIRST and its JSON line prints+flushes immediately.
  * Every later stage is gated on a global wall budget
    (``BENCH_WALL_BUDGET_S``, default 900 s) and runs under a timeout
    clamped to the remaining budget.
  * After each completed stage the full enriched JSON line is re-emitted
    (monotone supersets): whatever line is last in the tail is the
    best-known state, and a timeout at ANY point after the headline still
    leaves a parseable line.

Measurement discipline (the axon tunnel CANNOT be trusted to execute on
``block_until_ready`` — it has been observed to (a) dedup repeat
executions of an identical (program, inputs) pair and (b) return from
``block_until_ready`` in ~0 ms even for fresh inputs, materializing
results only on host fetch; an un-fetched loop once "measured" 307k
img/s):

  * Every timed step returns a checksum scalar that depends on its
    outputs AND on the previous step's checksum, which it also uses to
    perturb its input — so the steps form a data-dependence CHAIN and one
    final 4-byte host fetch forces every execution.
  * The chain seed is fresh OS entropy per round: no (program, inputs)
    pair ever repeats, within or across processes.
  * A physics guard rejects impossible numbers (one chip cannot beat
    peak-MXU img/s for a 185 GFLOP/img graph) and falls back to strict
    per-call fetches.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

A100_BASELINE_IPS = 165.0  # derived (BASELINE.md); round-1 guess was 120

# --- wall-clock discipline (the round-4 driver run died rc=124 with an
# EMPTY tail: sub-stages ran first, the JSON printed last, and ~35 min of
# finished measurements evaporated).  Invariant now engineered for: the
# driver invocation ALWAYS yields a parseable line.
#   * the HEADLINE stage runs first and its JSON line prints+flushes
#     immediately — a timeout at any later point still leaves it in the tail;
#   * every optional stage is gated on the remaining global budget and runs
#     with a timeout clamped to it;
#   * after each completed stage the full enriched JSON line is RE-emitted
#     (monotone supersets: whatever line is last is the best-known state).
_T0 = time.time()
WALL_BUDGET_S = float(os.environ.get("BENCH_WALL_BUDGET_S", "900"))


def remaining_budget() -> float:
    return WALL_BUDGET_S - (time.time() - _T0)


def emit(d: dict) -> None:
    """Print one JSON line and FLUSH: stdout is a pipe under the driver, and
    SIGTERM (timeout's first signal) kills python without draining the
    block buffer — an unflushed line is a lost round."""
    print(json.dumps(d), flush=True)

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
    # and eager init at 800px costs minutes on this host.  JIT the init:
    # eager flax init dispatches every op separately over the axon tunnel
    # (~100 ms RTT each -> minutes of build time, measured 280 s of the
    # proof run's 366 s startup); one jitted program runs in seconds and
    # persists in the compilation cache.  Values are identical (same
    # threefry streams, same math).
    variables = jax.jit(
        lambda k, x: model.init(k, x, train=False)
    )(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    variables = jax.device_get(variables)  # host numpy: fuse folds on host
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
        b = np.array(params["neck"][head]["conv"]["bias"])
        b[np.arange(na) * nf + obj_ch] = -6.0  # obj channel per anchor
        params["neck"][head]["conv"]["bias"] = b
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
             "int8": jnp.bfloat16}[dtype_name]
    if deploy:
        # int8: BN-backed convs on the int8 MXU (per-channel weights);
        # heads/stem/decode stay bf16/f32
        model, variables = fuse_for_inference(
            model, variables, dtype=dtype, quantize=dtype_name == "int8",
            packed_input=packed)
        if dtype_name == "int8":
            # calibrated static activation scales: kills the per-conv
            # dynamic max-reduce (one HBM pass + fusion barrier each)
            from ryolo_tpu.nn.blocks import pack_input_s2d
            from ryolo_tpu.nn.deploy import calibrate_static_scales

            rng = np.random.default_rng(42)

            def cal_batches(n=2):
                for _ in range(n):
                    x = rng.uniform(0, 1, (2, IMG, IMG, 3)).astype(
                        np.float32)
                    yield pack_input_s2d(x) if packed else x

            model, variables = calibrate_static_scales(model, variables,
                                                       cal_batches())
    elif dtype_name != "f32":
        model = model.clone(dtype=dtype)
    return model, variables


def detect_fn(model, variables, conf, iou, input_shape=None):
    """Jitted detect step ``fn(images, k) -> (dets, valid, chk)``.

    ``k`` is a device scalar the step adds (a ``k % 1`` ×1e-6 bump) to the
    image on device, and ``chk`` is a scalar that depends on BOTH ``k``
    and the detections.  Feeding each call's ``chk`` as the next call's
    ``k`` (see :func:`chain_loop`) makes the calls a data-dependence chain
    whose final 4-byte fetch forces every execution — the only timing the
    axon tunnel cannot fake (it dedups repeated inputs and does not
    reliably execute on ``block_until_ready``).  The bump fuses into the
    first conv's input read — not measurable; residency is one scalar.

    With ``input_shape`` the step is compiled with an AUTO input layout
    (XLA picks the conv-native tiling, killing the ~0.6 ms input retile
    copy) and the returned callable carries the chosen format as
    ``.input_format`` — upload batches with ``jax.device_put(x, fmt)``
    (same bytes; the DMA engine tiles).
    """
    import math

    import jax
    import jax.numpy as jnp

    from ryolo_tpu.eval.postprocess import (post_process_defer,
                                            post_process_kfiou_defer)

    def chk_out(k, dets):
        # strictly-increasing (never collides even with zero detections)
        # AND output-dependent; tiny vs the k%1 input bump
        s = jnp.nan_to_num(jnp.sum(dets[:, :4, :6]))
        return k + jnp.float32(1.0) + s * jnp.float32(1e-9)

    if model.mode == "csl":
        # deferred theta: the full-width 180-bin argmax costs ~4.5 ms/step
        # @800px; the defer path resolves theta for top-k candidates only
        def body(images, k):
            images = images + ((k % 1.0) * 1e-6).astype(images.dtype)
            _, (dec, neck) = model.apply(variables, images, train=False,
                                         decode="defer")
            dets, valid = post_process_defer(dec, neck, 3, model.n_classes,
                                             conf, iou)
            return dets, valid, chk_out(k, dets)
    else:
        # fully deferred decode: the 18-anchor head only computes
        # (conf, cls_id) full-width; boxes resolve for the top-k
        from ryolo_tpu.nn.yolo import STRIDES, make_rotated_anchors

        angles = [a * math.pi / 180 for a in model.model_config["angles"]]
        anchors = make_rotated_anchors(STRIDES,
                                       model.model_config["anchors"], angles)

        def body(images, k):
            images = images + ((k % 1.0) * 1e-6).astype(images.dtype)
            _, (scores, neck) = model.apply(variables, images, train=False,
                                            decode="defer")
            dets, valid = post_process_kfiou_defer(
                scores, neck, len(anchors[0]), anchors, STRIDES, conf, iou)
            return dets, valid, chk_out(k, dets)

    if input_shape is None:
        return jax.jit(body)

    from jax.experimental.layout import Format, Layout

    # bf16 upload when the deploy graph computes in bf16 anyway: flax
    # promotes the input to the conv dtype BEFORE the first conv, so a
    # host-side cast is bit-identical — and the device-side convert (~0.5
    # ms/step fused into conv0) disappears along with half the DMA bytes
    in_dtype = (jnp.bfloat16 if model.dtype == jnp.bfloat16
                else jnp.float32)
    compiled = jax.jit(body, in_shardings=Format(Layout.AUTO)).lower(
        jax.ShapeDtypeStruct(input_shape, in_dtype),
        jax.ShapeDtypeStruct((), jnp.float32)).compile()
    compiled.input_format = compiled.input_formats[0][0]
    compiled.input_dtype = in_dtype
    return compiled


def fresh_seed() -> float:
    """Fresh OS entropy as a float in [1, 4097): the chain-start scalar.

    ~8.4M distinct float32 values (1/2048 granularity): no timed
    (program, inputs) pair repeats within or across processes — the axon
    tunnel memoizes repeats to ~0 ms."""
    return 1.0 + int.from_bytes(os.urandom(4), "little") % (4096 * 2048) / 2048.0


def chain_loop(fn, batches, iters, seed=None, fetch_every: int = 0):
    """Time ``iters`` calls of ``fn(*batch, k) -> (..., chk)`` where each
    call's ``k`` is the previous call's ``chk`` — a data-dependence chain.

    The single ``float(chk)`` at the end forces EVERY execution: the axon
    tunnel cannot serve it from cache (fresh entropy seed) and cannot
    return it without running the whole chain (each step's input depends
    on the previous step's output).  Dispatches still flow asynchronously,
    so the wall time is device-execution bound, not host-RTT bound.

    ``fetch_every > 0``: strict mode — fetch the checksum every that many
    calls (an RTT-including upper bound the tunnel cannot fake even in
    principle; used when the chained number violates physics).
    """
    import jax.numpy as jnp

    chk = jnp.float32(seed if seed is not None else fresh_seed())
    t0 = time.perf_counter()
    for i in range(iters):
        *_, chk = fn(*batches[i % len(batches)], chk)
        if fetch_every and (i + 1) % fetch_every == 0:
            chk = jnp.float32(float(chk))
    assert np.isfinite(float(chk))  # forces the chain
    return time.perf_counter() - t0


def rand_batches(n, batch, img, packed: bool = False, fmt=None,
                 dtype=None):
    import jax
    import jax.numpy as jnp

    from ryolo_tpu.nn.blocks import pack_input_s2d

    rng = np.random.default_rng(0)
    # distinct pre-uploaded inputs: pipelined dispatch overlaps the host
    # round-trip.  With ``packed``, the input pipeline's letterbox emits
    # the 2x2 space-to-depth layout (same bytes) — see
    # blocks.pack_input_s2d.  ``fmt``/``dtype``: upload in the step's
    # chosen input layout/dtype (detect_fn compiled with an AUTO layout).
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


def free_arrays(*trees):
    """Release device buffers of the given pytrees (donated to the void).
    Keeps the bench's HBM footprint stage-local on an OOM-prone chip."""
    import jax

    for tree in trees:
        for leaf in jax.tree_util.tree_leaves(tree):
            if isinstance(leaf, jax.Array):
                try:
                    leaf.delete()
                except Exception:  # noqa: BLE001 -- already deleted/donated
                    pass


def is_oom(e: Exception) -> bool:
    return "RESOURCE_EXHAUSTED" in str(e) or "Resource exhausted" in str(e)


def bench_eval_ips(model, variables, n_images: int = 48):
    """End-to-end eval throughput at BASELINE config 3 shape.

    Drives the full ``test.py`` stack — loader (letterbox), jit-fused
    forward+decode+post-process at the reference eval protocol (conf .001,
    NMS IoU .65, max_nms 5000, max_det 1500, ``/root/reference/
    test.py:167-222``), pipelined host matching — on a 15-class synthetic
    DOTA-shaped val split at 800px, batch 8.  Returns (img/s, mAP@.5).
    """
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

    # pre-upload the IMAGES to device, same convention as the detect
    # headline (the axon tunnel moves image batches at ~tens of MB/s — a
    # host-attached deployment pays none of that); upload time is charged
    # to the e2e number.  Targets stay HOST-resident: the matcher needs
    # them back on host, and a device-resident target costs a blocking
    # D2H round-trip per batch inside the measured loop
    t0 = time.perf_counter()
    batches = [
        {k: (jax.device_put(np.asarray(v)) if k == "images"
             else np.asarray(v))
         for k, v in b.items() if k != "paths"}
        for b in batches
    ]
    jax.block_until_ready([b["images"] for b in batches])
    load_s += time.perf_counter() - t0

    # pre-upload the deploy-fused weights once (they fold on host as numpy;
    # evaluate() would otherwise pay the ~150 MB tunnel upload per call)
    variables = jax.device_put(variables)
    jax.block_until_ready(variables)

    # warm pass compiles the eval step (and is the mAP-of-record run: the
    # measured passes below run on perturbed pixels)
    _, _, map50, _, _ = evaluate(
        model, variables, None, data, hyp, csl=True, img_size=IMG,
        batch_size=BATCH, conf_thres=0.001, iou_thres=0.65,
        max_targets=64, progress=False, batches=batches)

    # measured run: PASSES repeats of the val split in ONE evaluate() call
    # (steady-state pipeline — a 3-batch run charges spin-up/drain to every
    # batch), each pass XOR-perturbed on device so no two (program, inputs)
    # executions repeat — the axon tunnel memoizes repeats ACROSS PROCESSES
    # and would otherwise serve cached results (module docstring; the warm
    # pass above already executed these exact batches)
    import jax.numpy as jnp

    PASSES = 3
    seedb = (int(fresh_seed()) % 251) | 1  # odd: (p+1)*seedb % 256 != 0
    measured = [
        {k: (v ^ jnp.uint8((p + 1) * seedb % 256) if k == "images" else v)
         for k, v in b.items()}
        for p in range(PASSES) for b in batches
    ]
    jax.block_until_ready([b["images"] for b in measured])
    t0 = time.perf_counter()
    evaluate(model, variables, None, data, hyp, csl=True, img_size=IMG,
             batch_size=BATCH, conf_thres=0.001, iou_thres=0.65,
             max_targets=64, progress=False, batches=measured)
    dt = time.perf_counter() - t0
    n_meas = n_val * PASSES
    return n_meas / dt, float(map50), n_meas / (dt + PASSES * load_s)


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
    def run(boxes, scores, k):
        # unique inputs per call (axon dedup): a ~1e-5 px on-device box
        # shift; scores untouched so the descending presort holds
        boxes = boxes + ((k % 1.0) * 1e-5).astype(boxes.dtype)
        order, keep = jax.vmap(
            lambda b, s: nms_rotated_masked(b, s, valid[0],
                                            jnp.float32(0.65),
                                            presorted=True)
        )(boxes, scores)
        chk = (k + 1.0
               + jnp.sum((order[:, :8] + keep[:, :8]).astype(jnp.float32))
               * 1e-9)
        return order, keep, chk

    *_, w = run(boxes, scores, jnp.float32(fresh_seed()))  # compile
    assert np.isfinite(float(w))
    dt = chain_loop(run, [(boxes, scores)], iters)
    return dt / iters / BATCH * 1e3


def bench_train(img: int, batch: int, iters: int = 12,
                dtype_name: str = "f32", mini: bool = False):
    """Training-step throughput: device-bound ceiling vs loader-fed.

    Reports img/s for the jitted train step on pre-uploaded batches (the
    TPU capability) and for the same step fed by the real cv2 input
    pipeline (mosaic+warp+HSV), whose difference is the input-stall
    fraction.  NOTE: this host exposes ONE CPU core; production TPU-VM
    hosts have >100 — the loader-fed number is a hard lower bound.

    No dedup-perturbation is needed here: the optimizer state is an input
    that CHANGES every step, so no two executions share input bytes.

    ``mini``: the default-bench subset — device-bound ceiling + the
    device-resident tile-bank loader (the north-star input pipeline) +
    an isolated renderer timing; skips the host-cv2 loader variants.
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

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))
    from make_synth_data import main as make_synth_data

    tmp = tempfile.mkdtemp(prefix="bench_train_")
    make_synth_data(tmp, n_images=batch * 4, img_size=img, seed=0)

    from ryolo_tpu.data.device_augment import pick_method, render_batch

    render_method = pick_method(hyp, img)

    # --- device-RESIDENT tile bank + ISOLATED renderer timing, on an
    # otherwise-empty chip: measured BEFORE the trainer state/executables
    # allocate (r4's in-bench isolated number read 413-476 ms/batch while
    # both the in-loop accounting and scripts/bench_render.py on an empty
    # chip said ~70 — the residency-loaded measure answered a question
    # nobody asks; the production renderer runs interleaved with the step,
    # and THAT cost is what input_stall already captures)
    cds = cloader = bank = None
    render_ms = None
    try:
        cds, cloader = load_data(os.path.join(tmp, "train"), ["a", "b"],
                                 "custom", hyp, csl=True, img_size=img,
                                 batch_size=batch, augment=True,
                                 shuffle=True, max_targets=64,
                                 drop_last=True, device_augment=True,
                                 device_cache=True)
        bank = jax.device_put(cds.build_tile_bank())
        jax.block_until_ready(bank)
        cloader.set_epoch(99)
        spec = next(iter(cloader))
        sa = {k: jnp.asarray(np.asarray(v)) for k, v in spec.items()
              if k != "paths"}
        # chained + fetch-forced (see module docstring): each iter's
        # HSV-gain bump derives from the previous image, so the final
        # 4-byte fetch forces all r_iters renders.  The bump must be
        # RELATIVE and above the f32 ulp of a ~1.0 gain (an additive
        # chk*1e-9 bump rounds to the SAME bits — the tunnel then dedups
        # every render and the loop measures RTT-bound checksum programs
        # instead — the ADVICE r3 below-ulp bug pattern).  The WHOLE
        # bump+render+checksum iteration is one jitted program: spelled
        # eagerly, its ~8 scalar ops each pay the ~100 ms axon tunnel
        # round-trip and the loop reads ~430 ms/batch for 21 ms of device
        # work (r5 profile, scripts/prof_hot.py render).
        def _chain_render(sa_, bank_, chk_):
            s_ = dict(sa_, spec_hsv=sa_["spec_hsv"]
                      * (1.0 + (chk_ % 97.0) * 1e-5))
            img_r = render_batch(s_, n_out=batch, bank=bank_,
                                 method=render_method)
            return img_r[0, 0, 0, 0].astype(jnp.float32) + (chk_ % 64.0) + 1

        chain_render = jax.jit(_chain_render)
        r_iters = 8
        chk = chain_render(sa, bank, jnp.float32(fresh_seed()))  # compile
        assert np.isfinite(float(chk))
        t0 = time.perf_counter()
        for _ in range(r_iters):
            chk = chain_render(sa, bank, chk)
        assert np.isfinite(float(chk))
        render_ms = (time.perf_counter() - t0) / r_iters * 1e3
    except Exception as e:  # noqa: BLE001
        print(f"# device-cache bank/renderer setup failed: {e!r}",
              file=sys.stderr)

    # jitted init: eager flax init pays a tunnel RTT per op (see build_model)
    variables = dict(jax.jit(
        lambda k, x: model.init(k, x, train=False)
    )(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
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
    n_pool = 2 if mini else 4
    # images pre-uploaded in the model's compute dtype: the first conv
    # casts to it anyway (bit-identical), the in-step full-res convert
    # (profiled ~4 ms/step @800px) disappears, and upload bytes halve
    device_batches = [
        dict(base, images=jnp.asarray(
            rng.uniform(0, 1, (batch, img, img, 3)).astype(np.float32),
            dtype))
        for _ in range(n_pool)
    ]
    lr, acc = jnp.float32(1e-4), jnp.int32(1)
    # the optimizer state CHAINS the steps (each input includes the
    # previous step's output), so one final loss fetch forces every
    # execution — block_until_ready alone is not trusted on the axon
    # tunnel (see module docstring); no dedup is possible either since
    # no two steps share input bytes
    state, loss, _ = trainer.train_step(state, device_batches[0], lr,
                                        acc)  # compile
    assert np.isfinite(float(loss))

    t0 = time.perf_counter()
    for i in range(iters):
        state, loss, _ = trainer.train_step(
            state, device_batches[i % n_pool], lr, acc)
    assert np.isfinite(float(loss))  # forces the chain
    dt_dev = time.perf_counter() - t0
    ips_device = batch * iters / dt_dev

    ips_pipeline = None
    if not mini:
        # --- loader-fed: real cv2 pipeline (mosaic4/9 + warp + HSV + flips)
        try:
            _, loader = load_data(os.path.join(tmp, "train"), ["a", "b"],
                                  "custom", hyp, csl=True, img_size=img,
                                  batch_size=batch, augment=True,
                                  shuffle=True, max_targets=T,
                                  drop_last=True)
            n_img = 0
            t0 = time.perf_counter()
            for epoch in range(max(1, iters // len(loader))):
                loader.set_epoch(epoch)
                for b in loader:
                    arrays = {k: jnp.asarray(np.asarray(v))
                              for k, v in b.items() if k != "paths"}
                    state, loss, _ = trainer.train_step(state, arrays, lr,
                                                        acc)
                    n_img += batch
            assert np.isfinite(float(loss))  # forces the state chain
            ips_pipeline = n_img / (time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001 -- report partial results
            print(f"# loader-fed bench failed: {e!r}", file=sys.stderr)

    # --- loader-fed with DEVICE-SIDE augmentation + decoded-image cache:
    # the host emits render specs (decode + label math only); mosaic/warp/
    # HSV/mixup composite on device (ryolo_tpu/data/device_augment.py)
    def run_epochs(dloader, bank, n_epochs, first_epoch):
        # render + step as ONE jitted dispatch per batch
        # (trainer.train_step_rendered): the spec arrays ride the call as
        # numpy.  Spelled as eager per-array uploads + two dispatches, the
        # loop paid ~50 ms/batch of tunnel round-trips on top of the ~84 ms
        # of device work (r5: 58 img/s measured vs the 87 ms/batch device
        # floor) — and the optimizer-state chain still forces every step.
        nonlocal state
        n_img = 0
        t0 = time.perf_counter()
        for epoch in range(first_epoch, first_epoch + n_epochs):
            dloader.set_epoch(epoch)
            for b in dloader:
                sa = {k: np.asarray(v) for k, v in b.items()
                      if k != "paths"}
                state, loss, _ = trainer.train_step_rendered(
                    state, sa, bank, lr, acc, batch, render_method)
                n_img += batch
        assert np.isfinite(float(loss))  # forces the state chain
        return n_img / (time.perf_counter() - t0)

    ips_devaug = None
    if not mini:
        try:
            _, dloader = load_data(os.path.join(tmp, "train"), ["a", "b"],
                                   "custom", hyp, csl=True, img_size=img,
                                   batch_size=batch, augment=True,
                                   shuffle=True, max_targets=T,
                                   drop_last=True, device_augment=True,
                                   cache_images=True)
            run_epochs(dloader, None, 1, 0)  # warm: compile + decode cache
            ips_devaug = run_epochs(dloader, None,
                                    max(2, iters // len(dloader)), 1)
        except Exception as e:  # noqa: BLE001
            print(f"# device-aug loader bench failed: {e!r}",
                  file=sys.stderr)

    # --- loader-fed with the device-RESIDENT tile bank: the decoded train
    # split pins to HBM once; batches ship only (B, T) int32 bank rows +
    # spec scalars, so even a tunnel-attached 1-core host keeps the device
    # busy (the north-star input pipeline, SURVEY §7 step 5).  The bank and
    # loader were built (and the isolated renderer timed) before the
    # trainer allocated — see the top of this function.
    ips_devcache = None
    try:
        if cloader is None:
            raise RuntimeError("device-cache loader setup failed earlier")
        run_epochs(cloader, bank, 1, 0)  # warm
        ips_devcache = run_epochs(cloader, bank,
                                  max(2, iters // len(cloader)), 1)
    except Exception as e:  # noqa: BLE001
        print(f"# device-cache loader bench failed: {e!r}", file=sys.stderr)

    out = {
        "metric": f"train_img_per_sec_chip_{img}px_yolov7_csl_{dtype_name}",
        "value": round(ips_device, 2),
        "unit": "img/s",
        "train_ips": round(ips_device, 2),
        "train_ips_loader": round(ips_devcache, 2) if ips_devcache else None,
        "input_stall": round(1 - ips_devcache / ips_device, 3)
        if ips_devcache else None,
        # what the loader-fed loop actually pays per batch on top of the
        # step (renderer + dispatch gaps), by accounting
        "render_gap_ms_acct": round(
            batch * 1e3 * (1 / ips_devcache - 1 / ips_device), 2)
        if ips_devcache else None,
        "render_ms_batch": round(render_ms, 2) if render_ms else None,
        "render_method": render_method,
        "loader_fed_img_s": round(ips_pipeline, 2) if ips_pipeline else None,
        "input_stall_frac": round(1 - ips_pipeline / ips_device, 3)
        if ips_pipeline else None,
        "loader_fed_devaug_img_s": round(ips_devaug, 2) if ips_devaug
        else None,
        "input_stall_frac_devaug": round(1 - ips_devaug / ips_device, 3)
        if ips_devaug else None,
        "host_cores": os.cpu_count(),
    }
    emit(out)


def run_stage(stage: str, args, timeout: float = 2400) -> dict:
    """Run a bench stage in a SEQUENTIAL subprocess and return its JSON.

    Process exit releases every device allocation the stage made (weights,
    optimizer state, tile bank, step-cache executables), so stages cannot
    crowd each other out of HBM; a stage crash degrades to null fields
    instead of failing the whole bench (round-3 driver run died rc=1).
    """
    import subprocess

    if stage == "int8":
        # full headline path at --dtype int8 (calibrated static scales),
        # in its own process so the quantized weights/executables release
        # before the bf16 headline compiles
        cmd = [sys.executable, os.path.abspath(__file__), "--dtype",
               "int8", "--mode", args.mode, "--ver", args.ver,
               "--img", str(args.img), "--batch", str(args.batch),
               "--no-train", "--no-eval", "--headline-only",
               "--iters", str(args.iters)]
    elif stage == "kfiou":
        # the reference's co-equal second mode (/root/reference/train.py:255,
        # lib/loss.py:334): same headline protocol, 18-anchor deferred decode
        cmd = [sys.executable, os.path.abspath(__file__), "--dtype",
               args.dtype, "--mode", "kfiou", "--ver", args.ver,
               "--img", str(args.img), "--batch", str(args.batch),
               "--no-train", "--no-eval", "--headline-only",
               "--iters", str(args.iters)]
    else:
        cmd = [sys.executable, os.path.abspath(__file__), "--stage", stage,
               "--dtype", args.dtype, "--mode", args.mode, "--ver",
               args.ver, "--img", str(args.img), "--batch",
               str(args.batch)]
        if args.no_deploy:
            cmd.append("--no-deploy")
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout)
        stdout, rc = p.stdout, p.returncode
    except subprocess.TimeoutExpired as e:
        # salvage whatever the child flushed before the kill (children emit
        # their JSON with flush=True, so a finished measurement survives)
        stdout = (e.stdout or b"")
        stdout = stdout.decode() if isinstance(stdout, bytes) else stdout
        rc = "timeout"
    except Exception as e:  # noqa: BLE001 -- stage failures are non-fatal
        print(f"# stage {stage} failed: {e!r}", flush=True)
        return {}
    for line in reversed((stdout or "").strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    print(f"# stage {stage} produced no JSON (rc={rc})", flush=True)
    return {}


def stage_eval(args) -> None:
    """Subprocess body: eval-protocol throughput, one JSON line."""
    # the eval loader emits plain NHWC; build the unpacked model
    model, variables = build_model(args.dtype, not args.no_deploy,
                                   mode=args.mode, ver=args.ver,
                                   packed=False)
    eval_ips, eval_map50, eval_ips_e2e = bench_eval_ips(model, variables)
    emit({
        "eval_ips_800px": round(eval_ips, 2),
        "eval_ips_800px_e2e_1core": round(eval_ips_e2e, 2),
        "eval_map50_synth": round(eval_map50, 4),
    })


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
                        help="skip the end-to-end eval throughput stage")
    parser.add_argument("--no-train", action="store_true",
                        help="skip the train-step throughput stage")
    parser.add_argument("--no-packed-input", action="store_true",
                        help="feed plain NHWC instead of the S2D-packed "
                             "input layout (deploy v7/v4 default: packed)")
    parser.add_argument("--flops", action="store_true",
                        help="print XLA cost analysis of the forward and exit")
    parser.add_argument("--train", action="store_true",
                        help="benchmark the training step instead of detect")
    parser.add_argument("--breakdown", action="store_true",
                        help="time forward / +decode / +post-process stages")
    parser.add_argument("--stage", choices=["train-mini", "eval"],
                        default="", help=argparse.SUPPRESS)  # internal
    parser.add_argument("--img", type=int, default=IMG)
    parser.add_argument("--batch", type=int, default=BATCH)
    parser.add_argument("--headline-only", action="store_true",
                        help="skip the b1-latency and NMS microbenches "
                             "(used by the int8 sub-stage)")
    parser.add_argument("--profile", type=str, default="",
                        help="dump a jax profiler trace to this directory")
    # 96 chained steps/round: the round's single forced fetch carries a
    # few-hundred-ms tunnel overhead — amortize it below ~2% of the round
    parser.add_argument("--iters", type=int, default=96)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from ryolo_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    BATCH, IMG = args.batch, args.img

    if args.train or args.stage == "train-mini":
        bench_train(args.img, args.batch, dtype_name="bf16"
                    if args.stage else args.dtype,
                    mini=args.stage == "train-mini")
        return
    if args.stage == "eval":
        stage_eval(args)
        return

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
        @jax.jit
        def fwd_only(images, k):
            images = images + ((k % 1.0) * 1e-6).astype(images.dtype)
            outs = model.apply(variables, images, train=False, decode=False)
            # tiny reduce: no D2H of raw heads; chains via chk
            chk = k + 1.0 + sum(o.sum().astype(jnp.float32)
                                for o in outs) * 1e-9
            return chk,

        @jax.jit
        def fwd_decode(images, k):
            images = images + ((k % 1.0) * 1e-6).astype(images.dtype)
            _, decoded = model.apply(variables, images, train=False,
                                     decode=True)
            return k + 1.0 + decoded.sum().astype(jnp.float32) * 1e-9,

        full = detect_fn(model, variables, 0.7, 0.2)
        batches = rand_batches(2, BATCH, IMG, packed=packed)
        out = {}
        for name, fn in [("forward", fwd_only), ("fwd_decode", fwd_decode),
                         ("full_detect", full)]:
            *_, w = fn(*batches[0], jnp.float32(fresh_seed()))
            assert np.isfinite(float(w))  # compile + forced warm
            dt = chain_loop(fn, batches, args.iters)
            out[name + "_ms_batch"] = round(dt / args.iters * 1e3, 2)
        print(json.dumps(out))
        return

    in_shape = ((BATCH, IMG // 2, IMG // 2, 12) if packed
                else (BATCH, IMG, IMG, 3))
    detect_step = detect_fn(model, variables, 0.7, 0.2,
                            input_shape=in_shape)

    # headline timing with RESOURCE_EXHAUSTED retry: residency is just the
    # pool (2 × ~31 MB batches) + a 4-byte chain scalar, but the driver
    # chip may be shared — halve the load until it fits
    iters, pool = args.iters, 2
    suspect = False
    while True:
        try:
            batches = rand_batches(pool, BATCH, IMG, packed=packed,
                                   fmt=detect_step.input_format,
                                   dtype=detect_step.input_dtype)
            *_, w = detect_step(*batches[0], jnp.float32(fresh_seed()))
            assert np.isfinite(float(w))  # compile + forced warm execution

            if args.profile:
                with jax.profiler.trace(args.profile):
                    chain_loop(detect_step, batches, 4)

            # best of 3 chained rounds (fresh entropy seed each): the
            # remote-tunnel dispatch adds multi-percent run-to-run noise;
            # the fastest round is the least-perturbed measure of the
            # device program (each round is still `iters` FORCED steps —
            # see chain_loop)
            dt = min(chain_loop(detect_step, batches, iters)
                     for _ in range(3))
            # physics guard: a 185 GFLOP/img (@800px; conv cost scales
            # with area) graph cannot beat ~5400 img/s even at a
            # hypothetical 1 PF/s chip — an impossible number means the
            # tunnel faked the chain; fall back to strict per-call
            # fetches (RTT-including upper bound the tunnel cannot fake
            # even in principle)
            if BATCH * iters / dt > 1e15 / (185e9 * (IMG / 800) ** 2):
                print("# headline violates physics; strict per-call fetch")
                suspect = True
                dt = min(chain_loop(detect_step, batches, iters,
                                    fetch_every=1) for _ in range(2))
            break
        except Exception as e:  # noqa: BLE001
            if not is_oom(e) or iters <= 6:
                raise
            free_arrays(locals().get("batches"))
            iters //= 2
            pool = max(pool // 2, 2)
            print(f"# headline RESOURCE_EXHAUSTED; retrying iters={iters} "
                  f"pool={pool}")
            import gc

            gc.collect()
    ips = BATCH * iters / dt
    free_arrays(batches)

    out = {
        "metric": f"images_per_sec_chip_{IMG}px_detect_{args.ver}_{args.mode}",
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(ips / A100_BASELINE_IPS, 3),
        "dtype": args.dtype,
        "deploy": not args.no_deploy,
        "packed_input": packed,
        "timed_iters": iters,
        "strict_timing_fallback": suspect,
        "headline_wall_s": round(time.time() - _T0, 1),
    }
    if args.headline_only:
        emit(out)
        return

    # THE headline line, on the record immediately: everything after this
    # point is budget-gated enrichment, and each completed stage RE-emits
    # the full (superset) line — a driver timeout at any later moment still
    # leaves the best-known state as the last parseable line.
    emit(out)

    # --- budget-gated sub-stages, sequential subprocesses (allocations die
    # with the process; a crash degrades to null fields).  Ordered by
    # round-mandate value; estimates are warm-cache costs — a cold compile
    # overruns into the clamped timeout instead of hanging the bench.
    def merge_stage(name: str, est_s: float, enabled: bool, rename=None):
        if not enabled:
            return
        if remaining_budget() < est_s:
            print(f"# stage {name} skipped: {remaining_budget():.0f}s "
                  f"budget left < {est_s:.0f}s estimate", flush=True)
            return
        res = run_stage(name, args,
                        timeout=max(60.0, remaining_budget() - 20.0))
        if not res:
            return
        if rename:
            res = {rename[k]: v for k, v in res.items() if k in rename}
        else:
            for k in ("metric", "value", "unit"):  # keep headline identity
                res.pop(k, None)
        out.update(res)
        emit(out)

    gate = IMG == 800 and args.mode == "csl" and args.dtype == "bf16"
    merge_stage("kfiou", 300, gate and not args.no_deploy,
                rename={"value": "kfiou_ips",
                        "vs_baseline": "kfiou_vs_baseline"})
    merge_stage("eval", 300, IMG == 800 and args.mode == "csl"
                and not args.no_eval)
    merge_stage("train-mini", 360, IMG == 800 and args.mode == "csl"
                and not args.no_train)
    # the int8 deploy path (calibrated static activation scales) beats
    # bf16 on this graph (528 vs 508 img/s measured 2026-08-19); bf16
    # stays the headline because the BASELINE per-detection parity bar
    # (1e-3 skew-IoU) only holds for it — int8 is mAP-parity gated
    # instead (tests/test_trained_parity.py)
    merge_stage("int8", 240, gate and not args.no_deploy,
                rename={"value": "int8_ips",
                        "vs_baseline": "int8_vs_baseline"})

    # --- batch-1 latency + NMS microbenches, in-process (need the model).
    # Last: they re-measure stable quantities (the reference's per-image
    # timing contract, /root/reference/detect.py:58-62).
    if remaining_budget() < 120:
        print(f"# b1/nms microbenches skipped: {remaining_budget():.0f}s "
              "budget left", flush=True)
        out["total_wall_s"] = round(time.time() - _T0, 1)
        emit(out)
        return
    try:
        b1_shape = ((1, IMG // 2, IMG // 2, 12) if packed
                    else (1, IMG, IMG, 3))
        detect_b1 = detect_fn(model, variables, 0.7, 0.2,
                              input_shape=b1_shape)
        b1 = rand_batches(2, 1, IMG, packed=packed,
                          fmt=detect_b1.input_format,
                          dtype=detect_b1.input_dtype)
        lat_iters = 16
        *_, w = detect_b1(*b1[0], jnp.float32(fresh_seed()))
        assert np.isfinite(float(w))  # compile + forced warm execution
        # the chain serializes execution by data dependence (step i+1
        # cannot start before step i's checksum exists) with a single final
        # fetch — true b1 latency without the tunnel's per-fetch RTT
        lat_ms = chain_loop(detect_b1, b1, lat_iters) / lat_iters * 1e3
        out["latency_b1_ms"] = round(lat_ms, 2)

        # device-side b1 latency from a profiler trace (the wall number
        # above still includes per-dispatch tunnel overhead; deployments
        # care about on-device time)
        try:
            import tempfile

            trace_dir = tempfile.mkdtemp(prefix="bench_b1_trace_")
            with jax.profiler.trace(trace_dir):
                chain_loop(detect_b1, b1, 4)
            lat_dev_ms = device_ms_from_trace(trace_dir, steps=4)
            if lat_dev_ms:
                out["latency_b1_device_ms"] = round(lat_dev_ms, 2)
        except Exception as e:  # noqa: BLE001
            print(f"# b1 device-latency trace failed: {e!r}", flush=True)
        free_arrays(b1)

        out["nms_ms_img_detect"] = round(bench_nms(n_valid=32), 3)
        out["nms_ms_img_eval"] = round(bench_nms(n_valid=5000), 3)
    except Exception as e:  # noqa: BLE001 -- enrichment is non-fatal
        print(f"# b1/nms microbenches failed: {e!r}", flush=True)
    out["total_wall_s"] = round(time.time() - _T0, 1)
    emit(out)


if __name__ == "__main__":
    main()
