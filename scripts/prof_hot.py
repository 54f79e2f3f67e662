"""Per-op device profiles for the non-detect hot paths (analysis tool).

Usage: python scripts/prof_hot.py {train|eval|render|kfiou} [--top N]

Traces a few chained, fetch-forced steps of the chosen path on the
attached TPU and prints a per-op device-time table labeled with HLO
op_name metadata — the same treatment scripts/prof_step.py gives the
detect headline (VERDICT r3: the train step, eval step and Pallas
renderer never got one).
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def device_op_table(trace_dir: str, steps: int):
    """Aggregate device-track op durations (ms/step) from a trace dir."""
    paths = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if any(k in n for k in ("TPU", "Tpu", "/device", "Device",
                                        "axon"))
                and "Host" not in n and "python" not in n.lower()}
    agg = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            agg[e.get("name", "")] = agg.get(e.get("name", ""), 0.0) \
                + e.get("dur", 0)
    return {k: v / (1000.0 * steps) for k, v in agg.items()
            if not k.startswith("jit_") and not k.isdigit()}


def hlo_labels(hlo: str):
    """op name -> source op_name label, from HLO text (see prof_step.py)."""
    import re

    calls = dict(re.findall(
        r"%([\w.-]+) = [^\n]*? fusion\([^\n]*?calls=%([\w.-]+)", hlo))
    comp_meta = {}
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"^%([\w.-]+) \(", line)
        if m:
            cur = m.group(1)
            comp_meta[cur] = []
        elif cur is not None:
            om = re.search(r'op_name="[^/"]+/([^"]+)"', line)
            if om:
                comp_meta[cur].append(om.group(1))
        if line.strip() == "}":
            cur = None
    direct = {m.group(1): m.group(2) for m in re.finditer(
        r"%([\w.-]+) = [^\n]*?metadata=\{op_name=\"[^/\"]+/([^\"]+)\"", hlo)}
    labels = {}
    for name, comp in calls.items():
        if comp_meta.get(comp):
            labels[name] = comp_meta[comp][0]
    for name, lbl in direct.items():
        labels.setdefault(name, lbl)
    return labels


def print_table(agg, top: int, batch: int, hlo: str = ""):
    labels = hlo_labels(hlo) if hlo else {}
    tot = sum(agg.values())
    print(f"total {tot:.2f} ms/step ({batch / tot * 1000:.0f} img/s)")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:8.3f}  {name:34s} {labels.get(name, '')[:100]}")


HYP = {"box": 0.05, "obj": 1.0, "cls": 0.5, "obj_pw": 1.0, "cls_pw": 1.0,
       "fl_gamma": 0.0, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
       "rotate": 45, "translate": 0.1, "scale": 0.5, "flipud": 0.5,
       "fliplr": 0.5, "mosaic": 1.0, "mixup": 0.15}


def prof_train(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from ryolo_tpu.geometry import csl_gaussian_labels_np
    from ryolo_tpu.losses import csl_loss
    from ryolo_tpu.nn import Yolo
    from ryolo_tpu.nn.yolo import STRIDES, make_anchors
    from ryolo_tpu.train.trainer import Trainer

    cfg = {"anchors": [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
                       [142, 110, 192, 243, 459, 401]],
           "angles": [-90, -60, -30, 0, 30, 60]}
    nc = 16
    model = Yolo(n_classes=nc, model_config=cfg, mode="csl", ver="yolov7",
                 dtype=jnp.bfloat16)
    anchors = make_anchors(STRIDES, cfg["anchors"])

    def loss_fn(outputs, b):
        return csl_loss(outputs, b["tgt"], b["tgt_csl"], b["tgt_mask"],
                        anchors, nc, HYP)

    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)), train=False))
    trainer = Trainer(model, loss_fn, "SGD", 0.01)
    state = trainer.init_state(variables)

    rng = np.random.default_rng(0)
    B, T, img = args.batch, 64, args.img
    tgt = rng.uniform(0.2, 0.6, (B, T, 6)).astype(np.float32)
    tgt[..., 0] = rng.integers(0, nc, (B, T))
    tgt[..., 5] = rng.uniform(-np.pi / 2, np.pi / 2, (B, T))
    bins = csl_gaussian_labels_np(
        tgt[..., 5] * 180 / np.pi + 90).reshape(B, T, 180)
    batches = [
        {"images": jnp.asarray(
            rng.uniform(0, 1, (B, img, img, 3)).astype(np.float32),
            jnp.bfloat16),
         "tgt": jnp.asarray(tgt), "tgt_csl": jnp.asarray(bins),
         "tgt_mask": jnp.asarray(np.ones((B, T), bool))}
        for _ in range(2)
    ]
    lr, acc = jnp.float32(1e-4), jnp.int32(1)
    state, loss, _ = trainer.train_step(state, batches[0], lr, acc)
    assert np.isfinite(float(loss))

    steps = 4
    td = tempfile.mkdtemp(prefix="prof_train_")
    with jax.profiler.trace(td):
        for i in range(steps):
            state, loss, _ = trainer.train_step(state, batches[i % 2], lr,
                                                acc)
        assert np.isfinite(float(loss))  # forces the chain
    # .lower on the jit object does not descriptor-bind self; pass it
    hlo = Trainer.train_step.lower(trainer, state, batches[0], lr,
                                   acc).compile().as_text()
    print_table(device_op_table(td, steps), args.top, args.batch, hlo)


def prof_eval(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from ryolo_tpu.eval.evaluator import _eval_step_fn

    model, variables = bench.build_model("bf16", True, packed=False)
    variables = jax.device_put(variables)
    step = _eval_step_fn(model, None, 0.001, 0.65, 5000, 1500)

    rng = np.random.default_rng(0)
    B, T, img = args.batch, 64, args.img
    tgt = rng.uniform(0.2, 0.6, (B, T, 6)).astype(np.float32)
    batches = [
        {"images": jnp.asarray(
            rng.integers(0, 255, (B, img, img, 3)), jnp.uint8),
         "tgt": jnp.asarray(tgt),
         "tgt_mask": jnp.asarray(np.ones((B, T), bool))}
        for _ in range(2)
    ]
    dets, valid, _ = step(variables, batches[0])
    n = int(np.asarray(valid).sum())
    print(f"warm: {n} detections kept")

    steps = 4
    td = tempfile.mkdtemp(prefix="prof_eval_")
    with jax.profiler.trace(td):
        chk = 0.0
        for i in range(steps):
            b = dict(batches[i % 2])
            # chain: bump the image by the previous checksum (uint8-safe)
            b["images"] = (b["images"]
                           + jnp.uint8(jnp.mod(chk, 3.0).astype(jnp.uint8)))
            dets, valid, _ = step(variables, b)
            chk = dets[0, 0, 0] + (chk % 64.0) + 1.0
        assert np.isfinite(float(chk))
    hlo = step.lower(variables, batches[0]).compile().as_text()
    print_table(device_op_table(td, steps), args.top, args.batch, hlo)


def prof_render(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from make_synth_data import main as make_synth
    from ryolo_tpu.data.device_augment import render_batch
    from ryolo_tpu.data.loader import load_data

    tmp = f"/tmp/bench_render_{args.img}"
    if not os.path.exists(os.path.join(tmp, "train")):
        make_synth(tmp, n_images=16, img_size=args.img, seed=0)
    ds, loader = load_data(os.path.join(tmp, "train"), ["a", "b"],
                           "custom", HYP, csl=True, img_size=args.img,
                           batch_size=args.batch, augment=True,
                           shuffle=True, max_targets=64, drop_last=True,
                           device_augment=True, device_cache=True)
    bank = jax.device_put(ds.build_tile_bank())
    jax.block_until_ready(bank)
    batch = next(iter(loader))
    sa = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()
          if k != "paths"}
    jax.block_until_ready(list(sa.values()))

    method = args.method
    img = render_batch(sa, n_out=args.batch, bank=bank, method=method)
    _ = np.asarray(img[0, 0, :4])  # compile + forced warm

    steps = 4
    td = tempfile.mkdtemp(prefix=f"prof_render_{method}_")
    t0 = time.perf_counter()
    with jax.profiler.trace(td):
        chk = jnp.float32(1.0)
        for _ in range(steps):
            # relative above-ulp bump: an additive 1e-9 bump rounds to the
            # same f32 bits and the tunnel dedups the renders
            s = dict(sa, spec_hsv=sa["spec_hsv"]
                     * (1.0 + (chk % 97.0) * 1e-5))
            img = render_batch(s, n_out=args.batch, bank=bank,
                               method=method)
            chk = img[0, 0, 0, 0].astype(jnp.float32) + (chk % 64.0) + 1
        assert np.isfinite(float(chk))
    wall = (time.perf_counter() - t0) / steps * 1e3
    print(f"wall {wall:.1f} ms/batch ({method})")
    from ryolo_tpu.data.device_augment import render_specs_banked

    hlo = ""
    try:
        common = (sa["spec_region"], sa["spec_offset"], sa["spec_hsv"],
                  sa["spec_minv"], sa["spec_flip"], sa["spec_mix_idx"],
                  sa["spec_mix_r"])
        hlo = render_specs_banked.lower(
            bank, sa["spec_tile_idx"], *common, n_out=args.batch,
            method=method).compile().as_text()
    except Exception as e:  # noqa: BLE001
        print(f"# hlo labeling failed: {e!r}")
    print_table(device_op_table(td, steps), args.top, args.batch, hlo)


def prof_kfiou(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    model, variables = bench.build_model("bf16", True, mode="kfiou",
                                         packed=True)
    fn = bench.detect_fn(model, variables, 0.7, 0.2,
                         input_shape=(args.batch, args.img // 2,
                                      args.img // 2, 12))
    batches = bench.rand_batches(2, args.batch, args.img, packed=True,
                                 fmt=fn.input_format, dtype=fn.input_dtype)
    *_, w = fn(*batches[0], jnp.float32(bench.fresh_seed()))
    assert np.isfinite(float(w))
    td = tempfile.mkdtemp(prefix="prof_kfiou_")
    with jax.profiler.trace(td):
        bench.chain_loop(fn, batches, 6)
    print_table(device_op_table(td, 6), args.top, args.batch, fn.as_text())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path", choices=["train", "eval", "render", "kfiou"])
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--img", type=int, default=800)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--method", default="pallas",
                    help="render method (render path only)")
    args = ap.parse_args()

    from ryolo_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    {"train": prof_train, "eval": prof_eval, "render": prof_render,
     "kfiou": prof_kfiou}[args.path](args)


if __name__ == "__main__":
    main()
