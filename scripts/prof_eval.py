"""Where does the eval pipeline's wall time go? (VERDICT r4 weak #4)

Runs the bench eval configuration (yolov7+CSL deploy-fused, 800px, B8,
conf .001 / IoU .65, synthetic DOTA-shaped val split, pre-uploaded
images) but instruments each pipeline phase separately:

  * device: the jitted eval step alone, chained via a checksum fetch
    (same discipline as bench.py — the axon tunnel cannot fake it);
  * fetch:  the per-batch (dets, valid) device_get;
  * matcher: get_batch_statistics on the fetched outputs (host, 1 core);
  * e2e:    the real evaluate() loop for reference.

Usage: python scripts/prof_eval.py [--n-images 48]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=48)
    args = ap.parse_args()

    from ryolo_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from bench import BATCH, IMG, NC, build_model, fresh_seed
    from make_synth_data import class_names, main as make_synth_data
    from ryolo_tpu.data.loader import load_data
    from ryolo_tpu.eval.evaluator import (_eval_step_fn, evaluate,
                                          padded_targets_to_rows)
    from ryolo_tpu.eval.metrics import get_batch_statistics

    import tempfile

    model, variables = build_model("bf16", True, packed=False)
    variables = jax.device_put(variables)
    jax.block_until_ready(variables)

    hyp = {"mosaic": 1.0, "mixup": 0.15}
    tmp = tempfile.mkdtemp(prefix="prof_eval_")
    make_synth_data(tmp, n_images=args.n_images, img_size=IMG, seed=1,
                    n_classes=NC - 1, max_obj=12)
    data = {"val": os.path.join(tmp, "val"),
            "names": class_names(NC - 1), "type": "custom"}

    _, loader = load_data(data["val"], data["names"], data["type"], hyp,
                          csl=True, img_size=IMG, batch_size=BATCH,
                          augment=False, shuffle=False, max_targets=64,
                          image_uint8=True)
    batches = [dict(b) for b in loader]
    batches = [
        {k: (jax.device_put(np.asarray(v)) if k == "images"
             else np.asarray(v))
         for k, v in b.items() if k != "paths"}
        for b in batches
    ]
    jax.block_until_ready([b["images"] for b in batches])
    n_batches = len(batches)
    n_img = n_batches * BATCH

    step = _eval_step_fn(model, None, 0.001, 0.65, 5000, 1500)

    # warm/compile
    out0 = step(variables, batches[0])
    jax.block_until_ready(out0)

    # --- phase 1: device step alone, serialized by fetching each batch's
    # valid-count scalar (tiny) — forces execution per batch
    t0 = time.perf_counter()
    outs = []
    for b in batches:
        dets, valid, _ = step(variables, b)
        outs.append((dets, valid))
    # force all (small fetch of last valid suffices only for the last; fetch
    # each valid's sum to force every program)
    forced = [int(np.asarray(v.sum())) for _, v in outs]
    dt_device = time.perf_counter() - t0
    print(f"device+dispatch: {dt_device / n_batches * 1e3:.1f} ms/batch "
          f"({n_img / dt_device:.1f} img/s) kept/img="
          f"{sum(forced) / n_img:.0f}")

    # --- phase 2: fetch cost (dets+valid device_get per batch, outputs
    # already computed above so this times pure D2H)
    t0 = time.perf_counter()
    host_outs = []
    for dets, valid in outs:
        d, v = jax.device_get((dets, valid))
        host_outs.append((np.asarray(d), np.asarray(v)))
    dt_fetch = time.perf_counter() - t0
    print(f"fetch (dets+valid): {dt_fetch / n_batches * 1e3:.1f} ms/batch")

    # --- phase 3: host matcher alone
    stats = []
    t0 = time.perf_counter()
    for i, (d, v) in enumerate(host_outs):
        outputs_list = [d[b][v[b]] for b in range(BATCH)]
        rows = padded_targets_to_rows(batches[i]["tgt"],
                                      batches[i]["tgt_mask"], IMG)
        stats += get_batch_statistics(outputs_list, rows,
                                      np.linspace(0.5, 0.95, 10), 10)
    dt_match = time.perf_counter() - t0
    print(f"matcher (host): {dt_match / n_batches * 1e3:.1f} ms/batch "
          f"({dt_match / n_img * 1e3:.2f} ms/img)")

    # --- e2e reference: the real pipelined evaluate()
    evaluate(model, variables, None, data, hyp, csl=True, img_size=IMG,
             batch_size=BATCH, conf_thres=0.001, iou_thres=0.65,
             max_targets=64, progress=False, batches=batches)
    t0 = time.perf_counter()
    evaluate(model, variables, None, data, hyp, csl=True, img_size=IMG,
             batch_size=BATCH, conf_thres=0.001, iou_thres=0.65,
             max_targets=64, progress=False, batches=batches)
    dt = time.perf_counter() - t0
    print(f"evaluate() e2e: {dt / n_batches * 1e3:.1f} ms/batch "
          f"({n_img / dt:.1f} img/s)")


if __name__ == "__main__":
    main()
