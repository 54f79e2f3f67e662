"""Microbench: device-side augmentation renderer, canvas vs pallas warp.

Times `render_batch` on real banked loader specs (the production
device-cache train input path) on the attached TPU, and cross-checks the
Pallas MXU warp kernel against the canvas gather renderer on the same
batch.  Run from the repo root:

    python scripts/bench_render.py [--img 800] [--batch 8] [--iters 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=800)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--no-check", action="store_true")
    ap.add_argument("--methods", default="canvas,pallas",
                    help="comma-separated renderer methods to time "
                         "(the canvas gather path costs minutes of remote "
                         "compile; pass --methods pallas to skip it)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from make_synth_data import main as make_synth
    from ryolo_tpu.data.device_augment import render_batch
    from ryolo_tpu.data.loader import load_data

    hyp = {"box": 0.05, "obj": 1.0, "cls": 0.5, "obj_pw": 1.0,
           "cls_pw": 1.0, "fl_gamma": 0.0, "hsv_h": 0.015, "hsv_s": 0.7,
           "hsv_v": 0.4, "rotate": 45, "translate": 0.1, "scale": 0.5,
           "flipud": 0.5, "fliplr": 0.5, "mosaic": 1.0, "mixup": 0.15}

    tmp = f"/tmp/bench_render_{args.img}"
    if not os.path.exists(os.path.join(tmp, "train")):
        make_synth(tmp, n_images=16, img_size=args.img, seed=0)

    ds, loader = load_data(os.path.join(tmp, "train"), ["a", "b"],
                           "custom", hyp, csl=True, img_size=args.img,
                           batch_size=args.batch, augment=True,
                           shuffle=True, max_targets=64, drop_last=True,
                           device_augment=True, device_cache=True)
    bank = jax.device_put(ds.build_tile_bank())
    jax.block_until_ready(bank)
    print(f"bank {bank.shape} on {bank.device}", flush=True)

    batch = next(iter(loader))
    sa = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()
          if k != "paths"}
    jax.block_until_ready(sa)
    n_specs = sa["spec_minv"].shape[0]
    print(f"spec batch: {n_specs} specs @ {args.img}px", flush=True)

    # chained + fetch-forced: each iter's HSV-gain bump derives from the
    # previous image and the chain seed is fresh OS entropy, so the single
    # final 4-byte fetch forces every execution — the axon tunnel dedups
    # repeated inputs and does not reliably execute on block_until_ready
    # (see bench.py module docstring).  The bump is RELATIVE and above the
    # f32 ulp of a ~1.0 gain: an additive chk*1e-9 bump rounds to the same
    # bits, the renders dedup, and the loop measures RTT-bound checksum
    # programs instead (the ADVICE r3 below-ulp bug pattern).
    outs = {}
    for method in args.methods.split(","):
        img = render_batch(sa, n_out=args.batch, bank=bank, method=method)
        # compile + forced warm; kept for the cross-check — the timed
        # loop's chained HSV bumps differ between methods, so its last
        # frames are NOT comparable across methods
        outs[method] = np.asarray(img)

        # the WHOLE bump+render+checksum iteration is ONE jitted program:
        # spelled eagerly, its ~8 scalar ops each pay the ~100 ms axon
        # tunnel round-trip and the loop reads ~430 ms/batch for ~21 ms of
        # device work (r5 profile, scripts/prof_hot.py render)
        def _chain(sa_, bank_, chk_, method=method):
            s_ = dict(sa_, spec_hsv=sa_["spec_hsv"]
                      * (1.0 + (chk_ % 97.0) * 1e-5))
            im = render_batch(s_, n_out=args.batch, bank=bank_,
                              method=method)
            return im[0, 0, 0, 0].astype(jnp.float32) + (chk_ % 64.0) + 1

        chain = jax.jit(_chain)
        chk = jnp.float32(
            1 + int.from_bytes(os.urandom(4), "little") % (1 << 23)
            / 2048.0)
        chk = chain(sa, bank, chk)  # compile the chained program
        assert np.isfinite(float(chk))
        t0 = time.perf_counter()
        for _k in range(args.iters):
            chk = chain(sa, bank, chk)
        assert np.isfinite(float(chk))  # forces the chain
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{method:8s} {ms:8.2f} ms/batch "
              f"({args.batch / ms * 1e3:7.1f} img/s renderer-only)",
              flush=True)

    if not args.no_check and len(outs) == 2:
        d = np.abs(outs["canvas"] * 255.0 - outs["pallas"] * 255.0)
        print(f"cross-check: max|diff| {d.max():.3f} "
              f"(u8 units), {(d > 0).mean():.2e} pixels differ", flush=True)
        assert d.max() <= 1.0


if __name__ == "__main__":
    main()
