"""Profile a detect-step variant and print labeled top ops (analysis tool).

Usage: python scripts/prof_step.py [rows|cols] [--top N]
"""

import argparse
import glob
import gzip
import json
import re
import sys
import tempfile


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", choices=["rows", "defer"])
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()

    sys.path.insert(0, "/root/repo")
    from ryolo_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import bench
    from ryolo_tpu.eval.postprocess import post_process_defer, \
        post_process_fixed

    model, variables = bench.build_model(args.dtype, True, packed=True)

    import jax.numpy as jnp

    if args.variant == "rows":
        def step(images, k):
            images = images + ((k % 1.0) * 1e-6).astype(images.dtype)
            _, dec = model.apply(variables, images, train=False, decode=True)
            dets, valid = post_process_fixed(dec, 0.7, 0.2)
            chk = k + 1.0 + jnp.nan_to_num(dets[:, :4, :6].sum()) * 1e-9
            return dets, valid, chk

        fn = jax.jit(step)
        batches = bench.rand_batches(2, 8, 800, packed=True)
        hlo = fn.lower(batches[0][0],
                       jnp.float32(0.0)).compile().as_text()
    else:  # the bench configuration: defer decode + AUTO input layout
        fn = bench.detect_fn(model, variables, 0.7, 0.2,
                             input_shape=(8, 400, 400, 12))
        batches = bench.rand_batches(2, 8, 800, packed=True,
                                     fmt=fn.input_format,
                                     dtype=fn.input_dtype)
        hlo = fn.as_text()
    open(f"/tmp/{args.variant}_hlo.txt", "w").write(hlo)
    *_, w = fn(*batches[0], jnp.float32(bench.fresh_seed()))
    assert float(w) == float(w)  # compile + forced warm execution
    td = tempfile.mkdtemp(prefix=f"prof_{args.variant}_")
    with jax.profiler.trace(td):
        bench.chain_loop(fn, batches, 6)

    paths = glob.glob(td + "/**/*.trace.json.gz", recursive=True)
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
    agg = {k: v / 6000.0 for k, v in agg.items() if not k.startswith("jit_")}

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

    tot = sum(agg.values())
    print(f"total {tot:.2f} ms/step ({8 / tot * 1000:.0f} img/s)")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]:
        c = calls.get(name)
        lbl = ""
        if c and comp_meta.get(c):
            lbl = comp_meta[c][0][:110]
        elif name in direct:
            lbl = direct[name][:110]
        print(f"{ms:7.3f}  {name:34s} {lbl}")


if __name__ == "__main__":
    main()
