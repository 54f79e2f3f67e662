"""Op-level device-time breakdown of the flagship detect step.

Profiles the default bench configuration (yolov7-csl 800px b8, deploy-fused
bf16, packed input) for a few steps, aggregates per-op device time from the
jax.profiler Chrome trace, and annotates each hot fusion with its HLO
definition (root instruction + operand shapes) from the compiled module —
the map from "fusion.39 costs 1.9 ms" to "which conv/reduce that actually
is".  Analysis tool only; not part of the library.
"""

import argparse
import glob
import gzip
import json
import re
import sys
import tempfile
import time


def device_op_times(trace_dir, steps):
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
            nm = e.get("name", "")
            agg[nm] = agg.get(nm, 0.0) + e.get("dur", 0)
    return {k: v / 1000.0 / steps for k, v in agg.items()}  # ms/step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--hlo-out", default="/tmp/detect_hlo.txt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp  # noqa: F401

    sys.path.insert(0, "/root/repo")
    from ryolo_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    import bench

    packed = True
    model, variables = bench.build_model(args.dtype, True, packed=packed)
    from ryolo_tpu.eval.postprocess import post_process_fixed

    def step(images):
        _, decoded = model.apply(variables, images, train=False, decode=True)
        return post_process_fixed(decoded, 0.7, 0.2)

    batches = bench.rand_batches(4, bench.BATCH, bench.IMG, packed=packed)
    lowered = jax.jit(step).lower(*batches[0])
    compiled = lowered.compile()
    hlo = compiled.as_text()
    with open(args.hlo_out, "w") as f:
        f.write(hlo)

    fn = jax.jit(step)
    jax.block_until_ready(fn(*batches[0]))
    trace_dir = tempfile.mkdtemp(prefix="trace_ops_")
    with jax.profiler.trace(trace_dir):
        outs = [fn(*batches[i % 4]) for i in range(args.steps)]
        jax.block_until_ready(outs)

    times = device_op_times(trace_dir, args.steps)
    total = sum(times.values())
    print(f"total device {total:.2f} ms/step "
          f"({bench.BATCH / total * 1000:.1f} img/s device-bound)")

    # HLO definition lines: "  %fusion.39 = ... fusion(...), kind=..., calls=%..."
    defs = {}
    for m in re.finditer(
            r"^\s*(?:ROOT )?%?([\w.-]+)\s*=\s*(.+)$", hlo, re.M):
        defs[m.group(1)] = m.group(2)

    # fused computation bodies, to summarize what a fusion contains
    comp_ops = {}
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"^%?([\w.-]+)\s*\(.*\)\s*->.*{", line)
        if m:
            cur = m.group(1)
            comp_ops[cur] = []
        elif cur and "=" in line:
            om = re.search(r"=\s*\S+\s+(\w[\w-]*)\(", line)
            if om:
                comp_ops[cur].append(om.group(1))
        if line.strip() == "}":
            cur = None

    for name, ms in sorted(times.items(), key=lambda kv: -kv[1])[:args.top]:
        line = defs.get(name, "")
        ann = ""
        cm = re.search(r"calls=%?([\w.-]+)", line)
        if cm and cm.group(1) in comp_ops:
            ops = comp_ops[cm.group(1)]
            interesting = [o for o in ops if o in (
                "convolution", "dot", "reduce", "sort", "scatter", "gather",
                "transpose", "copy", "exponential", "logistic", "iota",
                "reduce-window", "pad", "concatenate", "reshape",
                "dynamic-slice", "dynamic-update-slice")]
            from collections import Counter
            ann = " | ops: " + ", ".join(
                f"{k}x{v}" for k, v in Counter(interesting).most_common(6))
        shape = line.split(" ")[0] if line else ""
        print(f"{ms:7.3f} ms  {ms/total*100:4.1f}%  {name:38s} {shape[:60]}"
              f"{ann}")
        # print conv shapes inside hot fusions
        if cm and cm.group(1) in comp_ops and ms > 0.3:
            body = hlo[hlo.find("%" + cm.group(1)):]
            body = body[:body.find("\n}")]
            for cl in re.finditer(r"^.*(convolution|sort|reduce)\(.*$",
                                  body, re.M):
                t = cl.group(0).strip()
                print(f"           >> {t[:160]}")


if __name__ == "__main__":
    main()
