"""Deploy-time parameter fusion: BN folding, RepConv merge, Implicit absorb.

Produces an inference-only model whose graph is pure ``conv(+bias) -> act``:

  * every ``ConvBlock``'s BatchNorm is folded into the conv kernel/bias
    (``y = γ·(Wx − μ)/√(σ²+ε) + β``  ⇒  ``W' = W·γ/√(σ²+ε)``,
    ``b' = β − μ·γ/√(σ²+ε)``);
  * each ``RepConv`` (3×3-BN + 1×1-BN + identity-BN, RepVGG) collapses into
    ONE biased 3×3 conv — the deploy-time fusion the reference leaves
    unimplemented (``/root/reference/model/utils.py:189-215``);
  * the YOLOv7 head's ``ImplicitA`` (additive, before a 1×1 conv) and
    ``ImplicitM`` (multiplicative, after it) priors
    (``/root/reference/model/neck.py:189-216``) are absorbed into that conv:
    ``(W(x+a)+b)·m = (W·m)x + (b + Wa)·m``.

All folds are exact linear-algebra identities (computed in float64, stored
float32), so deployed forward == training-graph ``train=False`` forward up
to float rounding.  Use for every inference path (detect/test/bench): it
removes every BN and two of three RepConv branches from the compiled graph.
"""

from __future__ import annotations

from typing import Any, Mapping, Tuple

import numpy as np

BN_EPS = 1e-5  # ryolo_tpu.nn.blocks.ConvBlock / RepConv


def _np64(x):
    return np.asarray(x, np.float64)


def _fold_conv_bn(conv: Mapping, bn: Mapping, bn_stats: Mapping) -> dict:
    """Fold BatchNorm (inference form) into the preceding conv (HWIO)."""
    scale = _np64(bn["scale"]) / np.sqrt(_np64(bn_stats["var"]) + BN_EPS)
    kernel = _np64(conv["kernel"]) * scale  # broadcast over O axis
    bias = _np64(bn["bias"]) - _np64(bn_stats["mean"]) * scale
    if "bias" in conv:
        bias = bias + _np64(conv["bias"]) * scale
    return {"kernel": np.float32(kernel), "bias": np.float32(bias)}


def _bn_only(bn: Mapping, bn_stats: Mapping):
    """Identity-branch BN as (per-channel scale, bias)."""
    scale = _np64(bn["scale"]) / np.sqrt(_np64(bn_stats["var"]) + BN_EPS)
    bias = _np64(bn["bias"]) - _np64(bn_stats["mean"]) * scale
    return scale, bias


def _fuse_repconv(p: Mapping, s: Mapping) -> dict:
    """RepVGG merge: 3×3-BN + center-padded 1×1-BN + diag identity-BN."""
    dense = _fold_conv_bn(p["dense_conv"], p["dense_bn"], s["dense_bn"])
    px = _fold_conv_bn(p["px_conv"], p["px_bn"], s["px_bn"])
    kernel = _np64(dense["kernel"])
    kh, kw = kernel.shape[:2]
    ch, cw = kh // 2, kw // 2
    kernel[ch, cw] += _np64(px["kernel"])[0, 0]
    bias = _np64(dense["bias"]) + _np64(px["bias"])
    if "id_bn" in p:  # identity branch exists iff c1 == c2 and stride 1
        scale, ibias = _bn_only(p["id_bn"], s["id_bn"])
        cin = kernel.shape[2]
        kernel[ch, cw] += np.eye(cin) * scale  # W[c,c,o... (i==o)·γ/√σ²
        bias = bias + ibias
    return {"fused": {"kernel": np.float32(kernel), "bias": np.float32(bias)}}


def _absorb_implicit(conv: Mapping, ia: np.ndarray, im: np.ndarray) -> dict:
    """Absorb ImplicitA/M priors around a 1×1 biased conv (exact: no pad)."""
    kernel = _np64(conv["kernel"])  # (1, 1, I, O)
    assert kernel.shape[:2] == (1, 1), "Implicit priors wrap 1x1 head convs"
    a = _np64(ia).reshape(-1)   # (I,)
    m = _np64(im).reshape(-1)   # (O,)
    bias = (_np64(conv["bias"]) + a @ kernel[0, 0]) * m
    return {"kernel": np.float32(kernel * m), "bias": np.float32(bias)}


def _is_convblock(node: Mapping) -> bool:
    return "conv" in node and "bn" in node


def _walk(params: Mapping, stats: Mapping, folded=None, path=()) -> dict:
    """Fold BN into convs; record folded paths in ``folded`` (BN-backed
    convs and RepConvs are the int8-quantizable set — head convs have no
    BN and are structurally indistinguishable in the output tree)."""
    out = {}
    for name, node in params.items():
        sub_stats = stats.get(name, {}) if isinstance(stats, Mapping) else {}
        if not isinstance(node, Mapping):
            out[name] = np.asarray(node)
        elif "dense_conv" in node:
            out[name] = _fuse_repconv(node, sub_stats)
            if folded is not None:
                folded.add(path + (name, "repconv"))
        elif _is_convblock(node):
            out[name] = {"conv": _fold_conv_bn(node["conv"], node["bn"],
                                               sub_stats["bn"])}
            if folded is not None:
                folded.add(path + (name,))
        elif "implicit" in node:
            continue  # ImplicitA/M: folded by the neck post-pass below
        else:
            out[name] = _walk(node, sub_stats, folded, path + (name,))
    return out


# YOLOv7 neck head triples: ImplicitA -> 1x1 conv -> ImplicitM
_V7_HEADS = (("ia1", "conv5", "im1"), ("ia2", "conv6", "im2"),
             ("ia3", "conv7", "im3"))

# Blocks whose cv1/cv2 are two parallel 1×1 convs over the SAME input
# (ELAN1/ELAN2, CSP, C3, SPPCSPC — see blocks.parallel_cv12); at deploy
# time they pack into one conv "cv12" with output-channel-concatenated
# kernels.  Listed explicitly per architecture because the pattern is
# structural, not inferable from param shapes alone (MaxConv's cv1/cv2
# have identical shapes but consume DIFFERENT inputs and must not merge).
# entry = (part, name, swap): swap=True stores [cv2 | cv1] so the conv
# CHAIN consumer (ELAN's cv2 output) is the lane-aligned prefix slice —
# must mirror the ``swap`` argument at blocks.parallel_cv12 call sites
_CV12_MERGE_PATHS = {
    "yolov4": [("backbone", f"csp{i}", False) for i in range(1, 6)],
    "yolov5": [("backbone", f"csp{i}", False) for i in range(1, 5)]
    + [("neck", f"csp{i}", False) for i in range(1, 5)],
    "yolov7": [("backbone", f"elan{i}", True) for i in range(1, 5)]
    + [("backbone", "spp", False)]
    + [("neck", f"elan{i}", True) for i in range(1, 5)],
}


def _merge_cv12(fused: dict, ver: str, folded=None) -> None:
    """Pack parallel cv1/cv2 pairs into one conv (in place, exact)."""
    for part, name, swap in _CV12_MERGE_PATHS.get(ver, ()):
        node = fused.get(part, {}).get(name)
        if node is None or "cv1" not in node or "cv2" not in node:
            continue
        c1, c2 = node.pop("cv1")["conv"], node.pop("cv2")["conv"]
        if swap:
            c1, c2 = c2, c1
        node["cv12"] = {"conv": {
            "kernel": np.concatenate([c1["kernel"], c2["kernel"]], axis=-1),
            "bias": np.concatenate([c1["bias"], c2["bias"]], axis=-1),
        }}
        if folded is not None:
            folded.discard((part, name, "cv1"))
            folded.discard((part, name, "cv2"))
            folded.add((part, name, "cv12"))


QUANT_MIN_CH = 256  # must mirror blocks.ConvBlock.QUANT_MIN_CH


def _quantizable(kernel) -> bool:
    """int8 only where the MXU is the bottleneck (see ConvBlock)."""
    return (kernel.shape[2] >= QUANT_MIN_CH
            and kernel.shape[3] >= QUANT_MIN_CH)


def _quantize_node(conv: Mapping) -> dict:
    """f32 {kernel, bias} -> int8 {kernel_q, wscale, bias} (per-O-channel
    symmetric; matches ConvBlock's quantized apply)."""
    k = _np64(conv["kernel"])  # (kh, kw, I, O)
    wscale = np.maximum(np.abs(k).max(axis=(0, 1, 2)), 1e-12) / 127.0
    kq = np.clip(np.round(k / wscale), -127, 127).astype(np.int8)
    return {"kernel_q": kq, "wscale": np.float32(wscale),
            "bias": np.float32(conv["bias"])}


def _quantize_fused(fused: dict, folded) -> None:
    """Convert the wide BN-backed convs to the int8 layout (in place)."""
    for path in folded:
        node = fused
        if path and path[-1] == "repconv":
            for p in path[:-2]:
                node = node.get(p, {})
            rep = node.get(path[-2])
            if rep is None or "fused" not in rep:
                continue
            if not _quantizable(rep["fused"]["kernel"]):
                continue
            q = _quantize_node(rep.pop("fused"))
            rep["fused_q"] = q["kernel_q"]
            rep["wscale"] = q["wscale"]
            rep["bias"] = q["bias"]
            continue
        for p in path[:-1]:
            node = node.get(p, {})
        leaf = node.get(path[-1])
        if leaf is None or "conv" not in leaf:
            continue  # e.g. rewritten into the s2d stem
        if not _quantizable(leaf["conv"]["kernel"]):
            continue
        node[path[-1]] = _quantize_node(leaf.pop("conv"))


def _s2d_scatter_packed(w: np.ndarray) -> np.ndarray:
    """3x3 stride-1 conv kernel -> 3x3 kernel on the 2x2-packed input grid.

    With input packed ``xp[P, Q, (u·2+v)·C + c] = x[2P+u, 2Q+v, c]``
    (``blocks.pack_input_s2d``), the original ``out[2I+a, 2J+b, o] =
    Σ W[di,dj,c,o]·x[2I+a+di-1, ...]`` becomes a 3×3 STRIDE-1 conv on the
    packed grid producing output channel ``(a·2+b)·O + o`` (the same S2D
    packing of the original output as the 4×4 form): tap
    ``dp = ⌊(a+di-1)/2⌋ ∈ {-1,0,1}``, input phase ``u = (a+di-1) mod 2``.
    K = 9·4·C reduction lanes (108 for C=3) instead of 48.
    """
    kh, kw, cin, cout = w.shape
    K = np.zeros((3, 3, 4 * cin, 4 * cout), np.float64)
    for a in range(2):
        for di in range(kh):
            t = a + di - 1
            u, dp = t % 2, t // 2  # floor division: dp in {-1, 0, 1}
            for b in range(2):
                for dj in range(kw):
                    s_ = b + dj - 1
                    v, dq = s_ % 2, s_ // 2
                    g_in = (u * 2 + v) * cin
                    g_out = (a * 2 + b) * cout
                    K[dp + 1, dq + 1, g_in:g_in + cin,
                      g_out:g_out + cout] = w[di, dj]
    return K


def _s2d_scatter_s1(w: np.ndarray) -> np.ndarray:
    """3x3 stride-1 conv kernel -> 4x4 stride-2 kernel on the raw input.

    ``out[2i+a, 2j+b, c] = Σ W[di,dj,k,c]·in[2i+a+di-1, ...]`` becomes a
    4x4 stride-2 conv with (1,2) padding whose output channel ``(a*2+b)·C
    + c`` is the 2x2 space-to-depth packing of the original output:
    kernel tap ``s = a + di`` (zero where di falls outside 3x3).  Operating
    on the raw input avoids any device-side S2D relayout copy.
    """
    kh, kw, cin, cout = w.shape
    K = np.zeros((4, 4, cin, 4 * cout), np.float64)
    for s in range(4):
        for a in range(2):
            di = s - a
            if not 0 <= di < kh:
                continue
            for t in range(4):
                for b in range(2):
                    dj = t - b
                    if not 0 <= dj < kw:
                        continue
                    g_out = (a * 2 + b) * cout
                    K[s, t, :, g_out:g_out + cout] = w[di, dj]
    return K


def _s2d_scatter_s2(w: np.ndarray) -> np.ndarray:
    """3x3 stride-2 conv kernel -> 2x2 kernel consuming the S2D grid.

    ``out[i, j, c] = Σ W[di,dj,k,c]·mid[2i+di-1, ...]`` becomes a 2x2 conv
    with (1,0)-asymmetric padding over midS, taps ``di = 2·dp + u - 1``.
    """
    kh, kw, cin, cout = w.shape
    K = np.zeros((2, 2, 4 * cin, cout), np.float64)
    for dp in range(2):
        for u in range(2):
            di = 2 * dp + u - 1
            if not 0 <= di < kh:
                continue
            for dq in range(2):
                for v in range(2):
                    dj = 2 * dq + v - 1
                    if not 0 <= dj < kw:
                        continue
                    g_in = (u * 2 + v) * cin
                    K[dp, dq, g_in:g_in + cin, :] = w[di, dj]
    return K


def _maybe_s2d_stem(fused_backbone: dict, packed_input: bool = False) -> None:
    """Rewrite the detector stem on the 2x2 space-to-depth grid (in place).

    The 3-input-channel stride-1 conv at full image resolution runs at
    ~1.4 % MXU utilization (32 of 128 output lanes, 800² positions); its
    S2D form is the standard exact reparametrization (see blocks.S2DStem).
    Keyed on the stem kernel shapes: v7 ``cbs0``+``cbs1`` and v4
    ``cbm0``+``cbm1`` (3x3 s1 3->32 + 3x3 s2 32->64).  The v5 6x6
    stride-2 stem is already a strided conv on the raw input — untouched.
    """
    for n0, n1 in (("cbs0", "cbs1"), ("cbm0", "cbm1")):
        if n0 not in fused_backbone or n1 not in fused_backbone:
            continue
        k0 = fused_backbone[n0]["conv"]["kernel"]
        b0 = fused_backbone[n0]["conv"]["bias"]
        k1 = fused_backbone[n1]["conv"]["kernel"]
        if k0.shape != (3, 3, 3, 32) or k1.shape != (3, 3, 32, 64):
            continue
        b1 = fused_backbone[n1]["conv"]["bias"]
        fused_backbone["s2d_stem"] = {
            "conv0": {"kernel": np.float32(
                          _s2d_scatter_packed(_np64(k0)) if packed_input
                          else _s2d_scatter_s1(_np64(k0))),
                      "bias": np.float32(np.tile(_np64(b0), 4))},
            "conv1": {"kernel": np.float32(_s2d_scatter_s2(_np64(k1))),
                      "bias": np.float32(b1)},
        }
        del fused_backbone[n0]
        del fused_backbone[n1]
        return


def fuse_variables(variables: Mapping, ver: str | None = None,
                   quantize: bool = False,
                   packed_input: bool = False) -> dict:
    """Fuse a training-structure variable collection into deploy params.

    ``ver`` ("yolov4"/"yolov5"/"yolov7") additionally packs the parallel
    cv1/cv2 1×1 pairs (``_CV12_MERGE_PATHS``); when None it is inferred
    from the param tree's architecture-specific module names.
    ``quantize`` converts every BN-backed conv (and RepConv) to the int8
    MXU layout — head convs and the S2D stem stay full precision.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    folded: set = set()
    fused = _walk(params, stats, folded)
    neck = params.get("neck", {})
    if "ia1" in neck:  # v7 implicit-prior heads
        for ia, conv, im in _V7_HEADS:
            fused["neck"][conv]["conv"] = _absorb_implicit(
                fused["neck"][conv]["conv"],
                neck[ia]["implicit"], neck[im]["implicit"],
            )
    if "backbone" in fused:
        _maybe_s2d_stem(fused["backbone"], packed_input=packed_input)
    if ver is None:
        ver = _infer_ver(params)
    _merge_cv12(fused, ver, folded)
    if quantize:
        _quantize_fused(fused, folded)
    return {"params": fused}


def _infer_ver(params: Mapping) -> str:
    """Architecture from structural param-tree fingerprints."""
    bb = params.get("backbone", {})
    if "elan1" in bb:
        return "yolov7"
    if "cbs0" in bb:
        return "yolov5"
    return "yolov4"


def calibrate_static_scales(model, variables, batches):
    """Calibrate per-layer static activation scales for the int8 path.

    ``model``/``variables`` come from ``fuse_for_inference(quantize=True)``
    (dynamic scales).  Runs the quantized graph over the calibration
    ``batches`` (an iterable of NHWC image arrays), recording each
    quantized conv's observed per-tensor activation max (the dynamic
    branch sows it as ``intermediates/amax``), then returns
    ``(static_model, static_variables)`` where every quantized conv reads
    a constant ``ascale`` instead of reducing the activation tensor —
    removing one full HBM pass + fusion barrier per quantized conv.

    Numerics: the calibrated scale values are bit-identical to the
    dynamic reduce (whenever a batch's activation max does not exceed the
    calibrated max; beyond it values clip at ±127, the standard
    post-training-quantization behavior), but outputs are NOT bit-equal:
    XLA constant-folds/reassociates the conv epilogue around a constant
    ``ascale`` differently than around the in-graph reduce, and through a
    deep quantized-conv chain those one-ulp diffs flip round()
    requantization boundaries.  tests/test_deploy.py pins the static path
    to the same functional envelope as int8-vs-f32; the mAP gate lives in
    tests/test_trained_parity.py.
    """
    import jax
    import jax.numpy as jnp

    amax = None

    @jax.jit
    def observe(images):
        _, inter = model.apply(variables, images, train=False,
                               mutable=["intermediates"])
        return inter["intermediates"]

    for images in batches:
        cur = jax.device_get(observe(jnp.asarray(images)))
        if amax is None:
            amax = cur
        else:
            amax = jax.tree_util.tree_map(np.maximum, amax, cur)
    if amax is None:
        raise ValueError("calibration needs at least one batch")

    def _inject(params, inter):
        out = dict(params)
        for name, node in inter.items():
            if name == "amax":
                # sow with reduce_fn stores the reduced scalar (possibly
                # tuple-wrapped depending on flax version)
                v = node[0] if isinstance(node, (tuple, list)) else node
                out["ascale"] = np.float32(np.maximum(v, 1e-12))
            elif isinstance(node, Mapping) and name in out:
                out[name] = _inject(out[name], node)
        return out

    new_params = _inject(variables["params"], amax)
    static_model = model.clone(quant="static")
    return static_model, {"params": new_params}


def fuse_for_inference(model, variables, dtype=None,
                       quantize: bool = False,
                       packed_input: bool = False) -> Tuple[Any, dict]:
    """Return ``(deploy_model, deploy_variables)`` for an inference path.

    ``model`` is a training-structure :class:`ryolo_tpu.nn.Yolo`;
    ``dtype`` optionally overrides the deployed compute dtype (e.g.
    ``jnp.bfloat16`` for MXU-native inference — decode stays float32);
    ``quantize=True`` additionally runs the BN-backed convs on the int8
    MXU path (per-channel weights, dynamic per-tensor activation scales —
    2× the bf16 matmul rate; heads/stem/decode stay full precision).
    """
    if packed_input and model.ver not in ("yolov7", "yolov4"):
        raise ValueError("packed_input requires an S2D-stem architecture "
                         "(yolov7/yolov4)")
    deploy_model = model.clone(
        deploy=True, quant=quantize, packed_input=packed_input,
        dtype=dtype if dtype is not None else model.dtype,
    )
    return deploy_model, fuse_variables(variables, ver=model.ver,
                                        quantize=quantize,
                                        packed_input=packed_input)
