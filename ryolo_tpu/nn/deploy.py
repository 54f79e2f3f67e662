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


def _walk(params: Mapping, stats: Mapping) -> dict:
    out = {}
    for name, node in params.items():
        sub_stats = stats.get(name, {}) if isinstance(stats, Mapping) else {}
        if not isinstance(node, Mapping):
            out[name] = np.asarray(node)
        elif "dense_conv" in node:
            out[name] = _fuse_repconv(node, sub_stats)
        elif _is_convblock(node):
            out[name] = {"conv": _fold_conv_bn(node["conv"], node["bn"],
                                               sub_stats["bn"])}
        elif "implicit" in node:
            continue  # ImplicitA/M: folded by the neck post-pass below
        else:
            out[name] = _walk(node, sub_stats)
    return out


# YOLOv7 neck head triples: ImplicitA -> 1x1 conv -> ImplicitM
_V7_HEADS = (("ia1", "conv5", "im1"), ("ia2", "conv6", "im2"),
             ("ia3", "conv7", "im3"))


def fuse_variables(variables: Mapping) -> dict:
    """Fuse a training-structure variable collection into deploy params."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    fused = _walk(params, stats)
    neck = params.get("neck", {})
    if "ia1" in neck:  # v7 implicit-prior heads
        for ia, conv, im in _V7_HEADS:
            fused["neck"][conv]["conv"] = _absorb_implicit(
                fused["neck"][conv]["conv"],
                neck[ia]["implicit"], neck[im]["implicit"],
            )
    return {"params": fused}


def fuse_for_inference(model, variables, dtype=None) -> Tuple[Any, dict]:
    """Return ``(deploy_model, deploy_variables)`` for an inference path.

    ``model`` is a training-structure :class:`ryolo_tpu.nn.Yolo`;
    ``dtype`` optionally overrides the deployed compute dtype (e.g.
    ``jnp.bfloat16`` for MXU-native inference — decode stays float32).
    """
    deploy_model = model.clone(deploy=True,
                               dtype=dtype if dtype is not None else model.dtype)
    return deploy_model, fuse_variables(variables)
