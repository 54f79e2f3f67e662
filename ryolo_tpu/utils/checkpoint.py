"""Checkpoint interop: reference ``.pth`` state_dicts <-> flax pytrees.

Implements SURVEY.md §5.4: bidirectional conversion preserving the
reference's exact state_dict naming AND ordering (needed for the
"first 552 entries keeps backbone+neck" fine-tune semantics,
``train.py:80-86``), plus orbax-style native msgpack checkpoints.

Name mapping (flax module names were chosen to mirror the torch attribute
names, so the rename is mechanical):

  torch ``X.conv.0.weight``  (OIHW) <-> flax params  ``X/conv/kernel`` (HWIO)
  torch ``X.conv.0.bias``           <-> flax params  ``X/conv/bias``
  torch ``X.conv.1.weight``         <-> flax params  ``X/bn/scale``
  torch ``X.conv.1.bias``           <-> flax params  ``X/bn/bias``
  torch ``X.conv.1.running_mean``   <-> batch_stats  ``X/bn/mean``
  torch ``X.conv.1.running_var``    <-> batch_stats  ``X/bn/var``
  torch ``X.m.K...``                <-> flax ``X/m_K/...`` (Bottleneck lists)
  torch RepConv ``rbr_dense.0/.1``, ``rbr_1x1.0/.1``, ``rbr_identity``
        <-> flax ``dense_conv``/``dense_bn``, ``px_conv``/``px_bn``, ``id_bn``
  torch ``iaN.implicit`` (1,C,1,1)  <-> flax ``iaN/implicit`` (1,1,1,C)

``num_batches_tracked`` entries are synthesized on export (zeros) and
ignored on import, at their correct ordinal positions.
"""

from __future__ import annotations

import collections
from typing import Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Canonical state_dict ordering (torch registration order, from the module
# declaration order in model/{utils,backbone,neck}.py of the reference).
# Each entry: (name, spec) where spec is one of
#   'C'  — ConvBlock with bn (conv.0.weight + bn quintet)
#   'Cb' — ConvBlock bias head (conv.0.weight, conv.0.bias; no bn)
#   'B'  — bare BatchNorm (weight, bias, running stats)
#   'W'  — bare Conv2d weight only
#   'I'  — implicit (single param)
# or a nested list of (child_name, spec).
# ---------------------------------------------------------------------------


def _csp(n):
    return [("cv1", "C"), ("cv2", "C"), ("cv3", "C"), ("cv4", "C")] + [
        (f"m.{i}", [("cv1", "C"), ("cv2", "C")]) for i in range(n)
    ]


def _c3(n):
    return [("cv1", "C"), ("cv2", "C"), ("cv3", "C")] + [
        (f"m.{i}", [("cv1", "C"), ("cv2", "C")]) for i in range(n)
    ]


def _c5():
    return [(f"cv{i}", "C") for i in range(1, 6)]


def _elan():
    return [(f"cv{i}", "C") for i in range(1, 8)]


def _maxconv():
    return [("cv1", "C"), ("cv2", "C"), ("cv3", "C")]


def _spp():
    return [(f"cv{i}", "C") for i in range(1, 7)]


def _sppf():
    return [("cv1", "C"), ("cv2", "C")]


def _sppcspc():
    return [(f"cv{i}", "C") for i in range(1, 8)]


def _repconv(identity: bool):
    out = []
    if identity:
        out.append(("rbr_identity", "B"))
    out += [("rbr_dense.0", "W"), ("rbr_dense.1", "B"),
            ("rbr_1x1.0", "W"), ("rbr_1x1.1", "B")]
    return out


_BACKBONES = {
    "yolov4": [
        ("cbm0", "C"), ("cbm1", "C"), ("csp1", _csp(1)),
        ("cbm2", "C"), ("csp2", _csp(2)), ("cbm3", "C"), ("csp3", _csp(8)),
        ("cbm4", "C"), ("csp4", _csp(8)), ("cbm5", "C"), ("csp5", _csp(4)),
        ("spp", _spp()),
    ],
    "yolov5": [
        ("cbs0", "C"), ("cbs1", "C"), ("csp1", _c3(3)),
        ("cbs2", "C"), ("csp2", _c3(6)), ("cbs3", "C"), ("csp3", _c3(9)),
        ("cbs4", "C"), ("csp4", _c3(3)), ("spp", _sppf()),
    ],
    "yolov7": [
        ("cbs0", "C"), ("cbs1", "C"), ("cbs2", "C"), ("cbs3", "C"),
        ("elan1", _elan()), ("mc1", _maxconv()), ("elan2", _elan()),
        ("mc2", _maxconv()), ("elan3", _elan()), ("mc3", _maxconv()),
        ("elan4", _elan()), ("spp", _sppcspc()),
    ],
}

_NECKS = {
    "yolov4": [
        ("conv7", "C"), ("conv8", "C"), ("conv9", _c5()),
        ("conv14", "C"), ("conv15", "C"), ("conv16", _c5()),
        ("conv21", "C"), ("conv22", "Cb"), ("conv23", "C"),
        ("conv24", _c5()), ("conv29", "C"), ("conv30", "Cb"),
        ("conv31", "C"), ("conv32", _c5()), ("conv37", "C"), ("conv38", "Cb"),
    ],
    "yolov5": [
        ("conv7", "C"), ("csp1", _c3(3)), ("conv14", "C"), ("csp2", _c3(3)),
        ("conv15", "Cb"), ("conv16", "C"), ("csp3", _c3(3)), ("conv17", "Cb"),
        ("conv18", "C"), ("csp4", _c3(3)), ("conv19", "Cb"),
    ],
    "yolov7": [
        ("conv1", "C"), ("elan1", _elan()), ("conv2", "C"), ("elan2", _elan()),
        ("conv3", "C"), ("conv4", "C"),
        ("mc1", _maxconv()), ("elan3", _elan()),
        ("mc2", _maxconv()), ("elan4", _elan()),
        ("repVgg1", _repconv(False)), ("ia1", "I"), ("conv5", "Cb"),
        ("im1", "I"),
        ("repVgg2", _repconv(False)), ("ia2", "I"), ("conv6", "Cb"),
        ("im2", "I"),
        ("repVgg3", _repconv(False)), ("ia3", "I"), ("conv7", "Cb"),
        ("im3", "I"),
    ],
}


def _expand(prefix: str, spec, out: List[Tuple[str, str]]):
    """Expand a spec into ordered (torch_name, kind) tensor entries."""
    if spec == "C":
        out.append((f"{prefix}.conv.0.weight", "conv_w"))
        out.append((f"{prefix}.conv.1.weight", "bn_w"))
        out.append((f"{prefix}.conv.1.bias", "bn_b"))
        out.append((f"{prefix}.conv.1.running_mean", "bn_m"))
        out.append((f"{prefix}.conv.1.running_var", "bn_v"))
        out.append((f"{prefix}.conv.1.num_batches_tracked", "bn_n"))
    elif spec == "Cb":
        out.append((f"{prefix}.conv.0.weight", "conv_w"))
        out.append((f"{prefix}.conv.0.bias", "conv_b"))
    elif spec == "B":
        out.append((f"{prefix}.weight", "bn_w"))
        out.append((f"{prefix}.bias", "bn_b"))
        out.append((f"{prefix}.running_mean", "bn_m"))
        out.append((f"{prefix}.running_var", "bn_v"))
        out.append((f"{prefix}.num_batches_tracked", "bn_n"))
    elif spec == "W":
        out.append((f"{prefix}.weight", "conv_w"))
    elif spec == "I":
        out.append((f"{prefix}.implicit", "implicit"))
    else:
        for child, sub in spec:
            _expand(f"{prefix}.{child}", sub, out)


def state_dict_layout(ver: str) -> List[Tuple[str, str]]:
    """Ordered reference state_dict entries ``(name, kind)`` for ``ver``.

    RepConv identity branches: in the reference neck all RepConvs change
    channel count, so ``rbr_identity`` is None (``model/utils.py:197``) —
    encoded in ``_repconv(False)``.
    """
    out: List[Tuple[str, str]] = []
    for name, spec in _BACKBONES[ver]:
        _expand(f"backbone.{name}", spec, out)
    for name, spec in _NECKS[ver]:
        _expand(f"neck.{name}", spec, out)
    return out


# ---------------------------------------------------------------------------
# torch name -> flax tree path
# ---------------------------------------------------------------------------


def torch_name_to_flax(name: str):
    """Map a torch state_dict name to ``(collection, path_tuple, transform)``.

    ``collection`` ∈ {'params', 'batch_stats', None (skip)};
    ``transform``  ∈ {'conv', 'implicit', None}.
    """
    parts = name.split(".")
    # normalize Bottleneck list entries: m.K -> m_K
    norm = []
    i = 0
    while i < len(parts):
        if parts[i] == "m" and i + 1 < len(parts) and parts[i + 1].isdigit():
            norm.append(f"m_{parts[i + 1]}")
            i += 2
        else:
            norm.append(parts[i])
            i += 1
    parts = norm

    tail = parts[-1]
    if tail == "num_batches_tracked":
        return None, (), None
    if tail == "implicit":
        return "params", tuple(parts[:-1]) + ("implicit",), "implicit"

    # RepConv branches
    if len(parts) >= 3 and parts[-3] in ("rbr_dense", "rbr_1x1"):
        base = parts[:-3]
        branch = "dense" if parts[-3] == "rbr_dense" else "px"
        if parts[-2] == "0":  # conv
            return "params", tuple(base) + (f"{branch}_conv", "kernel"), "conv"
        # BN
        mapping = {"weight": ("params", "scale"), "bias": ("params", "bias"),
                   "running_mean": ("batch_stats", "mean"),
                   "running_var": ("batch_stats", "var")}
        coll, leaf = mapping[tail]
        return coll, tuple(base) + (f"{branch}_bn", leaf), None
    if len(parts) >= 2 and parts[-2] == "rbr_identity":
        base = parts[:-2]
        mapping = {"weight": ("params", "scale"), "bias": ("params", "bias"),
                   "running_mean": ("batch_stats", "mean"),
                   "running_var": ("batch_stats", "var")}
        coll, leaf = mapping[tail]
        return coll, tuple(base) + ("id_bn", leaf), None

    # ConvBlock: X.conv.0.* / X.conv.1.*
    if len(parts) >= 3 and parts[-3] == "conv" and parts[-2] in ("0", "1"):
        base = parts[:-3]
        if parts[-2] == "0":
            if tail == "weight":
                return "params", tuple(base) + ("conv", "kernel"), "conv"
            return "params", tuple(base) + ("conv", "bias"), None
        mapping = {"weight": ("params", "scale"), "bias": ("params", "bias"),
                   "running_mean": ("batch_stats", "mean"),
                   "running_var": ("batch_stats", "var")}
        coll, leaf = mapping[tail]
        return coll, tuple(base) + ("bn", leaf), None

    raise KeyError(f"Unrecognized reference state_dict entry: {name}")


def _tree_get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _tree_set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def import_state_dict(state_dict, variables, max_entries: int = -1,
                      strict: bool = True):
    """Load a reference-ordered ``.pth`` state_dict into flax ``variables``.

    ``max_entries``: keep only the first N entries of the (ordered) input —
    the reference's backbone+neck fine-tune filter (``train.py:81``:
    552 entries for its yolov5 run).  -1 = all.
    Returns new ``{'params', 'batch_stats'}`` dicts (copies).
    """
    import jax.numpy as jnp

    params = _deep_copy(variables["params"])
    bstats = _deep_copy(variables.get("batch_stats", {}))
    loaded = 0
    for i, (name, tensor) in enumerate(state_dict.items()):
        if max_entries >= 0 and i >= max_entries:
            break
        coll, path, transform = torch_name_to_flax(name)
        if coll is None:
            continue
        arr = np.asarray(tensor.detach().cpu().numpy()
                         if hasattr(tensor, "detach") else tensor)
        if transform == "conv":
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif transform == "implicit":
            arr = arr.transpose(0, 2, 3, 1)  # (1,C,1,1) -> (1,1,1,C)
        tree = params if coll == "params" else bstats
        try:
            cur = _tree_get(tree, path)
        except KeyError:
            if strict:
                raise KeyError(f"{name} -> {path} not found in model tree")
            continue
        if tuple(cur.shape) != tuple(arr.shape):
            raise ValueError(
                f"shape mismatch for {name}: ckpt {arr.shape} vs model {cur.shape}"
            )
        _tree_set(tree, path, jnp.asarray(arr, dtype=cur.dtype))
        loaded += 1
    return {"params": params, "batch_stats": bstats}, loaded


def export_state_dict(variables, ver: str):
    """Flax variables -> reference-ordered torch state_dict (CPU tensors)."""
    import torch

    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    out = collections.OrderedDict()
    for name, kind in state_dict_layout(ver):
        if kind == "bn_n":
            out[name] = torch.zeros((), dtype=torch.long)
            continue
        coll, path, transform = torch_name_to_flax(name)
        tree = params if coll == "params" else bstats
        arr = np.asarray(_tree_get(tree, path))
        if transform == "conv":
            arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        elif transform == "implicit":
            arr = arr.transpose(0, 3, 1, 2)  # (1,1,1,C) -> (1,C,1,1)
        out[name] = torch.from_numpy(np.ascontiguousarray(arr))
    return out


def _deep_copy(tree):
    if isinstance(tree, dict):
        return {k: _deep_copy(v) for k, v in tree.items()}
    return tree


def save_pth(variables, ver: str, path: str):
    """torch.save an exported reference-format checkpoint (``train.py:88-90``)."""
    import torch

    torch.save(export_state_dict(variables, ver), path)


def load_pth(path: str):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


# ---------------------------------------------------------------------------
# Native full-training-state checkpoints (resume support the reference lacks:
# SURVEY.md §5.3 — reference training always restarts at epoch 0 because
# only model.state_dict() is saved).
# ---------------------------------------------------------------------------


def save_train_state(state, meta: dict, path: str):
    """Serialize a TrainState (params, batch_stats, optimizer, accumulator)
    plus a small metadata dict (epoch, best_fitness, ...) to one file."""
    import json

    from flax import serialization

    blob = serialization.to_bytes(state)
    with open(path, "wb") as f:
        header = json.dumps(meta).encode()
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(blob)


def load_train_state(template_state, path: str):
    """Restore a TrainState saved by :func:`save_train_state`.

    ``template_state`` provides the pytree structure (build it exactly as at
    cold start).  Returns ``(state, meta)``.
    """
    import json

    from flax import serialization

    with open(path, "rb") as f:
        n = int.from_bytes(f.read(8), "little")
        meta = json.loads(f.read(n).decode())
        blob = f.read()
    state = serialization.from_bytes(template_state, blob)
    return state, meta
