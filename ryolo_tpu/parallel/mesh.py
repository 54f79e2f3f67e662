"""jax.sharding mesh utilities for the rotated-detection pipeline.

The reference has **no** distributed layer (single device everywhere —
``train.py:50``, SURVEY.md §2.12/§5.8); scaling here is green-field and
TPU-idiomatic: a ``Mesh`` over ICI with

  * ``dp`` — batch-axis data parallelism (gradient all-reduce falls out of
    jit + sharding propagation; replaces the DDP the reference never had);
  * ``sp`` — optional spatial sharding of the image height axis (XLA's
    SPMD partitioner inserts the conv halo exchanges automatically), the
    scaling axis SURVEY.md §5.7 identifies for CNN detectors (image
    resolution).

Everything composes with the single jitted train/eval step: the same
function is jitted with ``NamedSharding`` constraints, no separate
multi-device code path.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, sp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ``(dp, sp)`` mesh over the first ``n_devices`` devices."""
    devs = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devs)
    devs = devs[:n]
    assert n % sp == 0, f"n_devices {n} not divisible by sp {sp}"
    arr = np.array(devs).reshape(n // sp, sp)
    return Mesh(arr, ("dp", "sp"))


def batch_sharding(mesh: Mesh, spatial: bool = True) -> NamedSharding:
    """Sharding for NHWC image batches: batch over dp, height over sp."""
    if spatial:
        return NamedSharding(mesh, P("dp", "sp", None, None))
    return NamedSharding(mesh, P("dp", None, None, None))


def target_sharding(mesh: Mesh) -> NamedSharding:
    """Targets shard on batch only."""
    return NamedSharding(mesh, P("dp"))


def replicate(mesh: Mesh):
    """Fully-replicated sharding (params, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, spatial: bool = True) -> dict:
    """Device-put a host batch dict with mesh shardings."""
    img_s = batch_sharding(mesh, spatial)
    tgt_s = target_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if k == "paths":
            continue
        out[k] = jax.device_put(
            np.asarray(v), img_s if k == "images" else tgt_s
        )
    return out
