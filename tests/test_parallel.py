"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4f)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from ryolo_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


def test_mesh_shapes():
    mesh = make_mesh(8, sp=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("dp", "sp")


def test_shard_batch_places_data():
    mesh = make_mesh(8, sp=2)
    batch = {
        "images": np.zeros((8, 64, 64, 3), np.float32),
        "tgt": np.zeros((8, 4, 6), np.float32),
        "tgt_mask": np.zeros((8, 4), bool),
        "paths": ["x"] * 8,
    }
    out = shard_batch(batch, mesh)
    assert "paths" not in out
    assert out["images"].sharding.spec == P("dp", "sp", None, None)
    assert out["tgt"].sharding.spec == P("dp")


def test_data_parallel_gradient_allreduce():
    """Replicated-params grad over a dp-sharded batch == single-device grad."""
    mesh = make_mesh(8, sp=1)

    w = jnp.ones((16, 16))
    x = np.random.default_rng(0).normal(size=(8, 16)).astype(np.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_single = jax.grad(loss)(w, jnp.asarray(x))

    xs = jax.device_put(x, NamedSharding(mesh, P("dp", None)))
    ws = jax.device_put(w, replicate(mesh))
    g_sharded = jax.jit(jax.grad(loss))(ws, xs)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-5)


def test_full_train_step_dryrun():
    """The driver's dryrun_multichip contract on the 8-device CPU mesh."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles_single_device():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn).lower(*args)  # compile-check only (abstract lowering)
    assert out is not None
