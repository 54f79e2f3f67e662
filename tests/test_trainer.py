"""Trainer semantics: schedules, init, accumulation, resume round-trip."""

import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ryolo_tpu.train.trainer import (
    Trainer,
    fitness,
    one_cycle,
    weights_init_normal,
)


def test_one_cycle_endpoints():
    lf = one_cycle(1.0, 0.1, 100)
    assert lf(0) == pytest.approx(1.0)
    assert lf(100) == pytest.approx(0.1)
    assert lf(50) == pytest.approx(0.55)  # cosine midpoint


def test_fitness_weights():
    assert fitness(np.array([1.0, 1.0, 0.0, 0.0])) == 0.0
    assert fitness(np.array([0, 0, 1.0, 0])) == pytest.approx(0.1)
    assert fitness(np.array([0, 0, 0, 1.0])) == pytest.approx(0.9)


def test_weights_init_normal_statistics():
    key = jax.random.PRNGKey(0)
    params = {
        "conv": {"kernel": jnp.zeros((3, 3, 64, 64))},
        "bn": {"scale": jnp.zeros((512,)), "bias": jnp.ones((512,))},
    }
    out = weights_init_normal(params, key)
    k = np.asarray(out["conv"]["kernel"])
    assert abs(k.std() - 0.02) < 0.002 and abs(k.mean()) < 0.002
    s = np.asarray(out["bn"]["scale"])
    assert abs(s.mean() - 1.0) < 0.01 and abs(s.std() - 0.02) < 0.01
    assert (np.asarray(out["bn"]["bias"]) == 0).all()


def _toy_trainer():
    from flax import linen as nn

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            # include a BN so batch_stats exists like the real model
            x = nn.Dense(4)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            return x

    model = Toy()

    def loss_fn(outputs, batch):
        loss = jnp.mean((outputs - batch["y"]) ** 2)
        return loss, {"total_loss": loss}

    class Wrapper:
        def apply(self, variables, x, train=False, mutable=None):
            return model.apply(variables, x, train=train, mutable=mutable)

    variables = dict(model.init(jax.random.PRNGKey(0), jnp.zeros((2, 4))))
    tr = Trainer(Wrapper(), loss_fn, "SGD", 0.1)
    return tr, tr.init_state(variables)


def test_gradient_accumulation_semantics():
    """accumulate=2: params update only every second micro-batch, with the
    summed gradient (matching loss.backward() accumulation, train.py:198-202)."""
    tr, state = _toy_trainer()
    rng = np.random.default_rng(0)
    b1 = {"images": jnp.asarray(rng.normal(size=(2, 4)), jnp.float32),
          "y": jnp.ones((2, 4))}
    b2 = {"images": jnp.asarray(rng.normal(size=(2, 4)), jnp.float32),
          "y": -jnp.ones((2, 4))}

    p0 = state.params
    s1, _, _ = tr.train_step(state, b1, jnp.float32(0.1), jnp.int32(2))
    # no update yet
    assert np.allclose(
        np.asarray(s1.params["Dense_0"]["kernel"]),
        np.asarray(p0["Dense_0"]["kernel"]),
    )
    assert int(s1.accum_count) == 1
    s2, _, _ = tr.train_step(s1, b2, jnp.float32(0.1), jnp.int32(2))
    assert int(s2.accum_count) == 0
    assert not np.allclose(
        np.asarray(s2.params["Dense_0"]["kernel"]),
        np.asarray(p0["Dense_0"]["kernel"]),
    )
    # accumulator reset to zero after the update
    flat = jax.tree_util.tree_leaves(s2.grad_accum)
    assert all(np.allclose(np.asarray(l), 0) for l in flat)


def test_lr_injection_no_recompile():
    tr, state = _toy_trainer()
    b = {"images": jnp.zeros((2, 4)), "y": jnp.ones((2, 4))}
    s, _, _ = tr.train_step(state, b, jnp.float32(0.1), jnp.int32(1))
    n0 = tr.train_step._cache_size()
    s, _, _ = tr.train_step(s, b, jnp.float32(0.05), jnp.int32(1))
    s, _, _ = tr.train_step(s, b, jnp.float32(0.01), jnp.int32(4))
    assert tr.train_step._cache_size() == n0  # lr/accumulate are traced


def test_resume_round_trip(tmp_path):
    from ryolo_tpu.utils.checkpoint import load_train_state, save_train_state

    tr, state = _toy_trainer()
    b = {"images": jnp.ones((2, 4)), "y": jnp.ones((2, 4))}
    state, _, _ = tr.train_step(state, b, jnp.float32(0.1), jnp.int32(1))
    path = os.path.join(tmp_path, "last.state")
    save_train_state(state, {"epoch": 3, "best_fitness": 0.5}, path)

    _, fresh = _toy_trainer()
    restored, meta = load_train_state(fresh, path)
    assert meta == {"epoch": 3, "best_fitness": 0.5}
    for a, b_ in zip(jax.tree_util.tree_leaves(state),
                     jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_))
    # training continues from the restored state
    cont, loss, _ = tr.train_step(restored, b, jnp.float32(0.1), jnp.int32(1))
    assert math.isfinite(float(loss))
