"""Optax training driver with the reference's schedule semantics.

Reproduces ``train.py``'s recipe on TPU:
  * SGD (momentum .937, nesterov) or Adam (``train.py:153-158``)
  * per-epoch cosine one-cycle lr: ``lr * one_cycle(1, lrf, epochs)(epoch)``
    (``train.py:36-38,160-163``)
  * linear warmup of lr over ``nw = max(epochs*iters*warmup_prop, 1000)``
    steps and of the gradient-accumulation factor from 1 to
    ``nbs/batch_size`` (``train.py:150-151,190-193``)
  * fitness = 0.1·mAP@.5 + 0.9·mAP@.5:.95 for best-checkpoint selection
    (``train.py:41-44``)

TPU design: one jitted ``train_step`` does forward + loss + grad; gradient
accumulation is carried in the optimizer state (running sum) so every step
is the same static program; the lr is an input scalar so warmup/schedule
never trigger recompiles.  The step is sharding-agnostic — under a mesh the
same function is jitted with NamedShardings (see ryolo_tpu.parallel).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def one_cycle(y1: float = 0.0, y2: float = 1.0, steps: int = 100):
    """Sinusoidal ramp from y1 to y2 (``train.py:36-38``)."""
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def fitness(metrics: np.ndarray) -> float:
    """Weighted fitness over [P, R, mAP@.5, mAP@.5:.95] (``train.py:41-44``)."""
    w = np.array([0.0, 0.0, 0.1, 0.9])
    return float((metrics * w).sum(0))


def weights_init_normal(params, key, conv_std: float = 0.02,
                        bn_std: float = 0.02):
    """Reference weight init: conv ~ N(0, .02), BN scale ~ N(1, .02), BN
    bias 0 (``train.py:28-33``).  Head conv biases keep their existing
    (zeros) init; implicit priors keep their module init.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    # Single host fetch — iterating a jax array row-by-row dispatches one
    # gather computation per row (pathologically slow).
    keys = np.asarray(jax.random.split(key, len(flat)))
    new_leaves = []
    for (path, leaf), k in zip(flat, keys):
        k = jnp.asarray(k)
        names = [getattr(p, "key", str(p)) for p in path]
        if "kernel" in names[-1]:
            new_leaves.append(
                conv_std * jax.random.normal(k, leaf.shape, leaf.dtype)
            )
        elif names[-1] == "scale":  # BatchNorm scale
            new_leaves.append(
                1.0 + bn_std * jax.random.normal(k, leaf.shape, leaf.dtype)
            )
        elif names[-1] == "bias" and "bn" in "/".join(names):
            new_leaves.append(jnp.zeros_like(leaf))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    grad_accum: Any       # running gradient sum
    accum_count: jax.Array  # int32 number of accumulated micro-batches


def make_optimizer(name: str, lr_placeholder: float = 1.0):
    """SGD-nesterov / Adam matching ``train.py:153-158``; lr injected per
    step via ``optax.inject_hyperparams``."""
    if name == "Adam":
        return optax.inject_hyperparams(optax.adam)(learning_rate=lr_placeholder)
    if name == "SGD":
        return optax.inject_hyperparams(optax.sgd)(
            learning_rate=lr_placeholder, momentum=0.937, nesterov=True
        )
    raise NotImplementedError("The specified optimizer is not implemented.")


class Trainer:
    """Owns the jitted accumulate/apply train step for one model + loss."""

    def __init__(self, model, loss_fn: Callable, optimizer_name: str,
                 base_lr: float):
        self.model = model
        self.loss_fn = loss_fn  # (outputs, batch) -> (loss, items)
        self.tx = make_optimizer(optimizer_name)
        self.base_lr = base_lr

    def init_state(self, variables) -> TrainState:
        params = variables["params"]
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(params),
            grad_accum=zeros,
            accum_count=jnp.zeros((), jnp.int32),
        )

    @partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: TrainState, batch, lr, accumulate):
        return self._step_impl(state, batch, lr, accumulate)

    @partial(jax.jit, static_argnums=(0, 6, 7))
    def train_step_rendered(self, state: TrainState, spec_batch, bank, lr,
                            accumulate, n_out: int, method: str):
        """Device-side augmentation + train step as ONE jitted program.

        Renders the loader's spec batch (mosaic/warp/HSV/mixup — see
        ``ryolo_tpu.data.device_augment``) and runs :meth:`train_step` on
        the result in a single dispatch.  Bit-identical to the two-call
        sequence (the renderer and step are the same traced programs,
        inlined); the fusion exists for the dispatch path: per training
        batch the host issues ONE async call whose arguments are the KB-
        sized spec arrays (numpy accepted — the transfer rides the call),
        instead of N eager uploads + two dispatches, which on low-
        bandwidth/high-latency (tunnel-attached) hosts is the difference
        between a fed and a starved chip.  Replaces the reference's
        host-side augment + H2D image copy (datasets/base_dataset.py:
        92-159, train.py:184-216).
        """
        from ryolo_tpu.data.device_augment import render_batch

        images = render_batch(spec_batch, n_out=n_out, bank=bank,
                              method=method,
                              out_dtype=getattr(self.model, "dtype", None))
        batch = {"images": images}
        for k in ("tgt", "tgt_csl", "tgt_mask"):
            if k in spec_batch:
                batch[k] = spec_batch[k]
        return self._step_impl(state, batch, lr, accumulate)

    def _step_impl(self, state: TrainState, batch, lr, accumulate):
        """One micro-batch: grad accumulate; apply update every
        ``accumulate`` micro-batches (``train.py:200-202``)."""

        def loss_wrapped(params):
            outputs, mutated = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["images"], train=True, mutable=["batch_stats"],
            )
            loss, items = self.loss_fn(outputs, batch)
            return loss, (items, mutated["batch_stats"])

        (loss, (items, new_bs)), grads = jax.value_and_grad(
            loss_wrapped, has_aux=True
        )(state.params)

        grad_accum = jax.tree_util.tree_map(
            lambda a, g: a + g, state.grad_accum, grads
        )
        count = state.accum_count + 1
        do_update = count >= accumulate

        # inject the per-step lr (documented optax.inject_hyperparams pattern)
        state.opt_state.hyperparams["learning_rate"] = lr

        # Unconditional update + per-leaf select instead of ``lax.cond``:
        # the cond is a fusion barrier and its apply branch executes every
        # step at accumulate=1 anyway (profiled 1.67 ms/step @800px B8);
        # as a select the optimizer's elementwise chain fuses into the
        # grad-accumulate add — one pass over the param-sized tensors.
        # Semantics are identical: the skipped branch's updates/momentum
        # are computed then discarded by the select.
        updates, opt_applied = self.tx.update(grad_accum, state.opt_state,
                                              state.params)
        params_applied = optax.apply_updates(state.params, updates)

        def sel(on_true, on_false):
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(do_update, a, b), on_true, on_false)

        new_params = sel(params_applied, state.params)
        new_opt = sel(opt_applied, state.opt_state)
        new_accum = sel(jax.tree_util.tree_map(jnp.zeros_like, grad_accum),
                        grad_accum)
        new_count = jnp.where(do_update, jnp.zeros((), jnp.int32), count)
        new_state = TrainState(new_params, new_bs, new_opt, new_accum,
                               new_count)
        return new_state, loss, items
