"""Train state + optimizer construction.

The state is a pure pytree (params, batch_stats, opt_state, step) so it
jits/shards/checkpoints cleanly; the model and optimizer transforms stay
outside as static closures.  The learning rate is *not* baked into the
optimizer: updates are scaled by an lr scalar passed into the step each
call, which lets the host-side StepLR schedule change it without
recompiling (and keeps one compiled step for the whole run).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(name: str = "adam", weight_decay: float = 1e-4,
                   momentum: float = 0.9) -> optax.GradientTransformation:
    """lr-less optimizer core; the step multiplies updates by -lr.

    'adam' matches torch Adam(weight_decay=...) (L2 added to grads, the
    lineage default); 'sgd' is SGD+momentum (the lineage's alternative).
    """
    if name == "adam":
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
        return optax.chain(*parts)
    if name == "sgd":
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.trace(decay=momentum, nesterov=False))
        return optax.chain(*parts)
    raise ValueError(f"unknown optimizer {name!r}")


def create_train_state(model, tx: optax.GradientTransformation, rng,
                       example_args, jit_init: bool = True) -> TrainState:
    """Initialize params/batch_stats/opt_state.

    jit_init=True matters on this host: eager init runs op-by-op through
    the TPU tunnel (~50-85s for these models) vs ~7s jitted.
    """
    def init_fn(rng, *args):
        variables = model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            *args, train=True)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return params, batch_stats

    if jit_init:
        params, batch_stats = jax.jit(init_fn)(rng, *example_args)
    else:
        params, batch_stats = init_fn(rng, *example_args)
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state)


def apply_updates(state: TrainState, grads, tx, lr) -> TrainState:
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    new_params = optax.apply_updates(state.params, updates)
    return state.replace(step=state.step + 1, params=new_params,
                         opt_state=new_opt)
