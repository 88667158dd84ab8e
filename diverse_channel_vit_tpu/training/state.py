"""Train state.

The reference Trainer's mutable bundle — model params, optimizer state,
epoch counter, AMP scaler (``trainer.py:1292-1306`` checkpoint dict) — maps
onto a single immutable flax ``TrainState`` pytree. There is no scaler: on
TPU the compute dtype is bfloat16 with float32 master params, which needs no
loss scaling.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    """Adds the dropout PRNG base key to the standard flax TrainState."""

    base_rng: jax.Array = struct.field(pytree_node=True, default=None)

    def step_rng(self) -> jax.Array:
        """Per-step key derived from (base key, step) — deterministic resume."""
        return jax.random.fold_in(self.base_rng, self.step)


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    *,
    rng: jax.Array,
    sample_input: jax.Array,
    sample_channel_ids: jax.Array,
    params: Optional[Any] = None,
) -> TrainState:
    """Initialize params (unless given) and wrap them with the optimizer."""
    init_rng, base_rng = jax.random.split(rng)
    if params is None:
        # jit the init: eager init dispatches thousands of tiny ops, which is
        # pathological over remote-device tunnels and slow everywhere
        init_fn = jax.jit(
            lambda r1, r2, x, c: model.init(
                {"params": r1, "dropout": r2}, x, c, train=False
            )["params"]
        )
        params = init_fn(init_rng, base_rng, sample_input, sample_channel_ids)
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, base_rng=base_rng
    )


def param_count(params) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))
