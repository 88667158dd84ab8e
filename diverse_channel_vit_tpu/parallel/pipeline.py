"""Pipeline parallelism: block stack sharded over a ``pipe`` mesh axis.

GPipe-style microbatch pipelining expressed the TPU way: the depth-stacked
block parameters (the ``nn.scan`` layout of models.vit.BlockStack — leading
(depth, ...) axis) are sharded over ``pipe`` so each device owns a
contiguous depth/P stage, and activations flow stage-to-stage via
``lax.ppermute`` over the ICI ring. Per tick every stage runs its local
blocks on one in-flight microbatch; the classic (P-1)-tick fill/drain
bubble amortizes as 1/(1 + (P-1)/M).

Pure jax ops (scan + ppermute + selects), so ``jax.grad`` differentiates
straight through — the transpose runs the reverse pipeline automatically.
Exactness vs the sequential stack (fwd + param grads) is pinned in
tests/test_pipeline.py on the virtual CPU mesh.

The reference has no pipeline story (single-process DDP at 22M params —
SURVEY §2.6); this exists so deeper variants scale past one chip's HBM
without redesign, and to complete the dp/tp/sp/pp mesh-axis family
(expert parallelism is n/a — no MoE in the model zoo).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _ring_perm(size: int):
    return [(i, (i + 1) % size) for i in range(size)]


def pipeline_apply(
    block_apply: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "pipe",
    n_microbatches: Optional[int] = None,
) -> jax.Array:
    """Run ``depth`` blocks over a (B, N, D) batch with the depth dimension
    sharded over ``mesh``'s ``axis``.

    ``block_apply(layer_params, x) -> x`` applies ONE block given its
    unstacked params (e.g. ``lambda p, x: block.apply({'params': p}, x,
    train=False)``). ``stacked_params`` is the (depth, ...)-stacked tree;
    depth must divide the axis size. The batch splits into
    ``n_microbatches`` (default = axis size) equal microbatches.
    """
    size = mesh.shape[axis]
    b = x.shape[0]
    m = int(n_microbatches or size)
    assert b % m == 0, f"batch {b} not divisible into {m} microbatches"
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    assert depth % size == 0, f"depth {depth} not divisible by pipe axis {size}"
    mb = b // m
    x_mb = x.reshape(m, mb, *x.shape[1:])

    def stage(local_params, h):
        def body(h, layer_params):
            return block_apply(layer_params, h), None

        h, _ = jax.lax.scan(body, h, local_params)
        return h

    def body(local_params, x_mb):
        idx = jax.lax.axis_index(axis)
        state = jnp.zeros_like(x_mb[0])
        outputs = jnp.zeros_like(x_mb)
        for t in range(m + size - 1):
            # stage 0 ingests microbatch t; later stages take the ring input
            feed = x_mb[t] if t < m else jnp.zeros_like(state)
            h = jnp.where(idx == 0, feed, state)
            h = stage(local_params, h)
            j = t - (size - 1)
            if j >= 0:
                # the last stage completes microbatch j this tick
                outputs = outputs.at[j].set(jnp.where(idx == size - 1, h, outputs[j]))
            if t + 1 < m + size - 1:
                state = jax.lax.ppermute(h, axis, _ring_perm(size))
        # only the last stage holds real outputs (zeros elsewhere) — the
        # psum is a broadcast-from-last-stage, one ICI all-reduce at the end
        return jax.lax.psum(outputs, axis)

    spec_p = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    out = jax.shard_map(
        body, mesh=mesh, in_specs=(spec_p, P()), out_specs=P(),
    )(stacked_params, x_mb)
    return out.reshape(b, *x.shape[1:])
