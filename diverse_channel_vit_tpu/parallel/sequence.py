"""Sequence parallelism: run a token-sequence module over a ``seq`` mesh axis.

Every part of a pre-norm ViT block except attention is token-local (LN, the
qkv/proj/MLP GEMMs, residuals), so sequence parallelism is: shard the token
dim over the ``seq`` axis, run the module unchanged per shard, and swap the
attention for the ppermute ring (ops/ring_attention.py — the models.vit
Attention does this automatically inside :func:`ring_context`). Weight
gradients psum over the axis via shard_map's transpose, so ``jax.grad``
through :func:`seq_parallel_apply` is the correct sequence-parallel backward.

This exceeds the reference's parallelism (data-parallel only, SURVEY §2.6):
channel-token sequences grow as C*(H/p)^2 and the per-device attention cost
here is O(N^2/P) compute with O(N/P) activations.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.ring_attention import pad_for_seq_shards, ring_context


def seq_parallel_apply(
    module,
    params: Any,
    tokens: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "seq",
    train: bool = False,
    valid_len: Optional[int] = None,
    rngs: Optional[dict] = None,
):
    """Apply ``module`` (signature ``(x, *, train, valid_len)`` — e.g.
    models.vit.BlockStack or a Block chain) with tokens sharded over
    ``mesh``'s ``axis``; returns the full (B, N, D) output.

    ``valid_len`` marks trailing pad tokens (pad-once convention); extra
    padding added here to make N divide the axis is masked the same way.
    Any ``data`` axis in the mesh shards the batch dim as usual — the ring
    collectives only touch ``axis``.
    """
    size = mesh.shape[axis]
    n_tok = tokens.shape[1]
    tokens, pad_valid = pad_for_seq_shards(tokens, size)
    global_valid = valid_len if valid_len is not None else pad_valid
    data = "data" if "data" in mesh.shape and mesh.shape["data"] > 1 else None
    spec = P(data, axis, None)

    def body(p, toks):
        if train and rngs:
            # fold both mesh coordinates so dropout stays iid across shards
            ix = jax.lax.axis_index(axis)
            if data is not None:
                ix = ix * mesh.shape[data] + jax.lax.axis_index(data)
            local_rngs = {k: jax.random.fold_in(r, ix) for k, r in rngs.items()}
        else:
            local_rngs = rngs
        with ring_context(axis, size, global_valid):
            return module.apply(
                {"params": p}, toks, train=train, valid_len=None,
                rngs=local_rngs,
            )

    out = jax.shard_map(
        body, mesh=mesh, in_specs=(P(), spec), out_specs=spec,
    )(params, tokens)
    return out[:, :n_tok]
