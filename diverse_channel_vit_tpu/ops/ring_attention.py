"""Ring attention: sequence-parallel exact attention over a mesh axis.

The reference caps its sequence length by what one GPU can hold (CHAMMI
three-channel crops, N <= 2432 — ``models/vit.py:101-144``); channel-token
sequences grow as C*(H/p)^2, so high-plex imaging (JUMP-CP is 8 channels at
224^2 already) runs out of single-chip HBM/FLOPs quadratically. The
TPU-native scaling answer is a ``seq`` mesh axis: every device keeps one
token shard of q/k/v, and K/V shards rotate around the ICI ring via
``lax.ppermute`` while an online-softmax accumulator (the flash-attention
recurrence, fp32) folds one block per tick. Compute is O(N^2/P) per device,
peak memory O(N/P), and each tick's block matmul overlaps the next shard's
ppermute transfer — the standard TPU pipeline (scaling-book "ring" recipe).

Pure jax ops, so ``jax.grad`` differentiates straight through (the
transpose of ``ppermute`` is the inverse permutation); no custom VJP needed.
Exactness (fwd + grads) vs the dense oracle is pinned in
tests/test_ring_attention.py on an 8-device CPU mesh.

Must be called INSIDE ``shard_map`` with the sequence dim sharded over
``axis_name``. Token counts must be equal per shard (pad the sequence to a
multiple of the axis size; mask via ``valid_len``).
"""

from __future__ import annotations

import contextlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

MASK_VALUE = -1e30

# Trace-time sequence-parallel context (same pattern as attention.INTERPRET):
# while active, models.vit.Attention routes through ring_attention_packed
# with these mesh coordinates and the GLOBAL key mask, and Block._fused_ok
# declines (the fused kernels see only the local token shard).
_ACTIVE: Optional[Tuple[str, int, Optional[int]]] = None


@contextlib.contextmanager
def ring_context(axis_name: str, axis_size: int, valid_len: Optional[int] = None):
    """Enable sequence-parallel attention for model code traced inside.

    Enter INSIDE the shard_map body (so the flax modules trace with it
    active). ``valid_len`` masks global key columns (pad-once convention)."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = (axis_name, int(axis_size), valid_len)
    try:
        yield
    finally:
        _ACTIVE = prev


def active_ring() -> Optional[Tuple[str, int, Optional[int]]]:
    return _ACTIVE


def _ring_perm(axis_size: int):
    return [(i, (i + 1) % axis_size) for i in range(axis_size)]


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    axis_size: int,
    sm_scale: Optional[float] = None,
    valid_len: Optional[int] = None,
) -> jax.Array:
    """Exact attention over sequence shards: (B, H, N/P, dh) per device.

    ``valid_len`` masks GLOBAL key columns >= valid_len (the pad-once token
    convention of ops/attention.py): each tick reconstructs the global
    column range of the K/V block it currently holds from the block's
    owner index.
    """
    b, h, n_local, dh = q.shape
    if sm_scale is None:
        sm_scale = dh**-0.5
    my = jax.lax.axis_index(axis_name)

    acc = jnp.zeros((b, h, n_local, dh), jnp.float32)
    l = jnp.zeros((b, h, n_local, 1), jnp.float32)
    m = jnp.full((b, h, n_local, 1), MASK_VALUE, jnp.float32)
    kv = (k, v)

    for t in range(axis_size):
        kt, vt = kv
        # kv currently held arrived from the device t hops behind on the ring
        owner = (my - t) % axis_size
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q, kt, preferred_element_type=jnp.float32
        ) * sm_scale
        if valid_len is not None:
            col = owner * n_local + jnp.arange(n_local)
            s = jnp.where((col < valid_len)[None, None, None, :], s, MASK_VALUE)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # corr underflows to 0 on the first real block (m starts at the mask
        # floor), which also self-heals any fully-masked leading blocks
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(vt.dtype), vt,
            preferred_element_type=jnp.float32,
        )
        m = m_new
        if t + 1 < axis_size:
            kv = jax.lax.ppermute(kv, axis_name, _ring_perm(axis_size))
    return (acc / l).astype(q.dtype)


def ring_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    *,
    axis_name: str,
    axis_size: int,
    sm_scale: Optional[float] = None,
    valid_len: Optional[int] = None,
) -> jax.Array:
    """Lane-packed (B, N/P, H*dh) wrapper — the projections' natural layout
    (same convention as :func:`ops.attention.flash_attention_packed`)."""
    b, n_local, d = q.shape
    dh = d // num_heads
    to_h = lambda x: x.reshape(b, n_local, num_heads, dh).transpose(0, 2, 1, 3)
    o = ring_attention(
        to_h(q), to_h(k), to_h(v),
        axis_name=axis_name, axis_size=axis_size,
        sm_scale=sm_scale, valid_len=valid_len,
    )
    return o.transpose(0, 2, 1, 3).reshape(b, n_local, d)


def pad_for_seq_shards(
    xseq: jax.Array, axis_size: int
) -> Tuple[jax.Array, Optional[int]]:
    """Pad (B, N, D) tokens so N divides the ``seq`` axis; returns
    (padded, valid_len) with valid_len=None when already divisible."""
    n = xseq.shape[1]
    n_pad = -(-n // axis_size) * axis_size
    if n_pad == n:
        return xseq, None
    return jnp.pad(xseq, ((0, 0), (0, n_pad - n), (0, 0))), n
