"""Token-reduction ops: HCS token/channel dropout and PPT score pruning.

Reference research knobs for the C x N token-grid blowup (SURVEY §5):

- ``dropout_tokens_hcs`` ∈ {random, channel, channel_random50, token_random50}
  — train-time token dropout in ``prepare_tokens``
  (``channel_vit_adapt.py:436-495``)
- ``block_type=block_v2`` — per-block pruning by PPT significance scores
  (CLS-attention x value-norm, ``vit.py:147-229``, ``BlockV2`` :402-492)
- EViT CLS-attention top-k (``vit.py:291-343``; defined but never wired in
  the reference — provided here behind ``keep_rate``)

TPU-first deviation: the reference draws a fresh token count per forward /
per block (dynamic shapes). Here every keep count is *static* — the caller
draws it on the host (like the HCS channel count) and each count is one
cached jit specialization; within a step the count is fixed across blocks.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .sampling import uniform_subset


def ppt_significance_scores(attn: jax.Array, v: jax.Array) -> jax.Array:
    """PPT token scores (``vit.py:160-198``): CLS-attention summed over heads
    times per-token value norms, normalized over non-CLS tokens.

    attn: (B, H, N, N) probabilities; v: (B, H, N, dh). Returns (B, N-1).
    """
    b, h, n, dh = v.shape
    v_norm = jnp.linalg.norm(
        v.transpose(0, 2, 1, 3).reshape(b, n, h * dh), ord=2, axis=2
    )  # (B, N)
    sig = jnp.sum(attn[:, :, 0], axis=1) * v_norm  # (B, N)
    sig = sig[:, 1:]
    return sig / jnp.sum(sig, axis=1, keepdims=True)


def topk_token_select(x: jax.Array, scores: jax.Array, keep: int) -> jax.Array:
    """Per-sample top-k gather of non-CLS tokens; CLS always kept.

    x: (B, 1+N, D) with scores (B, N) over the non-CLS tail.
    Returns (B, 1+keep, D) (``BlockV2`` token_pruning, ``vit.py:448-457``;
    the reference top-ks the *full* score vector which includes CLS — CLS
    ranks first by construction, so keeping it explicitly is equivalent).
    """
    _, idx = jax.lax.top_k(scores, keep)  # (B, keep)
    gathered = jnp.take_along_axis(x[:, 1:], idx[..., None], axis=1)
    return jnp.concatenate([x[:, :1], gathered], axis=1)


def topk_channel_select(
    x: jax.Array, scores: jax.Array, nc: int, keep_channels: int
) -> jax.Array:
    """Keep the top channels by batch-summed score (``vit.py:459-478``).

    The reference sums scores over the batch, so the same channels survive
    for every sample — already jit-friendly. x: (B, 1+nc*hw, D).
    """
    b = x.shape[0]
    hw = scores.shape[1] // nc
    ch_scores = jnp.sum(scores.reshape(b, nc, hw), axis=(0, 2))  # (nc,)
    _, keep_idx = jax.lax.top_k(ch_scores, keep_channels)
    keep_idx = jnp.sort(keep_idx)
    grid = x[:, 1:].reshape(b, nc, hw, -1)
    kept = jnp.take(grid, keep_idx, axis=1).reshape(b, keep_channels * hw, -1)
    return jnp.concatenate([x[:, :1], kept], axis=1)


def random_token_drop(key: jax.Array, x: jax.Array, keep_tokens: int) -> jax.Array:
    """Keep ``keep_tokens`` random non-CLS tokens (+ CLS)
    (``channel_vit_adapt.py:436-448`` / token_random50 :482-495)."""
    n = x.shape[1] - 1
    idx = jnp.sort(uniform_subset(key, n, keep_tokens))
    kept = jnp.take(x[:, 1:], idx, axis=1)
    return jnp.concatenate([x[:, :1], kept], axis=1)


def random_channel_drop(
    key: jax.Array, x: jax.Array, nc: int, keep_channels: int
) -> jax.Array:
    """Keep ``keep_channels`` random channels' token groups (+ CLS)
    (``channel_vit_adapt.py:450-480``)."""
    b = x.shape[0]
    hw = (x.shape[1] - 1) // nc
    idx = jnp.sort(uniform_subset(key, nc, keep_channels))
    grid = x[:, 1:].reshape(b, nc, hw, -1)
    kept = jnp.take(grid, idx, axis=1).reshape(b, keep_channels * hw, -1)
    return jnp.concatenate([x[:, :1], kept], axis=1)


def evit_cls_attention_select(
    x: jax.Array, attn: jax.Array, keep_rate: float
) -> jax.Array:
    """EViT: keep top int(keep_rate*(N-1)) tokens by mean CLS attention
    (``vit.py:291-343``).

    Dense-probability formulation: ``attn`` is the full (B, H, N, N) matrix.
    The production path (``models/vit.py:_EViTAttention``) recomputes only
    the CLS row at O(N.dh) and runs flash attention for the output; this
    function is retained as the numerics oracle for that rework."""
    n = x.shape[1] - 1
    keep = int(keep_rate * n)
    if keep >= n:
        return x
    cls_attn = jnp.mean(attn[:, :, 0, 1:], axis=1)  # (B, N-1)
    return topk_token_select(x, cls_attn, keep)
