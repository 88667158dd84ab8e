"""Channel sampling — HCS and DCS — as jit-safe device-side ops.

The reference samples channels on the host inside ``forward``
(``channel_vit.py:79-86``, ``dichavit.py:127-216``) with
``random.sample`` / ``torch.multinomial`` — nondeterministic under DDP and
incompatible with XLA tracing. Here every draw takes an explicit PRNG key
and runs under ``jit``; only the *number* of channels drawn (``k``) is a
static Python int (one cached compile per channel count).

Sampling-without-replacement uses the Gumbel top-k trick, which is
distributionally identical to the reference's sequential
``torch.multinomial(prob, k, replacement=False)``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def gumbel_topk(key: jax.Array, logits: jax.Array, k: int) -> jax.Array:
    """Sample k indices without replacement from softmax(logits).

    Equivalent to ``torch.multinomial(softmax(logits), k, replacement=False)``
    (``dichavit.py:199``) by the Gumbel-top-k identity.
    """
    g = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    _, idx = jax.lax.top_k(logits.astype(jnp.float32) + g, k)
    return idx


def uniform_subset(key: jax.Array, c: int, k: int) -> jax.Array:
    """k distinct indices uniformly from range(c) (``random.sample`` parity)."""
    return gumbel_topk(key, jnp.zeros((c,), jnp.float32), k)


def force_include(indices: jax.Array, anchor: jax.Array) -> jax.Array:
    """If ``anchor`` not among ``indices``, overwrite the last slot with it.

    Mirrors ``indices[-1] = first_channel_idx`` (``dichavit.py:179-180,
    186-187, 201-202``).
    """
    present = jnp.any(indices == anchor)
    return indices.at[-1].set(jnp.where(present, indices[-1], anchor))


def cosine_similarity_matrix(emb: jax.Array, eps: float = 1e-12) -> jax.Array:
    e = emb.astype(jnp.float32)
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), eps)
    return e @ e.T


def batch_cosine_matrix(features: jax.Array, eps: float = 1e-12) -> jax.Array:
    """(B, C, F) per-sample-normalized features -> batch-mean (C, C) cosine.

    The ``_proj`` / ``_resnet34`` DCS variants score channels by pairwise
    cosine of per-channel features averaged over the batch
    (``dichavit.py:156-166``).
    """
    f = features.astype(jnp.float32)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), eps)
    return jnp.mean(jnp.einsum("bcd,bed->bce", f, f), axis=0)


def per_sample_uniform_subsets(key: jax.Array, b: int, c: int, k: int) -> jax.Array:
    """(B, k) independent channel subsets — ``hcs_per_sample``
    (``dichavit.py:138-149``)."""
    keys = jax.random.split(key, b)
    return jax.vmap(lambda kk: uniform_subset(kk, c, k))(keys)


def dcs_select(
    key: jax.Array,
    k: int,
    method: str,
    *,
    channel_embed: Optional[jax.Array] = None,
    feature_embed: Optional[jax.Array] = None,
    cos_matrix: Optional[jax.Array] = None,
    temp: float = 0.1,
) -> jax.Array:
    """Diverse Channel Sampling: pick ``k`` of C channels (``dichavit.py:137-216``).

    method:
      - "uniform": plain HCS subset (``channel_vit.py:82``)
      - "lowest_cosine" / "highest_cosine": deterministic top-k by cosine
        similarity to a random anchor channel (``dichavit.py:176-187``)
      - "lowest_cosine_prob": sample ∝ softmax((1-cos)/temp) without
        replacement, anchor forced in (``dichavit.py:188-203``)
      - "lowest_cosine_prob_proj" / "lowest_cosine_prob_resnet34": same
        distribution but over ``feature_embed`` (projected patches / frozen
        feature extractor outputs, ``dichavit.py:156-166``)

    channel_embed: (C, D) learned channel embeddings of the *current chunk*.
    feature_embed: (C, F) alternative per-channel features for the _proj /
    _resnet34 variants.
    Returns (k,) int32 channel positions within the chunk.
    """
    if method in ("none", None, "uniform"):
        c = (channel_embed if channel_embed is not None else feature_embed).shape[0]
        return uniform_subset(key, c, k)

    if cos_matrix is not None:
        cos_full = cos_matrix
    else:
        src = feature_embed if method.endswith(("_proj", "_resnet34")) else channel_embed
        if src is None:
            raise ValueError(f"dcs_select({method!r}) needs an embedding source")
        cos_full = cosine_similarity_matrix(src)
    c = cos_full.shape[0]
    k_anchor, k_sample = jax.random.split(key)
    anchor = jax.random.randint(k_anchor, (), 0, c)
    cos = cos_full[anchor]  # (C,)

    if method == "lowest_cosine":
        _, idx = jax.lax.top_k(-cos, k)
        return force_include(idx, anchor)
    if method == "highest_cosine":
        _, idx = jax.lax.top_k(cos, k)
        return force_include(idx, anchor)
    if method.startswith("lowest_cosine_prob"):
        scores = (1.0 - cos) / temp
        idx = gumbel_topk(k_sample, scores, k)
        return force_include(idx, anchor)
    raise ValueError(f"Invalid hcs_sampling: {method!r}")
