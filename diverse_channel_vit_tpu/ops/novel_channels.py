"""Leave-one-out novel-channel synthesis.

At eval time, channels of the target chunk that were never seen during
training get synthesized per-channel parameters (channel embeddings for
ChannelViT/DiChaViT/DepthwiseViT, hypernet z rows for HyperViT,
template coefficients for TemplateMixing) built from trained channels.

Reference: ``channel_vit.py:89-136`` / ``depthwise_vit.py:125-172`` /
``hyper_vit.py:169-233`` — a walking cursor over a channel bank with
strategies avg_2 / avg_3 (+ ``_not_in_chunk`` bank variants), replicate,
zero, random/as_is.

Split into a host-side *plan* (tiny index lists, depends only on static
mapper/strategy) and one device gather-average — shapes static, O(C) work.
The batch-dependent DYNAMIC_INPUT_CORR_* family lives in
:func:`dynamic_input_corr` (``channel_vit_adapt.py:153-254``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

STATIC_STRATEGIES = (
    "avg_2", "avg_2_not_in_chunk", "avg_3", "avg_3_not_in_chunk",
    "replicate", "zero", "as_is", "random", "random_input_corr",
    "fixed_input_corr",
)


def flatten_training_channels(mapper: Dict[str, Sequence[int]], training_chunks: str) -> List[int]:
    """``training_chunks`` is a '_'-joined chunk list (``trainer.py:408``)."""
    out: List[int] = []
    for ch in training_chunks.split("_"):
        out.extend(mapper[ch])
    return out


def synthesis_plan(
    mapper: Dict[str, Sequence[int]],
    chunk: str,
    training_chunks: str,
    strategy: str,
    *,
    channel_map: Optional[Dict[int, int]] = None,
    rng: Optional[np.random.Generator] = None,
) -> List[Tuple[str, List[int]]]:
    """Per target channel: ("avg", [source ids]) or ("zero", []).

    Mirrors the reference's walking-cursor construction exactly
    (``channel_vit.py:96-136``): the cursor advances once per *novel*
    channel, modulo the bank length.
    """
    training_channels = flatten_training_channels(mapper, training_chunks)
    chunk_channels = list(mapper[chunk])
    chs_not_seen = [c for c in training_channels if c not in chunk_channels]
    bank = chs_not_seen if "not_in_chunk" in strategy else training_channels
    if not bank:
        bank = training_channels

    plan: List[Tuple[str, List[int]]] = []
    cur = 0
    for c in chunk_channels:
        if c in training_channels or strategy in ("as_is",):
            plan.append(("avg", [c]))
            continue
        if strategy in ("avg_2", "avg_2_not_in_chunk"):
            plan.append(("avg", [bank[cur], bank[(cur + 1) % len(bank)]]))
        elif strategy in ("avg_3", "avg_3_not_in_chunk"):
            plan.append(("avg", [bank[cur], bank[(cur + 1) % len(bank)], bank[(cur + 2) % len(bank)]]))
        elif strategy == "replicate":
            plan.append(("avg", [bank[cur]]))
        elif strategy == "zero":
            plan.append(("zero", []))
        elif strategy == "random":
            # reference RANDOM keeps the channel's own (untrained) row
            plan.append(("avg", [c]))
        elif strategy == "random_input_corr":
            r = rng or np.random.default_rng()
            plan.append(("avg", [int(r.choice(training_channels))]))
        elif strategy == "fixed_input_corr":
            if not channel_map:
                raise ValueError("fixed_input_corr needs a channel_map {novel: trained}")
            plan.append(("avg", [channel_map[c]]))
        else:
            raise ValueError(f"Invalid new_channel_init: {strategy!r}")
        cur = (cur + 1) % len(bank)
    return plan


def synthesize_rows(table: jax.Array, plan: List[Tuple[str, List[int]]]) -> jax.Array:
    """Apply a plan to any per-channel table (C_total, ...) -> (C, ...)."""
    rows = []
    for kind, ids in plan:
        if kind == "zero":
            rows.append(jnp.zeros_like(table[0]))
        else:
            rows.append(jnp.mean(jnp.take(table, jnp.asarray(ids), axis=0), axis=0))
    return jnp.stack(rows, axis=0)


def dynamic_input_corr(
    variant: int,
    x: jax.Array,
    ch_idx: int,
    bank_imgs: jax.Array,
    channel_embed: jax.Array,
    training_channels: Sequence[int],
    proj_fn=None,
) -> jax.Array:
    """DYNAMIC_INPUT_CORR_{1..6}: match the novel channel's input statistics
    against a bank of training-channel images (``channel_vit_adapt.py:153-254``).

    x: (B, C, H, W) test batch; bank_imgs: (A, C_train, H, W) exemplars per
    training channel; channel_embed: full (C_total, D) table. Returns a
    per-sample (B, D) embedding for the novel channel.
    """
    b = x.shape[0]
    tc = jnp.asarray(list(training_channels))

    def _norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

    if variant in (5, 6):
        if proj_fn is None:
            raise ValueError("variants 5/6 need the patch-projection fn")
        xc = proj_fn(x[:, ch_idx : ch_idx + 1])  # (B, ...) flattened features
        xc = _norm(xc.reshape(b, -1))
        bk = proj_fn(bank_imgs.reshape(-1, 1, *bank_imgs.shape[2:]))
        bk = _norm(bk.reshape(bank_imgs.shape[0], bank_imgs.shape[1], -1))
    else:
        xc = _norm(x[:, ch_idx].reshape(b, -1))
        bk = _norm(bank_imgs.reshape(bank_imgs.shape[0], bank_imgs.shape[1], -1))

    if variant == 2:
        flat = _norm(bk.transpose(1, 0, 2).reshape(bk.shape[1], -1))
        xrep = _norm(jnp.tile(xc, (1, bk.shape[0])))
        corr = xrep @ flat.T  # (B, C_train)
        idx = jnp.argmax(corr, axis=-1)
        return jnp.take(channel_embed, tc[idx], axis=0)
    if variant == 3:
        mean_bank = _norm(jnp.mean(bk, axis=0))
        corr = xc @ mean_bank.T
        idx = jnp.argmax(corr, axis=-1)
        return jnp.take(channel_embed, tc[idx], axis=0)

    corr = jnp.einsum("bd,acd->bac", xc, bk)  # (B, A, C_train)
    if variant in (1, 6):
        votes = jnp.argmax(corr, axis=-1)  # (B, A)
        # torch.mode over exemplars
        one_hot = jax.nn.one_hot(votes, bk.shape[1]).sum(axis=1)
        idx = jnp.argmax(one_hot, axis=-1)
        return jnp.take(channel_embed, tc[idx], axis=0)
    if variant in (4, 5):
        w = jnp.mean(corr, axis=1)  # (B, C_train)
        return w @ jnp.take(channel_embed, tc, axis=0)
    raise ValueError(f"dynamic_input_corr variant {variant} not in 1..6")
