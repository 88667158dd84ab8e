"""Trainer-facing model wrapper.

Counterpart of the reference's per-model wrapper classes (``DiChaViT``
``dichavit.py:748-861``, ``ChannelViTAdapt``, ``ViTAdapt`` ...): backbone +
class proxies + optional classifier head + temperature.

The reference returns ``(emb, extra_loss)`` in training and ``emb`` in eval;
here the signature is uniform — ``(out, extra_loss)`` — and the trainer
ignores ``extra_loss`` at eval (jit prefers a stable pytree structure).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.initializers import normal_div8_init, trunc_normal_init


class ChannelAdaptiveClassifier(nn.Module):
    """backbone + proxies (+ head when the benchmark is classification).

    Reference: ``DiChaViT.__init__`` (``dichavit.py:796-812``) — the head
    exists only for non-CHAMMI datasets ("Allen" not in mapper); CHAMMI is
    evaluated on features via kNN, trained with the proxy loss.
    """

    backbone: nn.Module
    embed_dim: int
    num_classes: int
    with_head: bool
    learnable_temp: bool = False
    temperature: float = 0.11111

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        channel_ids: jax.Array,
        *,
        train: bool,
        channel_embed_override: Optional[jax.Array] = None,
    ):
        emb, extra_loss = self.backbone(
            x, channel_ids, train=train, channel_embed_override=channel_embed_override
        )
        # class proxies for the proxy main loss (dichavit.py:805)
        self.param("proxies", normal_div8_init(), (self.num_classes, self.embed_dim))
        if self.learnable_temp:
            self.param(
                "logit_scale",
                lambda key, shape: jnp.full(shape, math.log(1.0 / self.temperature)),
                (),
            )
        # MIRO variance encoders live OUTSIDE this tree (training/miro.py):
        # they are per-intermediate-tap biases discovered from the model's
        # block structure, the way the reference builds nn.ModuleLists in
        # the Trainer (``trainer.py:207-208``), not model members.
        out = emb
        if self.with_head:
            out = nn.Dense(
                self.num_classes, kernel_init=trunc_normal_init(std=0.02), name="classifier_head"
            )(emb)
        return out, extra_loss


def bind_chunk(model: "ChannelAdaptiveClassifier", chunk: str) -> "ChannelAdaptiveClassifier":
    """Clone the model with the backbone pinned to a chunk.

    ConvNeXt variants whose stem depends on the chunk *identity* (per-chunk
    convs / coef / emb tables) carry a static ``chunk`` field; everything
    else is chunk-agnostic (channel ids suffice) and returned unchanged.
    The parameter tree is identical across chunks (all per-chunk params are
    created unconditionally), so one TrainState serves every clone.
    """
    bb = model.backbone
    if hasattr(bb, "chunk"):
        return model.clone(backbone=bb.clone(chunk=chunk))
    return model


def model_scale(params: dict, learnable_temp: bool, temperature: float) -> jax.Array:
    """The proxy-loss scale: exp(logit_scale) if learnable else sqrt(1/T)
    (``dichavit.py:806-810``, ``trainer.py:877-882``)."""
    if learnable_temp:
        return jnp.exp(params["logit_scale"])
    return jnp.asarray(math.sqrt(1.0 / temperature), jnp.float32)
