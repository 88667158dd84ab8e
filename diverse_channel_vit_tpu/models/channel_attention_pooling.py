"""Channel attention pooling: a mini-transformer over the channel axis.

Reference ``models/channel_attention_pooling.py:79-127``: tokens
``(B, C, K, H, W) -> ((B*H*W), C, K)``, optional learned channel tokens and
CLS token, a PreNorm MHA+FF stack, then CLS or mean readout over channels.

TPU layout note: instead of literally folding (B, H, W) into the batch dim
of a (C, K) sequence, the flax module takes the depthwise token grid
``(B, C, N, K)`` (N = H*W patches) and attends over C with N folded into
the batch — identical math, one transpose fewer.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import gelu
from ..ops.initializers import normal_div8_init, normal_init

Dtype = Any


class _PreNormMHA(nn.Module):
    heads: int
    dim_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool):
        dim = x.shape[-1]
        inner = self.heads * self.dim_head
        y = nn.LayerNorm(name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, _ = q.shape
        q = q.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) * self.dim_head**-0.5, axis=-1
        )
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v).transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class _PreNormFF(nn.Module):
    mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool):
        dim = x.shape[-1]
        y = nn.LayerNorm(name="norm")(x)
        y = nn.Dense(self.mlp_dim, name="fc1")(y)
        y = gelu(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(dim, name="fc2")(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class ChannelAttentionPoolingLayer(nn.Module):
    max_num_channels: int
    dim: int
    depth: int = 1
    heads: int = 4
    dim_head: int = 16
    mlp_dim: int = 4
    dropout: float = 0.0
    use_cls_token: bool = False
    use_channel_tokens: bool = False
    init_channel_tokens: Optional[str] = None  # "random" | "zero"

    @nn.compact
    def __call__(self, tokens: jax.Array, channel_ids: jax.Array, *, train: bool) -> jax.Array:
        """tokens (B, C, N, K) -> pooled (B, N, K)."""
        b, c, n, k = tokens.shape
        x = tokens.transpose(0, 2, 1, 3).reshape(b * n, c, k)  # ((B*N), C, K)

        if self.use_channel_tokens:
            init = normal_div8_init() if self.init_channel_tokens == "random" else nn.initializers.zeros
            channel_tokens = self.param("channel_tokens", init, (self.max_num_channels, k))
            x = x + jnp.take(channel_tokens, channel_ids, axis=0)[None]

        if self.use_cls_token:
            cls = self.param("cls_token", normal_init(), (k,))
            x = jnp.concatenate([jnp.broadcast_to(cls, (b * n, 1, k)), x], axis=1)

        for i in range(self.depth):
            x = x + _PreNormMHA(self.heads, self.dim_head, self.dropout, name=f"attn_{i}")(x, train=train)
            x = x + _PreNormFF(self.mlp_dim, self.dropout, name=f"ff_{i}")(x, train=train)

        if self.use_cls_token:
            # reference reads the *last* channel position after prepending CLS
            # at the front (channel_attention_pooling.py:122-124) — reproduce
            pooled = x[:, -1]
        else:
            pooled = jnp.mean(x, axis=1)
        return pooled.reshape(b, n, k)
