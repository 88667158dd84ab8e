"""Shared ViT trunk: CLS token + positional embedding + transformer blocks.

The reference repeats this block verbatim in every ViT variant
(``vit.py:513-670``, ``depthwise_vit.py:200-340``, ``hyper_vit.py:55-180``,
``template_mixing_vit.py:150-330``). Here it is one module consuming an
already-embedded token grid (B, N, D) — the variants differ only in how
they produce those tokens from channels.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.initializers import trunc_normal_init
from .channel_vit import interpolate_pos_embed
from .vit import Block

Dtype = Any


class ViTTrunk(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    attention_impl: str = "auto"
    # inference-only: last block's queries + MLP on the CLS row alone (exact;
    # same gates as channel_vit.ChannelVisionTransformer.cls_only_readout)
    cls_only_readout: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array, grid_hw, *, train: bool) -> jax.Array:
        """tokens: (B, N, D) patch tokens; grid_hw: (h0, w0) token grid.
        Returns the CLS embedding (B, D) in float32."""
        b, n, d = tokens.shape
        cls_token = self.param("cls_token", trunc_normal_init(std=0.02), (1, 1, self.embed_dim))
        pos_embed = self.param(
            "pos_embed",
            trunc_normal_init(std=0.02),
            (1, (self.img_size // self.patch_size) ** 2 + 1, self.embed_dim),
        )
        pos = interpolate_pos_embed(pos_embed, grid_hw[0], grid_hw[1]).astype(self.dtype)
        x = tokens.astype(self.dtype) + pos[:, 1:]
        cls = jnp.broadcast_to(cls_token.astype(self.dtype) + pos[:, :1], (b, 1, self.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = nn.Dropout(self.drop_rate, deterministic=not train)(x)

        # pad the token grid ONCE to the flash kernel's preferred multiple
        # (same policy as channel_vit.py): no per-layer q/k/v re-padding,
        # padded keys masked via valid_len, and the even/padded length lets
        # the fused-block path engage on TPU (N+1 is odd otherwise)
        from ..ops.attention import maybe_pad_tokens

        x, valid_len = maybe_pad_tokens(
            x, self.dtype, num_heads=self.num_heads,
            attention_impl=self.attention_impl,
        )

        # last-block CLS-only readout (see channel_vit.py) — only the CLS
        # row below survives the final slice; gates shared via vit.cls_readout_ok
        from .vit import cls_readout_ok

        cls_last = self.cls_only_readout and cls_readout_ok(
            self, train=train, drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            attention_impl=self.attention_impl,
        )
        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]
        for i in range(self.depth):
            x = Block(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=dpr[i],
                attention_impl=self.attention_impl,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, train=train, valid_len=valid_len,
              cls_query=cls_last and i == self.depth - 1)
        # LayerNorm is per-token: norm only the CLS row we read
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x[:, :1])
        return x[:, 0].astype(jnp.float32)
