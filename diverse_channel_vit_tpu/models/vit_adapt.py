"""ViTAdapt — plain-ViT baseline with a sliceable channel-weight bank.

Reference ``models/vit_adapt.py``: a standard ViT whose first layer is a
Conv2d over the input channels; HCS slices input channels
(``vit_adapt.py:60-67``). TPU redesign: the patch-embed weight is a *bank*
``(C_total, p*p, D)`` indexed by global channel ids, so any channel subset
(HCS at train, chunk remap / leave-one-out at eval) is a gather — static
shapes, no weight surgery. Summing per-channel projections is exactly the
multi-channel Conv2d.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.initializers import conv_patch_init, trunc_normal_init
from ..ops.patch_embed import extract_patches
from .channel_vit import SIZE_PRESETS, apply_preset_overrides, interpolate_pos_embed
from .registry import register_model
from .vit import Block
from .wrappers import ChannelAdaptiveClassifier

Dtype = Any


class SlicedPatchVisionTransformer(nn.Module):
    """ViT with a per-channel first-layer weight bank, CLS readout."""

    num_total_channels: int
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
    # inference-only last-block CLS readout (see channel_vit.py gates)
    cls_only_readout: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        channel_ids: jax.Array,
        *,
        train: bool,
        channel_embed_override: Optional[jax.Array] = None,
    ):
        b, c, h, w = x.shape
        p = self.patch_size
        # weight bank (C_total, p*p, D); fan_in matches Conv2d(C_total, D, p)
        bank = self.param(
            "proj_bank",
            conv_patch_init(self.num_total_channels * p * p),
            (self.num_total_channels, p * p, self.embed_dim),
        )
        bias = self.param("proj_bias", nn.initializers.zeros, (self.embed_dim,))
        wk = jnp.take(bank, channel_ids, axis=0).astype(self.dtype)  # (C, p*p, D)
        patches = extract_patches(x.astype(self.dtype), p)  # (B, C, N, p*p)
        tokens = (
            jnp.einsum("bcnp,cpd->bnd", patches, wk, preferred_element_type=jnp.float32).astype(self.dtype)
            + bias.astype(self.dtype)
        )  # (B, N, D): channel contributions summed, like Conv2d

        cls_token = self.param("cls_token", trunc_normal_init(std=0.02), (1, 1, self.embed_dim))
        pos_embed = self.param(
            "pos_embed",
            trunc_normal_init(std=0.02),
            (1, (self.img_size // p) ** 2 + 1, self.embed_dim),
        )
        pos = interpolate_pos_embed(pos_embed, h // p, w // p).astype(self.dtype)
        tokens = tokens + pos[:, 1:]
        cls = jnp.broadcast_to(cls_token.astype(self.dtype) + pos[:, :1], (b, 1, self.embed_dim))
        xseq = jnp.concatenate([cls, tokens], axis=1)
        xseq = nn.Dropout(self.drop_rate, deterministic=not train)(xseq)

        # pad once to the flash kernel's preferred multiple (see trunk.py)
        from ..ops.attention import maybe_pad_tokens

        xseq, valid_len = maybe_pad_tokens(
            xseq, self.dtype, num_heads=self.num_heads,
            attention_impl=self.attention_impl,
        )

        from .vit import cls_readout_ok

        cls_last = self.cls_only_readout and cls_readout_ok(
            self, train=train, drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            attention_impl=self.attention_impl,
        )
        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]
        for i in range(self.depth):
            xseq = Block(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=dpr[i],
                attention_impl=self.attention_impl,
                dtype=self.dtype,
                name=f"block_{i}",
            )(xseq, train=train, valid_len=valid_len,
              cls_query=cls_last and i == self.depth - 1)

        # LayerNorm is per-token: norm only the CLS row we read
        xseq = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(xseq[:, :1])
        return xseq[:, 0].astype(jnp.float32), jnp.float32(0.0)


@register_model("vit_adapt")
def vit_adapt(cfg_model, mapper: dict, num_classes: int, dtype=jnp.float32):
    preset = apply_preset_overrides(
        SIZE_PRESETS[cfg_model.get("pretrained_model_name", "small")], cfg_model
    )
    img_size = cfg_model.get("img_size") or [224]
    backbone = SlicedPatchVisionTransformer(
        num_total_channels=len(cfg_model.in_channel_names),
        img_size=img_size[0] if isinstance(img_size, (list, tuple)) else img_size,
        patch_size=cfg_model.get("patch_size", 16),
        drop_path_rate=cfg_model.get("drop_path_rate", 0.0),
        attention_impl=cfg_model.get("attention_impl", "auto"),
        cls_only_readout=bool(cfg_model.get("cls_only_readout", True)),
        dtype=dtype,
        **preset,
    )
    return ChannelAdaptiveClassifier(
        backbone=backbone,
        embed_dim=preset["embed_dim"],
        num_classes=num_classes,
        with_head="Allen" not in mapper,
        learnable_temp=cfg_model.get("learnable_temp", False),
        temperature=cfg_model.get("temperature", 0.11111),
    )
