"""DepthwiseViT — per-channel depthwise patch kernels + channel pooling.

Reference ``models/depthwise_vit.py``: a parameter bank
``(C_total * D, 1, p, p)`` sliced per channel and applied as a grouped conv
(:69-71, :113-119), + channel-embedding offset, then channel pooling —
either a learned per-channel weighted sum
(``einsum("b o i h w, i -> b o h w")``, :176) or a channel-attention
mini-transformer.

TPU redesign: the grouped conv is an im2col einsum with a *gathered*
per-channel kernel bank ``(C_total, p*p, D)`` — ``einsum('bcnp,cpd->bcnd')``
— one big MXU contraction instead of C grouped-conv slices; pooling then
contracts the C axis.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.initializers import kaiming_normal_init, trunc_normal_init
from ..ops.patch_embed import extract_patches
from .channel_attention_pooling import ChannelAttentionPoolingLayer
from .channel_vit import SIZE_PRESETS, apply_preset_overrides
from .registry import register_model
from .trunk import ViTTrunk
from .wrappers import ChannelAdaptiveClassifier

Dtype = Any


class DepthwiseViT(nn.Module):
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
    pooling_channel_type: str = "channel_weights"  # or "attention"
    attn_pooling: Optional[dict] = None
    attention_impl: str = "auto"
    # inference-only last-block CLS readout, threaded to ViTTrunk (trunk.py)
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
        # bank (C_total, p*p, D) == reference's (C_total*D, 1, p, p) grouped-conv
        # params, kaiming fan_in = p*p (depthwise_vit.py:68-71, :84)
        bank = self.param(
            "depthwise_bank",
            kaiming_normal_init(fan_in=p * p),
            (self.num_total_channels, p * p, self.embed_dim),
        )
        channel_embed = self.param(
            "channel_embed", trunc_normal_init(std=0.02), (self.num_total_channels, self.embed_dim)
        )
        wk = jnp.take(bank, channel_ids, axis=0).astype(self.dtype)  # (C, p*p, D)
        patches = extract_patches(x.astype(self.dtype), p)  # (B, C, N, p*p)
        if jax.default_backend() == "cpu" and self.dtype != jnp.float32:
            # XLA:CPU's batched DotThunk cannot execute BF16xBF16=F32 (the
            # c-batched dot below); upcast there. TPU keeps bf16 MXU inputs
            # with f32 accumulation.
            patches, wk = patches.astype(jnp.float32), wk.astype(jnp.float32)
        tokens = jnp.einsum(
            "bcnp,cpd->bcnd", patches, wk, preferred_element_type=jnp.float32
        ).astype(self.dtype)  # (B, C, N, D)

        emb = channel_embed_override if channel_embed_override is not None else jnp.take(
            channel_embed, channel_ids, axis=0
        )
        tokens = tokens + emb.astype(self.dtype)[None, :, None, :]

        if self.pooling_channel_type == "channel_weights":
            # init ones/C + noise*0.002 (depthwise_vit.py:73-75)
            def _cw_init(key, shape):
                return jnp.ones(shape) / shape[0] + jax.random.normal(key, shape) * 0.002

            channel_weights = self.param("channel_weights", _cw_init, (self.num_total_channels,))
            cw = jnp.take(channel_weights, channel_ids, axis=0).astype(self.dtype)
            pooled = jnp.einsum("bcnd,c->bnd", tokens, cw)
        elif self.pooling_channel_type == "attention":
            ap = dict(self.attn_pooling or {})
            ap.pop("dim", None), ap.pop("max_num_channels", None)
            pooled = ChannelAttentionPoolingLayer(
                max_num_channels=self.num_total_channels,
                dim=self.embed_dim,
                **{k: v for k, v in ap.items() if v is not None},
                name="attn_pooling",
            )(tokens, channel_ids, train=train)
        else:
            raise ValueError("pooling_channel_type must be channel_weights or attention")

        cls = ViTTrunk(
            img_size=self.img_size,
            patch_size=p,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            attention_impl=self.attention_impl,
            cls_only_readout=self.cls_only_readout,
            dtype=self.dtype,
            name="trunk",
        )(pooled, (h // p, w // p), train=train)
        return cls, jnp.float32(0.0)


@register_model("depthwisevit_adapt")
def depthwisevit_adapt(cfg_model, mapper: dict, num_classes: int, dtype=jnp.float32, attn_pooling=None):
    preset = apply_preset_overrides(
        SIZE_PRESETS[cfg_model.get("pretrained_model_name", "small")], cfg_model
    )
    img_size = cfg_model.get("img_size") or [224]
    pooling_type = cfg_model.get("pooling_channel_type") or "channel_weights"
    if pooling_type == "attention" and attn_pooling is None:
        attn_pooling = {}
    backbone = DepthwiseViT(
        num_total_channels=len(cfg_model.in_channel_names),
        img_size=img_size[0] if isinstance(img_size, (list, tuple)) else img_size,
        patch_size=cfg_model.get("patch_size", 16),
        drop_path_rate=cfg_model.get("drop_path_rate", 0.0),
        pooling_channel_type=pooling_type,
        attn_pooling=attn_pooling,
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
