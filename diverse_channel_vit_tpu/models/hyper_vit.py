"""HyperViT — a hypernetwork generates the first conv from channel ids.

Reference ``models/hyper_vit.py``: channel-id -> ``conv1_emb`` z-vector
(:71), ``HyperNetwork(z)`` -> per-channel p x p kernels with
``dim_out = D/8`` outputs (:81, :235-236), strided conv then a 1x1
up-projection to D (:82, :237); HCS slices input channels + z rows
(:261-266); leave-one-out synthesis operates on z (:169-233).

TPU layout: the generated per-channel kernels land as an einsum over
im2col patches — ``(B, C, N, p*p) x (C, p*p, D/8) -> (B, N, D/8)`` (the
multi-channel conv sums over C), then a dense 1x1 to D.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.initializers import scaled_orthogonal_init, trunc_normal_init
from ..ops.patch_embed import extract_patches
from .channel_vit import SIZE_PRESETS, apply_preset_overrides
from .hypernet import HyperNetwork
from .registry import register_model
from .trunk import ViTTrunk
from .wrappers import ChannelAdaptiveClassifier

Dtype = Any


class HyperNetViT(nn.Module):
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
    z_dim: int = 64
    hidden_dim: int = 64
    orthogonal_init: bool = False
    use_conv1x1: bool = False
    freeze_z_emb: bool = False
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
        dim_out = self.embed_dim // 8

        z_init = (
            scaled_orthogonal_init()
            if self.orthogonal_init
            else trunc_normal_init(std=1.0)  # nn.Embedding default: N(0,1)
        )
        conv1_emb = self.param("conv1_emb", z_init, (self.num_total_channels, self.z_dim))
        if self.freeze_z_emb:
            conv1_emb = jax.lax.stop_gradient(conv1_emb)
        # leave-one-out override carries synthesized z rows (hyper_vit.py:169-233)
        z = channel_embed_override if channel_embed_override is not None else jnp.take(
            conv1_emb, channel_ids, axis=0
        )  # (C, z_dim)

        kernels = HyperNetwork(
            z_dim=self.z_dim,
            d=self.hidden_dim,
            kernel_size=p,
            out_size=dim_out,
            in_size=1,
            use_conv1x1=self.use_conv1x1,
            name="hypernet",
        )(z)  # (dim_out, C, p, p)
        wk = kernels.reshape(dim_out, c, p * p).transpose(1, 2, 0)  # (C, p*p, dim_out)

        patches = extract_patches(x.astype(self.dtype), p)  # (B, C, N, p*p)
        tokens = jnp.einsum(
            "bcnp,cpd->bnd", patches, wk.astype(self.dtype), preferred_element_type=jnp.float32
        ).astype(self.dtype)  # conv over all channels summed
        tokens = nn.Dense(self.embed_dim, dtype=self.dtype, name="conv1x1")(tokens)

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
        )(tokens, (h // p, w // p), train=train)
        return cls, jnp.float32(0.0)


@register_model("hypervit_adapt")
def hypervit_adapt(cfg_model, mapper: dict, num_classes: int, dtype=jnp.float32):
    preset = apply_preset_overrides(
        SIZE_PRESETS[cfg_model.get("pretrained_model_name", "small")], cfg_model
    )
    img_size = cfg_model.get("img_size") or [224]
    backbone = HyperNetViT(
        num_total_channels=len(cfg_model.in_channel_names),
        img_size=img_size[0] if isinstance(img_size, (list, tuple)) else img_size,
        patch_size=cfg_model.get("patch_size", 16),
        drop_path_rate=cfg_model.get("drop_path_rate", 0.0),
        z_dim=cfg_model.get("z_dim") or 64,
        hidden_dim=cfg_model.get("hidden_dim") or 64,
        orthogonal_init=cfg_model.get("orthogonal_init", False),
        use_conv1x1=cfg_model.get("use_conv1x1", False),
        freeze_z_emb=cfg_model.get("freeze_z_emb", False),
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
