"""TemplateMixingViT — first layer mixed from a shared template bank.

Reference ``models/template_mixing_vit.py``: bank ``(D/8, T, 3, 3)``
kaiming-init + per-channel coefficients ``(C_total, T)`` orthogonally init
(:249-253); the first layer is ``sum_t coef[c, t] * template[o, t, h, w]``
(:335-344) applied as a 3x3 conv with stride ``patch_size``, then a 1x1 to
D (:369-371). HCS slices channels + coef rows (:151-157).

TPU note: a 3x3 kernel with stride p is NOT a patch embedding — each token
sees only the top-left 3x3 of its patch. Implemented with
``lax.conv_general_dilated`` (dynamic kernels are fine under jit; XLA maps
it onto the MXU).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.initializers import kaiming_normal_init, scaled_orthogonal_init
from .channel_vit import SIZE_PRESETS, apply_preset_overrides
from .registry import register_model
from .trunk import ViTTrunk
from .wrappers import ChannelAdaptiveClassifier

Dtype = Any


class TemplateMixingViT(nn.Module):
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
    num_templates: int = 64
    kernel_size: int = 3
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
        k = self.kernel_size
        dim_out = self.embed_dim // 8

        bank = self.param(
            "conv1_param_bank", kaiming_normal_init(), (dim_out, self.num_templates, k, k)
        )
        coefs_all = self.param(
            "conv1_coefs", scaled_orthogonal_init(), (self.num_total_channels, self.num_templates)
        )
        # leave-one-out override carries synthesized coef rows
        coefs = channel_embed_override if channel_embed_override is not None else jnp.take(
            coefs_all, channel_ids, axis=0
        )  # (C, T)
        kernels = jnp.einsum("ct,othw->ochw", coefs, bank)  # (dim_out, C, k, k)

        # stem conv stays f32: negligible FLOPs next to the trunk, and the
        # conv transpose rule rejects bf16 operands against the f32
        # accumulator cotangent (preferred_element_type=f32 + bf16 inputs
        # breaks under jax.grad on every backend)
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32),
            kernels.astype(jnp.float32),
            window_strides=(p, p),
            padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ).astype(self.dtype)  # (B, dim_out, h', w')
        h0, w0 = y.shape[2], y.shape[3]
        tokens = y.reshape(b, dim_out, h0 * w0).transpose(0, 2, 1)
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
        )(tokens, (h0, w0), train=train)
        return cls, jnp.float32(0.0)


@register_model("templatemixingvit")
def templatemixingvit(cfg_model, mapper: dict, num_classes: int, dtype=jnp.float32):
    preset = apply_preset_overrides(
        SIZE_PRESETS[cfg_model.get("pretrained_model_name", "small")], cfg_model
    )
    img_size = cfg_model.get("img_size") or [224]
    backbone = TemplateMixingViT(
        num_total_channels=len(cfg_model.in_channel_names),
        img_size=img_size[0] if isinstance(img_size, (list, tuple)) else img_size,
        patch_size=cfg_model.get("patch_size", 16),
        drop_path_rate=cfg_model.get("drop_path_rate", 0.0),
        num_templates=cfg_model.get("num_templates") or 64,
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
