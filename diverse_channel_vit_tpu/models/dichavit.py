"""DiChaViT and ChannelViT factories.

DiChaViT (reference ``models/dichavit.py``) = ChannelViT backbone + three
diversity mechanisms:

1. DCS — diverse channel sampling (``dichavit.py:137-216``): runs in the
   train step via :func:`~diverse_channel_vit_tpu.ops.sampling.dcs_select`
   (shape-changing, so outside the module).
2. CDL — channel-embedding proxy loss (``dichavit.py:399-404``): inside
   :class:`~.channel_vit.ChannelVisionTransformer` when
   ``proxy_loss_lambda > 0``.
3. TDL — token-feature orthogonality loss (``dichavit.py:378-391``):
   inside the backbone when ``ortho_loss_v1_lambda > 0``.

ChannelViTAdapt (reference ``models/channel_vit_adapt.py``) is the same
backbone with both lambdas at 0 and uniform HCS.
"""

from __future__ import annotations

import jax.numpy as jnp

from .channel_vit import SIZE_PRESETS, apply_preset_overrides, ChannelVisionTransformer
from .registry import register_model
from .wrappers import ChannelAdaptiveClassifier


def _build_channel_vit(cfg_model, mapper: dict, num_classes: int, dtype) -> ChannelAdaptiveClassifier:
    preset = apply_preset_overrides(
        SIZE_PRESETS[cfg_model.get("pretrained_model_name", "small")], cfg_model
    )
    img_size = cfg_model.get("img_size") or [224]
    backbone = ChannelVisionTransformer(
        num_total_channels=len(cfg_model.in_channel_names),
        img_size=img_size[0] if isinstance(img_size, (list, tuple)) else img_size,
        patch_size=cfg_model.get("patch_size", 16),
        drop_path_rate=cfg_model.get("drop_path_rate", 0.0),
        use_channelvit_channels=cfg_model.get("use_channelvit_channels", True),
        orthogonal_channel_emb_init=cfg_model.get("orthogonal_channel_emb_init", False),
        freeze_channel_emb=cfg_model.get("freeze_channel_emb", False),
        proxy_loss_lambda=cfg_model.get("proxy_loss_lambda", 0.0) or 0.0,
        ortho_loss_v1_lambda=cfg_model.get("ortho_loss_v1_lambda", 0.0) or 0.0,
        proxy_orthogonal_init=cfg_model.get("proxy_orthogonal_init", False),
        gamma_s=cfg_model.get("gamma_s", 1.0),
        gamma_d=cfg_model.get("gamma_d", 0.5),
        reverse_pos_pairs=cfg_model.get("reverse_pos_pairs", False),
        use_square=cfg_model.get("use_square", False),
        temperature=cfg_model.get("temperature", 0.11111),
        attention_impl=cfg_model.get("attention_impl", "auto"),
        cls_only_readout=bool(cfg_model.get("cls_only_readout", True)),
        block_type=cfg_model.get("block_type", "block") or "block",
        dropout_tokens_hcs=cfg_model.get("dropout_tokens_hcs", "none") or "none",
        keep_rate=cfg_model.get("keep_rate"),
        token_keep_channels=cfg_model.get("token_keep_channels"),
        remat=bool(cfg_model.get("remat", False)),
        scan_blocks=bool(cfg_model.get("scan_blocks", False)),
        dtype=dtype,
        **preset,
    )
    return ChannelAdaptiveClassifier(
        backbone=backbone,
        embed_dim=preset["embed_dim"],
        num_classes=num_classes,
        with_head="Allen" not in mapper,  # dichavit.py:799-801
        learnable_temp=cfg_model.get("learnable_temp", False),
        temperature=cfg_model.get("temperature", 0.11111),
    )


@register_model("dichavit")
def dichavit(cfg_model, mapper: dict, num_classes: int, dtype=jnp.float32):
    return _build_channel_vit(cfg_model, mapper, num_classes, dtype)


@register_model("channelvit_adapt")
def channelvit_adapt(cfg_model, mapper: dict, num_classes: int, dtype=jnp.float32):
    return _build_channel_vit(cfg_model, mapper, num_classes, dtype)
