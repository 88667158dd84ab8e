"""ConvNeXt family — six CHAMMI baselines with channel-adaptive stems.

Reference SURVEY §2.4: all wrap a ConvNeXt-tiny trunk and replace only the
stem. Uniform call signature matches the ViT zoo:
``(x, channel_ids, train, channel_embed_override)``; models whose stem
depends on the *chunk identity* (SharedConvNeXt's per-chunk convs,
separate-coef/emb variants, DepthwiseConvNeXt's per-chunk patch embed /
pool weights) carry a static ``chunk`` field — the trainer clones the model
per chunk (one jit specialization each, which the per-chunk channel counts
force anyway).

Stems produce NHWC features at stem scale; the shared trunk + feature
pooling follow (``convnext_base.py:89-102``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.initializers import (
    conv_patch_init,
    kaiming_normal_init,
    normal_div8_init,
    normal_init,
    scaled_orthogonal_init,
    trunc_normal_init,
)


def _adaptive_pool_4x4(y: jax.Array, reduce_fn) -> jax.Array:
    """torch ``adaptive_{avg,max}_pool2d(x, (4, 4))`` over trailing 2 dims."""
    *lead, hp, wp = y.shape
    rows = [reduce_fn(y[..., (i * hp) // 4 : ((i + 1) * hp) // 4, :], -2) for i in range(4)]
    y4 = jnp.stack(rows, axis=-2)  # (..., 4, wp)
    cols = [reduce_fn(y4[..., :, (j * wp) // 4 : ((j + 1) * wp) // 4], -1) for j in range(4)]
    return jnp.stack(cols, axis=-1)  # (..., 4, 4)
from .convnext import SMALL_CONV, TINY, ConvNeXtTrunk, InstanceNorm2d, feature_pool
from .hypernet import HyperNetwork
from .registry import register_model
from .wrappers import ChannelAdaptiveClassifier

Dtype = Any

STEM_DIM = 96
STEM_KERNEL = 4


def _fan_out_init(shape_fan_out: int):
    """torch kaiming_normal_(mode='fan_out', relu): N(0, 2/fan_out)."""
    return kaiming_normal_init(fan_in=shape_fan_out)


class _ConvNeXtCore(nn.Module):
    """Shared trunk + pooling; subclasses implement ``stem``."""

    mapper: Tuple[Tuple[str, Tuple[int, ...]], ...]
    chunk: Optional[str] = None
    pooling: str = "avg"
    is_conv_small: bool = False
    include_stem_norm: bool = True
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    def mapper_dict(self) -> Dict[str, list]:
        return {k: list(v) for k, v in self.mapper}

    def chunk_name(self) -> str:
        if self.chunk is not None:
            return self.chunk
        return next(iter(self.mapper_dict()))

    def trunk(self, y: jax.Array, *, train: bool) -> jax.Array:
        arch = SMALL_CONV if self.is_conv_small else TINY
        y = ConvNeXtTrunk(
            include_stem_norm=self.include_stem_norm,
            drop_path_rate=self.drop_path_rate,
            dtype=self.dtype,
            name="trunk",
            **arch,
        )(y, train=train)
        return feature_pool(y, self.pooling).astype(jnp.float32)


class ConvNeXtBase(_ConvNeXtCore):
    """Single model per chunk: plain Conv 4x4/4 stem over ``in_dim`` channels
    (``convnext_base.py:14-106``). The stem init defaults to the
    REINIT_AS_RANDOM distribution; with a local torch checkpoint
    (``model.pretrained``/``pretrained_ckpt``) the trainer applies the
    PRETRAINED_PAD_RANDOM / PRETRAINED_PAD_AVG expansion via
    ``convnext.initialize_first_conv_layer`` (``model_utils.py:45-91``,
    golden-tested in tests/test_reference_parity.py)."""

    in_dim: int = 3

    @nn.compact
    def __call__(self, x, channel_ids, *, train: bool, channel_embed_override=None):
        w = self.param(
            "stem_conv", _fan_out_init(STEM_DIM * STEM_KERNEL * STEM_KERNEL),
            (STEM_KERNEL, STEM_KERNEL, self.in_dim, STEM_DIM),
        )
        b = self.param("stem_bias", nn.initializers.zeros, (STEM_DIM,))
        y = jax.lax.conv_general_dilated(
            x.transpose(0, 2, 3, 1).astype(self.dtype), w.astype(self.dtype),
            (STEM_KERNEL, STEM_KERNEL), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(self.dtype)
        return self.trunk(y, train=train), jnp.float32(0.0)


class SharedConvNeXt(_ConvNeXtCore):
    """Per-chunk stem convs {Allen: 3, HPA: 4, CP: 5} + shared trunk
    (``shared_convnext.py:29-49``, forward :134-154)."""

    @nn.compact
    def __call__(self, x, channel_ids, *, train: bool, channel_embed_override=None):
        stems = {}
        for chunk, ids in self.mapper_dict().items():
            stems[chunk] = (
                self.param(
                    f"stem_conv_{chunk}", _fan_out_init(STEM_DIM * STEM_KERNEL * STEM_KERNEL),
                    (STEM_KERNEL, STEM_KERNEL, len(ids), STEM_DIM),
                ),
                self.param(f"stem_bias_{chunk}", nn.initializers.zeros, (STEM_DIM,)),
            )
        w, b = stems[self.chunk_name()]
        y = jax.lax.conv_general_dilated(
            x.transpose(0, 2, 3, 1).astype(self.dtype), w.astype(self.dtype),
            (STEM_KERNEL, STEM_KERNEL), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b.astype(self.dtype)
        return self.trunk(y, train=train), jnp.float32(0.0)


class SliceParamConvNeXt(_ConvNeXtCore):
    """Global stem bank (96, C_total, 4, 4) sliced by channel ids
    (``slice_param_convnext.py:53-56``, :110-123); optional per-class-channel
    embedding add (:58-63); ``duplicate`` shares one column across channels."""

    num_total_channels: int = 8
    slice_class_emb: bool = False
    duplicate: bool = False
    class_emb_idx: Tuple[Tuple[str, Tuple[int, ...]], ...] = ()

    @nn.compact
    def __call__(self, x, channel_ids, *, train: bool, channel_embed_override=None):
        c = x.shape[1]
        n_bank = 1 if self.duplicate else self.num_total_channels
        bank = self.param(
            "conv1_param_bank", kaiming_normal_init(fan_in=n_bank * STEM_KERNEL * STEM_KERNEL),
            (STEM_DIM, n_bank, STEM_KERNEL, STEM_KERNEL),
        )
        if self.duplicate:
            w = jnp.broadcast_to(bank, (STEM_DIM, c, STEM_KERNEL, STEM_KERNEL))
        else:
            w = jnp.take(bank, channel_ids, axis=1)  # (96, C, 4, 4)
            if self.slice_class_emb:
                class_emb = self.param(
                    "class_emb", normal_div8_init(), (STEM_DIM, 12, STEM_KERNEL, STEM_KERNEL)
                )
                idx = dict(self.class_emb_idx)[self.chunk_name()]
                w = w + class_emb[:, jnp.asarray(list(idx))]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (STEM_KERNEL, STEM_KERNEL), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NHWC"),
        )
        return self.trunk(y, train=train), jnp.float32(0.0)


class TemplateMixingConvNeXt(_ConvNeXtCore):
    """Stem = sum_t coef[c, t] * template[o, t, h, w]
    (``template_mixing_convnext.py:36-53``, mix :90-103). ``separate_coef``
    keeps an independent coefficient table per chunk."""

    num_total_channels: int = 8
    num_templates: int = 64
    separate_coef: bool = False

    @nn.compact
    def __call__(self, x, channel_ids, *, train: bool, channel_embed_override=None):
        bank = self.param(
            "conv1_param_bank",
            kaiming_normal_init(fan_in=self.num_templates * STEM_KERNEL * STEM_KERNEL),
            (STEM_DIM, self.num_templates, STEM_KERNEL, STEM_KERNEL),
        )
        if self.separate_coef:
            tables = {
                chunk: self.param(
                    f"conv1_coefs_chunk_{chunk}", scaled_orthogonal_init(),
                    (len(ids), self.num_templates),
                )
                for chunk, ids in self.mapper_dict().items()
            }
            coefs = tables[self.chunk_name()]
        else:
            table = self.param(
                "conv1_coefs", scaled_orthogonal_init(),
                (self.num_total_channels, self.num_templates),
            )
            coefs = jnp.take(table, channel_ids, axis=0)
        if channel_embed_override is not None:
            coefs = channel_embed_override
        w = jnp.einsum("ct,othw->ochw", coefs, bank)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (STEM_KERNEL, STEM_KERNEL), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NHWC"),
        )
        return self.trunk(y, train=train), jnp.float32(0.0)


class HyperConvNeXt(_ConvNeXtCore):
    """Channel-id z-embedding (or per-chunk table, ``separate_emb``) ->
    HyperNetwork -> stem kernels (``hypernet_convnext.py:57-68``, :100-185)."""

    num_total_channels: int = 8
    z_dim: int = 64
    hidden_dim: int = 64
    separate_emb: bool = False

    @nn.compact
    def __call__(self, x, channel_ids, *, train: bool, channel_embed_override=None):
        if self.separate_emb:
            tables = {
                chunk: self.param(f"conv1_emb_chunk_{chunk}", normal_init(), (len(ids), self.z_dim))
                for chunk, ids in self.mapper_dict().items()
            }
            z = tables[self.chunk_name()]
        else:
            table = self.param(
                "conv1_emb", trunc_normal_init(std=1.0), (self.num_total_channels, self.z_dim)
            )
            z = jnp.take(table, channel_ids, axis=0)
        if channel_embed_override is not None:
            z = channel_embed_override
        w = HyperNetwork(
            z_dim=self.z_dim, d=self.hidden_dim, kernel_size=STEM_KERNEL,
            out_size=STEM_DIM, in_size=1, name="hypernet",
        )(z)  # (96, C, 4, 4)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (STEM_KERNEL, STEM_KERNEL), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NHWC"),
        )
        return self.trunk(y, train=train), jnp.float32(0.0)


class FanAttentionV2(nn.Module):
    """Per-(sample, channel) sigmoid attention (``depthwise_convnext.py:47-66``)."""

    emb_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # x (B, C, D)
        q = nn.Dense(self.emb_dim // 16, name="wq1")(x)
        q = nn.Dense(self.emb_dim, name="wq2")(jax.nn.relu(q))
        keys = jnp.mean(x, axis=1)  # (B, D)
        sim = jnp.einsum("bch,bh->bc", q, keys)
        return jax.nn.sigmoid(sim)


class DepthwiseConvNeXt(_ConvNeXtCore):
    """Per-channel depthwise 3x3 bank + channel pooling + conv1x1/InstanceNorm
    stem (``depthwise_convnext.py:107-427``). CHAMMI chunks get a per-chunk
    depthwise patch-embed conv; single-chunk datasets reduce spatially with
    avg-pool when ``reduce_size``. The reference's 8-image micro-batch conv
    loop (:380-386) is unnecessary on TPU — XLA handles the grouped conv."""

    num_total_channels: int = 8
    kernels_per_channel: int = 64
    patch_size: int = 4
    pooling_channel_type: str = "avg"
    reduce_size: bool = True

    @nn.compact
    def __call__(self, x, channel_ids, *, train: bool, channel_embed_override=None):
        b, c, h, w = x.shape
        k = self.kernels_per_channel
        mapper = self.mapper_dict()
        is_chammi = "train" not in mapper

        if is_chammi:
            # per-chunk depthwise patch embed (depthwise_convnext.py:107-123)
            convs = {
                chunk: (
                    self.param(
                        f"patch_emb_{chunk}",
                        conv_patch_init(self.patch_size**2),  # torch Conv2d default
                        (len(ids), 1, self.patch_size, self.patch_size),
                    ),
                    self.param(f"patch_emb_bias_{chunk}", nn.initializers.zeros, (len(ids),)),
                )
                for chunk, ids in mapper.items()
            }
            pw, pb = convs[self.chunk_name()]
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype), pw.astype(self.dtype),
                (self.patch_size, self.patch_size), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=c,
            ) + pb.astype(self.dtype)[None, :, None, None]
        elif self.patch_size > 1 and self.reduce_size:
            x = nn.avg_pool(
                x.transpose(0, 2, 3, 1),
                (self.patch_size, self.patch_size),
                strides=(self.patch_size, self.patch_size),
            ).transpose(0, 3, 1, 2)

        bank = self.param(
            "conv1depthwise_param_bank", kaiming_normal_init(fan_in=9),
            (self.num_total_channels * k, 1, 3, 3),
        )
        bank4 = bank.reshape(self.num_total_channels, k, 3, 3)
        wk = (
            channel_embed_override
            if channel_embed_override is not None
            else jnp.take(bank4, channel_ids, axis=0)
        ).reshape(c * k, 1, 3, 3)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), wk.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=c,
        )  # (B, C*k, h', w')
        hp, wp = y.shape[2], y.shape[3]
        y = y.reshape(b, c, k, hp, wp)

        pool = self.pooling_channel_type
        if pool == "avg":
            y = jnp.mean(y, axis=1)
        elif pool == "sum":
            y = jnp.sum(y, axis=1)
        elif pool in ("weighted_sum_random", "weighted_sum_one",
                      "weighted_sum_random_no_softmax", "weighted_sum_one_no_softmax"):
            init = normal_init() if "random" in pool else nn.initializers.ones
            weights_all = self.param("weighted_sum_pooling", init, (self.num_total_channels,))
            wsel = jnp.take(weights_all, channel_ids, axis=0)
            if "no_softmax" not in pool:
                wsel = jax.nn.softmax(wsel)
            y = jnp.sum(y * wsel[None, :, None, None, None].astype(y.dtype), axis=1)
        elif pool in ("weighted_sum_random_pairwise", "weighted_sum_random_pairwise_no_softmax"):
            tables = {
                chunk: self.param(f"weighted_sum_pooling_{chunk}", normal_init(), (len(ids),))
                for chunk, ids in mapper.items()
            }
            wsel = tables[self.chunk_name()][: c]
            if "no_softmax" not in pool:
                wsel = jax.nn.softmax(wsel)
            y = jnp.sum(y * wsel[None, :, None, None, None].astype(y.dtype), axis=1)
        elif pool == "attention":
            # adaptive 4x4 avg+max summaries -> FanAttentionV2 (dw_convnext.py:391-427)
            x_avg = _adaptive_pool_4x4(y, jnp.mean).reshape(b, c, k, 16)
            x_max = _adaptive_pool_4x4(y, jnp.max).reshape(b, c, k, 16)
            # cat over the k axis, reference layout [avg_k0..k-1 | max_k0..]
            # (depthwise_convnext.py:420-424) — checkpoint-transplant exact
            feats = jnp.concatenate([x_avg, x_max], axis=2).reshape(b, c, k * 32)
            attn = FanAttentionV2(emb_dim=k * 32, name="attn_pooling")(feats.astype(jnp.float32))
            y = jnp.sum(y * attn[:, :, None, None, None].astype(y.dtype), axis=1)
        else:
            raise ValueError(f"Invalid pooling_channel_type: {pool}")

        # stem: conv1x1 -> InstanceNorm (depthwise_convnext.py:172-175), NHWC
        # the reference's conv1x1 is bias-free (model_utils.py:11-13)
        y = y.transpose(0, 2, 3, 1)
        y = nn.Dense(STEM_DIM, use_bias=False, dtype=self.dtype, name="stem_conv1x1")(y)
        y = InstanceNorm2d(STEM_DIM, name="stem_norm_inst")(y.astype(jnp.float32))
        return self.trunk(y.astype(self.dtype), train=train), jnp.float32(0.0)


# ---------------------------------------------------------------------------
# factories
# ---------------------------------------------------------------------------


def _freeze_mapper(mapper: dict):
    return tuple((k, tuple(v)) for k, v in mapper.items())


def _wrap(backbone, cfg_model, mapper, num_classes, pooling):
    from .convnext import pooled_dim

    return ChannelAdaptiveClassifier(
        backbone=backbone,
        embed_dim=pooled_dim(pooling),
        num_classes=num_classes,
        with_head="Allen" not in mapper,
        learnable_temp=cfg_model.get("learnable_temp", False),
        temperature=cfg_model.get("temperature", 0.11111),
    )


def _common(cfg_model, mapper):
    return dict(
        mapper=_freeze_mapper(mapper),
        pooling=cfg_model.get("pooling", "avg") or "avg",
        is_conv_small=bool(cfg_model.get("is_conv_small", False)),
        drop_path_rate=cfg_model.get("drop_path_rate", 0.0) or 0.0,
    )


@register_model("convnext_base")
def convnext_base(cfg_model, mapper, num_classes, dtype=jnp.float32):
    pooling = cfg_model.get("pooling", "avg") or "avg"
    in_dim = cfg_model.get("in_dim") or len(next(iter(mapper.values())))
    bb = ConvNeXtBase(in_dim=in_dim, dtype=dtype, **_common(cfg_model, mapper))
    return _wrap(bb, cfg_model, mapper, num_classes, pooling)


@register_model("shared_convnext")
def shared_convnext(cfg_model, mapper, num_classes, dtype=jnp.float32):
    pooling = cfg_model.get("pooling", "avg") or "avg"
    bb = SharedConvNeXt(dtype=dtype, **_common(cfg_model, mapper))
    return _wrap(bb, cfg_model, mapper, num_classes, pooling)


@register_model("sliceparamconvnext")
def sliceparam_convnext(cfg_model, mapper, num_classes, dtype=jnp.float32):
    pooling = cfg_model.get("pooling", "avg") or "avg"
    class_emb_idx = {"Allen": (0, 1, 2), "HPA": (3, 4, 5, 6), "CP": (7, 8, 9, 10, 11)}
    bb = SliceParamConvNeXt(
        num_total_channels=1 if cfg_model.get("duplicate") else len(cfg_model.in_channel_names),
        slice_class_emb=bool(cfg_model.get("slice_class_emb", False)),
        duplicate=bool(cfg_model.get("duplicate", False)),
        class_emb_idx=tuple(class_emb_idx.items()),
        dtype=dtype,
        **_common(cfg_model, mapper),
    )
    return _wrap(bb, cfg_model, mapper, num_classes, pooling)


@register_model("templatemixingconvnext")
def template_mixing_convnext(cfg_model, mapper, num_classes, dtype=jnp.float32):
    pooling = cfg_model.get("pooling", "avg") or "avg"
    bb = TemplateMixingConvNeXt(
        num_total_channels=len(cfg_model.in_channel_names),
        num_templates=cfg_model.get("num_templates") or 64,
        separate_coef=bool(cfg_model.get("separate_coef", False)),
        include_stem_norm=False,  # reference drops stem LN here (:66)
        dtype=dtype,
        **_common(cfg_model, mapper),
    )
    return _wrap(bb, cfg_model, mapper, num_classes, pooling)


@register_model("hyperconvnext")
def hyper_convnext(cfg_model, mapper, num_classes, dtype=jnp.float32):
    pooling = cfg_model.get("pooling", "avg") or "avg"
    bb = HyperConvNeXt(
        num_total_channels=len(cfg_model.in_channel_names),
        z_dim=cfg_model.get("z_dim") or 64,
        hidden_dim=cfg_model.get("hidden_dim") or 64,
        separate_emb=bool(cfg_model.get("separate_emb", False)),
        dtype=dtype,
        **_common(cfg_model, mapper),
    )
    return _wrap(bb, cfg_model, mapper, num_classes, pooling)


@register_model("depthwiseconvnext")
def depthwise_convnext(cfg_model, mapper, num_classes, dtype=jnp.float32):
    pooling = cfg_model.get("pooling", "avg") or "avg"
    bb = DepthwiseConvNeXt(
        num_total_channels=len(cfg_model.in_channel_names),
        kernels_per_channel=cfg_model.get("kernels_per_channel") or 64,
        patch_size=cfg_model.get("patch_size", 4) or 4,
        pooling_channel_type=str(cfg_model.get("pooling_channel_type") or "avg"),
        reduce_size=bool(cfg_model.get("reduce_size", True)),
        include_stem_norm=False,
        dtype=dtype,
        **_common(cfg_model, mapper),
    )
    return _wrap(bb, cfg_model, mapper, num_classes, pooling)
