"""ConvNeXt trunk (flax, NHWC).

The reference's ConvNeXt family all wrap timm ``convnext_tiny.fb_in22k``,
keep ``stages[0..3]`` as a shared trunk and replace only the stem
(SURVEY §2.4). Zero-egress TPU pods can't pull timm weights, so the trunk
is implemented natively; ``load_torch_convnext_state`` converts a *local*
timm/torch checkpoint into the flax tree when ``model.pretrained`` is set
with a checkpoint path.

Architecture (ConvNeXt-tiny): stem Conv 4x4/4 + LN; 4 stages of depths
(3, 3, 9, 3), dims (96, 192, 384, 768); block = depthwise 7x7 conv -> LN ->
Dense 4x -> GELU -> Dense -> layer-scale gamma -> drop-path. Downsample =
LN + Conv 2x2/2. NHWC layout throughout (TPU-native conv layout).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import gelu
from ..ops.initializers import trunc_normal_init

Dtype = Any

TINY = dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768))
SMALL_CONV = dict(depths=(3, 3, 8, 2), dims=(96, 192, 384, 768))  # is_conv_small


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        y = nn.Conv(
            self.dim, (7, 7), padding=3, feature_group_count=self.dim,
            kernel_init=trunc_normal_init(std=0.02), dtype=self.dtype, name="dwconv",
        )(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(y)
        y = nn.Dense(4 * self.dim, kernel_init=trunc_normal_init(std=0.02), dtype=self.dtype, name="pwconv1")(y)
        y = gelu(y)
        y = nn.Dense(self.dim, kernel_init=trunc_normal_init(std=0.02), dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,))
        y = y * gamma.astype(y.dtype)
        if self.drop_path > 0.0 and train:
            keep = 1.0 - self.drop_path
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
            y = jnp.where(mask, y / keep, 0.0).astype(y.dtype)
        return x + y


class ConvNeXtTrunk(nn.Module):
    """stages[0..3] with optional stem-LN entry; input NHWC at stem scale."""

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    include_stem_norm: bool = True
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        if self.include_stem_norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="stem_norm")(x)
        total_blocks = sum(self.depths)
        block_idx = 0
        for si, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if si > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=f"downsample_norm_{si}")(x)
                x = nn.Conv(
                    dim, (2, 2), strides=(2, 2),
                    kernel_init=trunc_normal_init(std=0.02), dtype=self.dtype,
                    name=f"downsample_conv_{si}",
                )(x)
            for bi in range(depth):
                dpr = self.drop_path_rate * block_idx / max(total_blocks - 1, 1)
                x = ConvNeXtBlock(
                    dim=dim, drop_path=dpr, dtype=self.dtype, name=f"stage{si}_block{bi}"
                )(x, train=train)
                block_idx += 1
        return x


def feature_pool(x: jax.Array, pooling: str) -> jax.Array:
    """Final pooling (``convnext_base.py:89-102``): avg/max/avgmax/none.
    x: (B, H, W, C) -> (B, features)."""
    b = x.shape[0]
    if pooling == "avg":
        return jnp.mean(x, axis=(1, 2))
    if pooling == "max":
        return jnp.max(x, axis=(1, 2))
    if pooling in ("avg_max", "avgmax"):
        return jnp.concatenate([jnp.mean(x, axis=(1, 2)), jnp.max(x, axis=(1, 2))], axis=-1)
    if pooling == "none":
        # reference flattens CHW; match that ordering from NHWC
        return x.transpose(0, 3, 1, 2).reshape(b, -1)
    raise ValueError(f"Pooling {pooling} not supported")


def pooled_dim(pooling: str, dim: int = 768, spatial: int = 7) -> int:
    if pooling in ("avg", "max"):
        return dim
    if pooling in ("avg_max", "avgmax"):
        return 2 * dim
    return spatial * spatial * dim


class InstanceNorm2d(nn.Module):
    """torch ``nn.InstanceNorm2d(affine=True)`` on NHWC input."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return y * scale + bias


def initialize_first_conv_layer(
    stem_kernel: jax.Array,
    torch_stem_weight,
    first_layer: str,
) -> jax.Array:
    """Expand a pretrained 3-channel stem to ``in_dim`` channels.

    Reference semantics ``model_utils.py:45-91`` (ConvNeXtBase) and
    ``shared_convnext.py:64-90`` (per-chunk stems). The production config
    key is ``init_first_layer`` (the reference model code reads
    ``cfg.first_layer``, a field its production dataclass lacks — the torch
    path only works via the modules' ``__main__`` demos; we honor the yaml
    key).

    ``stem_kernel``: flax (kh, kw, in_dim, out), already random-initialized
    with kaiming fan_out — the exact distribution the REINIT branch draws.
    ``torch_stem_weight``: torch-layout (out, orig_in, kh, kw) pretrained.

    - ``reinit_as_random``: keep the random init (same distribution as
      ``nn.init.kaiming_normal_(mode='fan_out', nonlinearity='relu')``).
    - ``pretrained_pad_random``: pretrained on the first ``orig_in``
      channels, random on the rest.
    - ``pretrained_pad_avg``: as above, then channel ``orig_in + i`` gets
      ``mean(pretrained[:, i : n_avg + i])`` with ``n_avg = 2 if in_dim == 5
      else 3`` (the reference's hard-coded CHAMMI rule, slices clamped like
      torch's).
    - ``pretrained_pad_dups`` raises, as the reference's else-branch does
      (its DUPS mode exists only for the SliceParam bank —
      :func:`pad_dups_param_bank`).
    """
    import numpy as np

    mode = str(getattr(first_layer, "value", first_layer) or "reinit_as_random")
    if mode == "reinit_as_random":
        return stem_kernel
    if mode not in ("pretrained_pad_random", "pretrained_pad_avg"):
        # parity: model_utils.py:88-89 raises for every other mode
        raise NotImplementedError(f"First layer init {mode} not implemented")
    pre = np.asarray(torch_stem_weight).transpose(2, 3, 1, 0)  # (kh,kw,orig,out)
    orig_in, in_dim = pre.shape[2], stem_kernel.shape[2]
    if orig_in > in_dim:
        # the reference silently keeps the (wider) pretrained stem and later
        # fails on the channel mismatch at forward time — fail loudly here
        raise ValueError(
            f"pretrained stem has {orig_in} input channels > model in_dim {in_dim}"
        )
    if orig_in == in_dim:
        # reference no-ops (keeps the pretrained stem verbatim)
        return jnp.asarray(pre, stem_kernel.dtype)
    out = np.asarray(stem_kernel).copy()
    out[:, :, :orig_in, :] = pre
    if mode == "pretrained_pad_avg":
        n_avg = 2 if in_dim == 5 else 3
        for i, c in enumerate(range(orig_in, in_dim)):
            out[:, :, c, :] = pre[:, :, i : n_avg + i, :].mean(axis=2)
    return jnp.asarray(out, stem_kernel.dtype)


def pad_dups_param_bank(bank: jax.Array, torch_stem_weight) -> jax.Array:
    """SliceParamConvNeXt ``PRETRAINED_PAD_DUPS`` bank init
    (``slice_param_convnext.py:92-110``): each pretrained input channel is
    repeated consecutively (einops ``o i h w -> o (i d) h w``), truncated to
    the bank's channel count. ``bank``: ours-layout (out, C_total, kh, kw)."""
    import numpy as np

    pre = np.asarray(torch_stem_weight)  # (out, orig_in, kh, kw)
    total = bank.shape[1]
    num_dups = total // pre.shape[1] + 1
    dup = np.repeat(pre, num_dups, axis=1)[:, :total]
    return jnp.asarray(dup, bank.dtype)


def apply_pretrained_convnext(
    params: dict,
    torch_state: dict,
    model_name: str,
    init_first_layer=None,
    mapper: dict | None = None,
) -> dict:
    """Load a local timm-convnext-tiny torch state_dict into a ConvNeXt-family
    classifier param tree (the zero-egress stand-in for the reference's
    ``create_model(..., pretrained=True)`` + ``intialize_first_conv_layer``).

    - trunk stages/downsample/stem-LN convert via
      :func:`load_torch_convnext_state`;
    - ``convnext_base``: ``stem_conv`` expands per ``init_first_layer``
      (``convnext_base.py:14-33``); the pretrained stem bias is kept, as the
      reference keeps ``model.stem[0]``'s bias;
    - ``shared_convnext``: each per-chunk stem expands to its chunk width
      (``shared_convnext.py:33-35``, ``:64-90``), bias kept per chunk;
    - ``sliceparamconvnext``: ``PRETRAINED_PAD_DUPS`` fills the bank
      (``slice_param_convnext.py:92-110``); any other mode keeps the random
      kaiming fan_in bank, as the reference's else-branch re-inits;
    - other family members keep their generated/template stems (their
      reference ctors never touch ``first_layer`` for the stem banks).
    """
    import numpy as np

    out = dict(params)
    bb = dict(out["backbone"])
    bb["trunk"] = load_torch_convnext_state(bb["trunk"], torch_state)
    stem_w = torch_state.get("stem.0.weight")
    stem_b = torch_state.get("stem.0.bias")
    if stem_w is not None:
        if model_name == "convnext_base" and "stem_conv" in bb:
            bb["stem_conv"] = initialize_first_conv_layer(
                bb["stem_conv"], stem_w, init_first_layer
            )
            if stem_b is not None:
                bb["stem_bias"] = jnp.asarray(np.asarray(stem_b), bb["stem_bias"].dtype)
        elif model_name == "shared_convnext":
            for chunk in (mapper or {}):
                key = f"stem_conv_{chunk}"
                if key in bb:
                    bb[key] = initialize_first_conv_layer(
                        bb[key], stem_w, init_first_layer
                    )
                    if stem_b is not None:
                        bb[f"stem_bias_{chunk}"] = jnp.asarray(
                            np.asarray(stem_b), bb[f"stem_bias_{chunk}"].dtype
                        )
        elif model_name == "sliceparamconvnext" and "conv1_param_bank" in bb:
            mode = str(getattr(init_first_layer, "value", init_first_layer) or "")
            if mode == "pretrained_pad_dups":
                bb["conv1_param_bank"] = pad_dups_param_bank(
                    bb["conv1_param_bank"], stem_w
                )
    out["backbone"] = bb
    return out


def load_torch_convnext_state(flax_params: dict, torch_state: dict) -> dict:
    """Map a timm convnext_tiny state_dict onto the flax trunk tree.

    Supports the trunk submodule names used above. Keys absent on either
    side are left at their current (random) init, so a custom stem coexists
    with pretrained stages.
    """
    import numpy as np

    out = jax.tree_util.tree_map(lambda x: x, flax_params)  # shallow copy

    def put(path, value):
        node = out
        for p in path[:-1]:
            if p not in node:
                return False
            node = node[p]
        if path[-1] not in node:
            return False
        cur = node[path[-1]]
        if tuple(cur.shape) != tuple(value.shape):
            return False
        # jnp.array (copy=True), NOT asarray: the source is often a numpy
        # VIEW of live torch parameter storage, and the CPU backend's
        # zero-copy device_put would alias it — later in-place torch
        # updates would then silently mutate the flax tree
        node[path[-1]] = jnp.array(value)
        return True

    for tk, tv in torch_state.items():
        v = np.asarray(tv)
        parts = tk.split(".")
        if parts[0] == "stem" and parts[1] == "1":
            put(["stem_norm", {"weight": "scale", "bias": "bias"}[parts[2]]], v)
        elif parts[0] == "stages":
            si = int(parts[1])
            if parts[2] == "downsample":
                if parts[3] == "0":  # norm
                    put([f"downsample_norm_{si}", {"weight": "scale", "bias": "bias"}[parts[4]]], v)
                else:  # conv (O, I, kh, kw) -> (kh, kw, I, O)
                    if parts[4] == "weight":
                        put([f"downsample_conv_{si}", "kernel"], v.transpose(2, 3, 1, 0))
                    else:
                        put([f"downsample_conv_{si}", "bias"], v)
            elif parts[2] == "blocks":
                bi = int(parts[3])
                base = f"stage{si}_block{bi}"
                rest = parts[4:]
                if rest[0] == "conv_dw":
                    if rest[1] == "weight":
                        put([base, "dwconv", "kernel"], v.transpose(2, 3, 1, 0))
                    else:
                        put([base, "dwconv", "bias"], v)
                elif rest[0] == "norm":
                    put([base, "norm", {"weight": "scale", "bias": "bias"}[rest[1]]], v)
                elif rest[0] in ("mlp", "fc1", "fc2"):
                    sub = rest[1] if rest[0] == "mlp" else rest[0]
                    name = {"fc1": "pwconv1", "fc2": "pwconv2"}[sub]
                    if rest[-1] == "weight":
                        put([base, name, "kernel"], v.T)
                    else:
                        put([base, name, "bias"], v)
                elif rest[0] == "gamma":
                    put([base, "gamma"], v)
    return out
