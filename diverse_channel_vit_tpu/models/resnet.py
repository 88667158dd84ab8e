"""Flax ResNet-18/34 (torchvision BasicBlock layout) — feature backbones.

Two reference roles need a ResNet without torchvision in the env:

- the feature-extraction CLI's ``--model resnet18`` backbone
  (``morphem/feature_extraction`` role) — ``resnet18_jax`` runs the same
  torchvision-layout weights TPU-side;
- DiChaViT's ``hcs_sampling=lowest_cosine_prob_resnet34`` DCS variant
  (``dichavit.py:68-79``, ``:162-167``): a frozen ResNet-34 embeds each
  channel (replicated to RGB) and channels are sampled by the batch-mean
  pairwise cosine of those embeddings.

Inference-only: BatchNorm uses the checkpoint's running statistics (the
reference always runs these backbones under ``eval()``), folded into one
affine per BN. ``load_torch_resnet_state`` maps a torchvision/timm
``resnet{18,34}`` state_dict onto the param tree.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

RESNET18_LAYERS = (2, 2, 2, 2)
RESNET34_LAYERS = (3, 4, 6, 3)
_DIMS = (64, 128, 256, 512)


class FrozenBatchNorm(nn.Module):
    """Eval-mode BN: y = (x - mean) / sqrt(var + eps) * scale + bias."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return x * inv + (bias - mean * inv)


def _conv(x, features, kernel, stride, name):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(kernel // 2, kernel // 2)] * 2, use_bias=False,
                   name=name)(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = _conv(x, self.features, 3, self.stride, "conv1")
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = jax.nn.relu(y)
        y = _conv(y, self.features, 3, 1, "conv2")
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        if self.downsample:
            x = _conv(x, self.features, 1, self.stride, "ds_conv")
            x = FrozenBatchNorm(self.features, name="ds_bn")(x)
        return jax.nn.relu(x + y)


class ResNetFeatures(nn.Module):
    """torchvision-layout ResNet trunk; input NCHW, output (B, 512)
    global-avg-pooled features (the ``fc = Identity`` role)."""

    layers: Sequence[int] = RESNET34_LAYERS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype).transpose(0, 2, 3, 1)  # NHWC
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = jax.nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for li, (n, feats) in enumerate(zip(self.layers, _DIMS)):
            for bi in range(n):
                stride = 2 if (li > 0 and bi == 0) else 1
                x = BasicBlock(
                    features=feats, stride=stride,
                    downsample=(bi == 0 and li > 0),
                    name=f"layer{li + 1}_{bi}",
                )(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # (B, 512)


def load_torch_resnet_state(flax_params: dict, torch_state: dict) -> dict:
    """Map a torchvision/timm ``resnet18``/``resnet34`` state_dict onto the
    :class:`ResNetFeatures` tree (``fc.*`` ignored)."""
    import numpy as np

    out = jax.tree_util.tree_map(lambda x: x, flax_params)

    def put(path, value):
        node = out
        for p in path[:-1]:
            node = node[p]
        assert tuple(node[path[-1]].shape) == tuple(value.shape), (path, value.shape)
        node[path[-1]] = jnp.asarray(value)

    def put_bn(prefix_t, path_f):
        put(path_f + ["scale"], np.asarray(torch_state[prefix_t + ".weight"]))
        put(path_f + ["bias"], np.asarray(torch_state[prefix_t + ".bias"]))
        put(path_f + ["mean"], np.asarray(torch_state[prefix_t + ".running_mean"]))
        put(path_f + ["var"], np.asarray(torch_state[prefix_t + ".running_var"]))

    def put_conv(prefix_t, path_f):
        w = np.asarray(torch_state[prefix_t + ".weight"])  # (O, I, kh, kw)
        put(path_f + ["kernel"], w.transpose(2, 3, 1, 0))

    put_conv("conv1", ["conv1"])
    put_bn("bn1", ["bn1"])
    li = 0
    while f"layer{li + 1}.0.conv1.weight" in torch_state:
        bi = 0
        while f"layer{li + 1}.{bi}.conv1.weight" in torch_state:
            t = f"layer{li + 1}.{bi}"
            f = f"layer{li + 1}_{bi}"
            put_conv(t + ".conv1", [f, "conv1"])
            put_bn(t + ".bn1", [f, "bn1"])
            put_conv(t + ".conv2", [f, "conv2"])
            put_bn(t + ".bn2", [f, "bn2"])
            if t + ".downsample.0.weight" in torch_state:
                put_conv(t + ".downsample.0", [f, "ds_conv"])
                put_bn(t + ".downsample.1", [f, "ds_bn"])
            bi += 1
        li += 1
    return out


def per_channel_features(apply_fn, x: jax.Array) -> jax.Array:
    """Reference ``get_channel_emb_resnet34`` (``dichavit.py:100-111``):
    each input channel replicated to RGB through the frozen backbone.

    x (B, C, H, W) -> (B, C, F). Channels fold into the batch so the
    backbone runs ONE batched forward instead of a per-channel loop."""
    b, c, h, w = x.shape
    flat = x.reshape(b * c, 1, h, w)
    rgb = jnp.broadcast_to(flat, (b * c, 3, h, w))
    feats = apply_fn(rgb)  # (B*C, F)
    return feats.reshape(b, c, -1)
