"""TPU-native DINOv2 ViT feature backbone (eval-only).

Reference role: ``morphem/feature_extraction.py:34-44`` loads
``facebookresearch/dinov2 dinov2_vits14_reg`` from torch.hub and reads
``forward_features(x)["x_norm_clstoken"]`` per channel-replicated image.
Hub downloads are impossible zero-egress, so this module re-implements the
DINOv2 architecture (patch-14 ViT + register tokens + LayerScale) in flax
and loads the weights from a LOCAL torch state dict — either the hub layout
(``cls_token`` / ``blocks.N.attn.qkv.*`` / ``ls1.gamma``) or the
HuggingFace ``Dinov2WithRegistersModel`` layout.

Positional-embedding interpolation reproduces the hub's
``interpolate_pos_encoding`` for both hub configurations (size-based
antialiased bicubic for the ``*_reg`` backbones; +0.1-scale non-AA bicubic
for the plain ones). At 224² inputs the 518-native grid (37×37) is
DOWN-scaled to 16×16, where antialias changes the result, so the tables
here implement torch's antialiased (PIL-aligned, a=-0.5) kernel —
validated bit-close against ``F.interpolate`` in tests/test_dinov2.py.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _bicubic_filter(d: np.ndarray, a: float = -0.5) -> np.ndarray:
    d = np.abs(d)
    return np.where(
        d <= 1.0,
        (a + 2) * d**3 - (a + 3) * d**2 + 1.0,
        np.where(d < 2.0, a * d**3 - 5 * a * d**2 + 8 * a * d - 4 * a, 0.0),
    )


def torch_bicubic_1d_aa(size_in: int, size_out: int, scale_factor: float):
    """Index/weight tables for one axis of torch ``F.interpolate`` bicubic
    with ``antialias=True`` (ATen's separable-AA path, which is
    PIL-aligned: bicubic a = **-0.5**, unlike the -0.75 of the non-AA
    path): ``scale = 1 / scale_factor``, centers at ``scale * (i + 0.5)``,
    kernel support stretched by ``scale`` when down-scaling, out-of-range
    taps CLIPPED and the window re-normalized (not border-replicated).
    Equal sizes short-circuit to identity (torch does; validated
    empirically in tests/test_dinov2.py). Static numpy; returns
    ``(idx, w)`` of shape (size_out, taps), zero weight on padded taps."""
    if size_in == size_out:
        return (jnp.asarray(np.arange(size_out)[:, None]),
                jnp.ones((size_out, 1), jnp.float32))
    scale = 1.0 / scale_factor  # input units per output pixel
    support = 2.0 * scale if scale >= 1.0 else 2.0
    invscale = 1.0 / scale if scale >= 1.0 else 1.0
    centers = scale * (np.arange(size_out) + 0.5)
    xmin = np.maximum(0, (centers - support + 0.5).astype(np.int64))
    xmax = np.minimum(size_in, (centers + support + 0.5).astype(np.int64))
    taps = max(int((xmax - xmin).max()), 1)
    offs = np.arange(taps)[None, :]
    idx = xmin[:, None] + offs  # (out, taps)
    w = _bicubic_filter((idx + 0.5 - centers[:, None]) * invscale)
    w = np.where(idx < xmax[:, None], w, 0.0)
    w = w / w.sum(axis=1, keepdims=True)
    idx = np.clip(idx, 0, size_in - 1)
    return jnp.asarray(idx), jnp.asarray(w, jnp.float32)


def interpolate_pos_embed_dinov2(
    pos_embed: jax.Array, h0: int, w0: int, *,
    offset: float = 0.0, antialias: bool = True,
) -> jax.Array:
    """Hub-parity ``interpolate_pos_encoding``: (1, 1+N, D) table -> cls row
    kept, patch grid bicubic-resized to (h0, w0).

    The hub builds the ``*_reg`` backbones (what the reference loads) with
    ``interpolate_offset=0.0, interpolate_antialias=True`` — a size-based
    antialiased interpolate — and the plain backbones with
    ``interpolate_offset=0.1, antialias=False`` (the historical DINO
    scale-factor kludge). Both are reproduced: ``offset`` rides in the
    effective scale factor ``(g + offset) / side``, and ``antialias=False``
    falls back to the classic a=-0.75 border-replicate bicubic
    (``channel_vit._torch_bicubic_1d``)."""
    n = pos_embed.shape[1] - 1
    if h0 * w0 == n and h0 == w0:
        return pos_embed
    dim = pos_embed.shape[-1]
    side = int(math.sqrt(n))
    assert side * side == n, f"non-square pos grid {n}"
    grid = pos_embed[:, 1:].reshape(side, side, dim).astype(jnp.float32)
    if antialias:
        idx_h, w_h = torch_bicubic_1d_aa(side, h0, (h0 + offset) / side)
        idx_w, w_w = torch_bicubic_1d_aa(side, w0, (w0 + offset) / side)
    else:
        from .channel_vit import _torch_bicubic_1d
        idx_h, w_h = _torch_bicubic_1d(side, h0, (h0 + offset) / side)
        idx_w, w_w = _torch_bicubic_1d(side, w0, (w0 + offset) / side)
    rows = jnp.einsum("otsd,ot->osd", jnp.take(grid, idx_h, axis=0), w_h)
    out = jnp.einsum("hotd,ot->hod", jnp.take(rows, idx_w, axis=1), w_w)
    out = out.reshape(1, h0 * w0, dim).astype(pos_embed.dtype)
    return jnp.concatenate([pos_embed[:, :1], out], axis=1)


class _DinoBlock(nn.Module):
    """Pre-norm MHA + MLP, each residual scaled by a LayerScale gamma
    (hub ``dinov2/layers/block.py``)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d, h = self.dim, self.num_heads
        dh = d // h
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n = q.shape[:2]
        q = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dh)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(b, n, d)
        o = nn.Dense(d, name="attn_proj")(o)
        g1 = self.param("ls1_gamma", nn.initializers.ones, (d,))
        x = x + g1 * o
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(d * self.mlp_ratio), name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)  # hub uses exact GELU
        y = nn.Dense(d, name="fc2")(y)
        g2 = self.param("ls2_gamma", nn.initializers.ones, (d,))
        return x + g2 * y


class DinoV2ViT(nn.Module):
    """DINOv2 ViT with register tokens; ``__call__`` mirrors the hub's
    ``forward_features`` dict (``x_norm_clstoken`` / ``x_norm_patchtokens``).

    Token layout (hub ``vision_transformer.py``): [cls | patches] get the
    (interpolated) pos embed, register tokens are inserted after the cls
    token WITHOUT positional information.
    """

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 14
    num_registers: int = 4
    mlp_ratio: float = 4.0
    pos_grid: int = 37  # 518 // 14, the published checkpoints' native grid
    interpolate_offset: float = 0.0   # hub *_reg default
    interpolate_antialias: bool = True  # hub *_reg default

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        d, p = self.embed_dim, self.patch_size
        b, c, hh, ww = x.shape
        assert hh % p == 0 and ww % p == 0, "pad input to patch multiples first"
        tok = nn.Conv(d, (p, p), strides=(p, p), padding="VALID",
                      name="patch_proj")(x.transpose(0, 2, 3, 1))
        gh, gw = tok.shape[1], tok.shape[2]
        tok = tok.reshape(b, gh * gw, d)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, d))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, 1 + self.pos_grid * self.pos_grid, d))
        seq = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, d)), tok], axis=1)
        seq = seq + interpolate_pos_embed_dinov2(
            pos, gh, gw, offset=self.interpolate_offset,
            antialias=self.interpolate_antialias)
        if self.num_registers:
            reg = self.param("register_tokens", nn.initializers.zeros,
                             (1, self.num_registers, d))
            seq = jnp.concatenate(
                [seq[:, :1], jnp.broadcast_to(reg, (b, self.num_registers, d)),
                 seq[:, 1:]], axis=1)
        for i in range(self.depth):
            seq = _DinoBlock(d, self.num_heads, self.mlp_ratio, name=f"block{i}")(seq)
        seq = nn.LayerNorm(epsilon=1e-6, name="norm")(seq)
        return {
            "x_norm_clstoken": seq[:, 0],
            "x_norm_regtokens": seq[:, 1:1 + self.num_registers],
            "x_norm_patchtokens": seq[:, 1 + self.num_registers:],
        }


def _canon_hub_layout(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Normalize a torch state dict (hub OR HuggingFace
    ``Dinov2WithRegistersModel`` layout) to the hub key vocabulary."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    if "cls_token" in sd:  # already hub layout
        return sd
    out: Dict[str, np.ndarray] = {}
    out["cls_token"] = sd["embeddings.cls_token"]
    out["pos_embed"] = sd["embeddings.position_embeddings"]
    if "embeddings.register_tokens" in sd:
        out["register_tokens"] = sd["embeddings.register_tokens"]
    out["patch_embed.proj.weight"] = sd["embeddings.patch_embeddings.projection.weight"]
    out["patch_embed.proj.bias"] = sd["embeddings.patch_embeddings.projection.bias"]
    out["norm.weight"], out["norm.bias"] = sd["layernorm.weight"], sd["layernorm.bias"]
    i = 0
    while f"encoder.layer.{i}.norm1.weight" in sd:
        pre, o = f"encoder.layer.{i}", f"blocks.{i}"
        for ln in ("norm1", "norm2"):
            out[f"{o}.{ln}.weight"] = sd[f"{pre}.{ln}.weight"]
            out[f"{o}.{ln}.bias"] = sd[f"{pre}.{ln}.bias"]
        qkv_w = np.concatenate(
            [sd[f"{pre}.attention.attention.{m}.weight"] for m in ("query", "key", "value")], 0)
        qkv_b = np.concatenate(
            [sd[f"{pre}.attention.attention.{m}.bias"] for m in ("query", "key", "value")], 0)
        out[f"{o}.attn.qkv.weight"], out[f"{o}.attn.qkv.bias"] = qkv_w, qkv_b
        out[f"{o}.attn.proj.weight"] = sd[f"{pre}.attention.output.dense.weight"]
        out[f"{o}.attn.proj.bias"] = sd[f"{pre}.attention.output.dense.bias"]
        out[f"{o}.ls1.gamma"] = sd[f"{pre}.layer_scale1.lambda1"]
        out[f"{o}.ls2.gamma"] = sd[f"{pre}.layer_scale2.lambda1"]
        out[f"{o}.mlp.fc1.weight"] = sd[f"{pre}.mlp.fc1.weight"]
        out[f"{o}.mlp.fc1.bias"] = sd[f"{pre}.mlp.fc1.bias"]
        out[f"{o}.mlp.fc2.weight"] = sd[f"{pre}.mlp.fc2.weight"]
        out[f"{o}.mlp.fc2.bias"] = sd[f"{pre}.mlp.fc2.bias"]
        i += 1
    return out


# head counts of the published DINOv2 sizes (vit_small/base/large/giant2)
_HEADS_BY_DIM = {384: 6, 768: 12, 1024: 16, 1536: 24}


def config_from_state_dict(sd: Dict[str, Any], num_heads: Optional[int] = None) -> Dict[str, int]:
    """Infer the architecture from a (canonicalized) state dict. Head count
    is not recoverable from weights; inferred from the published DINOv2
    widths unless given explicitly."""
    sd = _canon_hub_layout(sd)
    dim = int(sd["cls_token"].shape[-1])
    if num_heads is None:
        num_heads = _HEADS_BY_DIM.get(dim, 6)
        if dim % num_heads:
            raise ValueError(
                f"cannot infer num_heads for embed_dim={dim}; pass num_heads=")
    depth = 0
    while f"blocks.{depth}.norm1.weight" in sd:
        depth += 1
    n = int(sd["pos_embed"].shape[1]) - 1
    return dict(
        embed_dim=dim,
        depth=depth,
        num_heads=int(num_heads),
        patch_size=int(sd["patch_embed.proj.weight"].shape[-1]),
        num_registers=int(sd["register_tokens"].shape[1]) if "register_tokens" in sd else 0,
        mlp_ratio=float(sd["blocks.0.mlp.fc1.weight"].shape[0] / dim),
        pos_grid=int(math.isqrt(n)),
    )


def load_torch_dinov2_state(params: Dict[str, Any], sd: Dict[str, Any]) -> Dict[str, Any]:
    """Fill a :class:`DinoV2ViT` flax param tree from a torch state dict
    (hub or HF layout). torch Linear weights are (out, in) -> transposed;
    the patch conv (D, 3, p, p) -> HWIO."""
    sd = _canon_hub_layout(sd)
    p = jax.tree_util.tree_map(np.asarray, params)

    p["cls_token"] = sd["cls_token"]
    p["pos_embed"] = sd["pos_embed"]
    if "register_tokens" in p:
        p["register_tokens"] = sd["register_tokens"]
    p["patch_proj"]["kernel"] = sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0)
    p["patch_proj"]["bias"] = sd["patch_embed.proj.bias"]
    p["norm"]["scale"], p["norm"]["bias"] = sd["norm.weight"], sd["norm.bias"]
    i = 0
    while f"block{i}" in p:
        blk, o = p[f"block{i}"], f"blocks.{i}"
        for ln in ("norm1", "norm2"):
            blk[ln]["scale"] = sd[f"{o}.{ln}.weight"]
            blk[ln]["bias"] = sd[f"{o}.{ln}.bias"]
        blk["qkv"]["kernel"] = sd[f"{o}.attn.qkv.weight"].T
        blk["qkv"]["bias"] = sd[f"{o}.attn.qkv.bias"]
        blk["attn_proj"]["kernel"] = sd[f"{o}.attn.proj.weight"].T
        blk["attn_proj"]["bias"] = sd[f"{o}.attn.proj.bias"]
        blk["ls1_gamma"] = sd[f"{o}.ls1.gamma"]
        blk["ls2_gamma"] = sd[f"{o}.ls2.gamma"]
        blk["fc1"]["kernel"] = sd[f"{o}.mlp.fc1.weight"].T
        blk["fc1"]["bias"] = sd[f"{o}.mlp.fc1.bias"]
        blk["fc2"]["kernel"] = sd[f"{o}.mlp.fc2.weight"].T
        blk["fc2"]["bias"] = sd[f"{o}.mlp.fc2.bias"]
        i += 1
    return jax.tree_util.tree_map(jnp.asarray, p)


def pad_to_patch_multiple(x: np.ndarray, patch: int) -> np.ndarray:
    """Reference ``create_pad`` (``morphem/feature_extraction.py:94-119``):
    zero-pad H/W up to patch multiples, extra pixel on the right/bottom."""
    h, w = x.shape[-2:]
    ph, pw = (-h) % patch, (-w) % patch
    top, left = ph // 2, pw // 2
    pad = [(0, 0)] * (x.ndim - 2) + [(top, ph - top), (left, pw - left)]
    return np.pad(x, pad) if (ph or pw) else x
