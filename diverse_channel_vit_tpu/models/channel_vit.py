"""Channel Vision Transformer — the channel-token ViT core.

TPU-native redesign of the reference's ``PatchEmbedPerChannel`` +
``ChannelVisionTransformer`` (``models/channel_vit.py:39-393``,
``models/dichavit.py:39-417``). One generic core serves ChannelViT,
ChannelViTAdapt and DiChaViT: the differences between those models are
(a) which channel-sampling policy runs *outside* the module (HCS/DCS — see
``ops/sampling.py``; sampling changes shapes, so it lives in the train step
where the channel count is a static specialization), and (b) which diversity
losses are enabled inside (CDL/TDL, ``dichavit.py:378-408``).

Key layout decision: tokens stay channel-grouped ``(B, C, N, D)`` until the
transformer blocks, which see the flat ``(B, 1 + C*N, D)`` grid in the same
channel-major order as the reference's ``x.flatten(2).transpose(1, 2)``
(``dichavit.py:414-415``).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.initializers import conv_patch_init, normal_div8_init, scaled_orthogonal_init, trunc_normal_init
from ..ops.losses import orthogonal_projection_loss, proxy_loss
from ..ops.patch_embed import add_channel_embedding, per_channel_patch_embed
from .vit import Block

Dtype = Any


def _torch_bicubic_1d(size_in: int, size_out: int, scale: float):
    """Index/weight tables replicating torch's F.interpolate bicubic
    (align_corners=False, a=-0.75, border-replicate) for one axis with an
    explicit ``scale_factor`` — including the reference's +0.1 kludge
    (``dichavit.py:534-541``). Static (numpy) — runs at trace time."""
    import numpy as np

    a = -0.75
    x = (np.arange(size_out) + 0.5) / scale - 0.5
    ix = np.floor(x).astype(np.int64)
    t = (x - ix)[:, None]  # (out, 1)
    d = np.abs(t - np.array([-1.0, 0.0, 1.0, 2.0])[None, :])  # (out, 4)
    w = np.where(
        d <= 1.0,
        (a + 2) * d**3 - (a + 3) * d**2 + 1.0,
        np.where(d < 2.0, a * d**3 - 5 * a * d**2 + 8 * a * d - 4 * a, 0.0),
    )
    idx = np.clip(ix[:, None] + np.array([-1, 0, 1, 2])[None, :], 0, size_in - 1)
    return jnp.asarray(idx), jnp.asarray(w, jnp.float32)


def interpolate_pos_embed(
    pos_embed: jax.Array, h0: int, w0: int, num_channels: int = 1
) -> jax.Array:
    """Bicubic-resize the (1, N+1, D) positional table to an (h0, w0) grid.

    Bit-matches the reference's ``interpolate_pos_encoding``
    (``dichavit.py:518-552``): torch bicubic (a=-0.75, half-pixel centers)
    at ``scale_factor=(h0+0.1)/sqrt(N)`` — the DINO +0.1 float-guard rides
    in the scale. (The reference passes its scale factors as (w0, h0) for an
    (H, W) tensor; every recipe is square so the swap is unobservable.)

    Quirk reproduced: the reference's skip condition is
    ``npatch == N and w == h`` with ``npatch = C * h0 * w0`` — so for C > 1
    it resamples even at the native grid, and the +0.1-scaled resample is
    NOT the identity. ``num_channels`` feeds that condition.
    """
    n = pos_embed.shape[1] - 1
    if num_channels * h0 * w0 == n and h0 == w0:
        return pos_embed
    dim = pos_embed.shape[-1]
    side = int(math.sqrt(n))
    grid = pos_embed[:, 1:].reshape(side, side, dim).astype(jnp.float32)
    idx_h, w_h = _torch_bicubic_1d(side, h0, (h0 + 0.1) / side)
    idx_w, w_w = _torch_bicubic_1d(side, w0, (w0 + 0.1) / side)
    # separable: rows then cols (torch's upsample_bicubic2d order)
    rows = jnp.einsum("otsd,ot->osd", jnp.take(grid, idx_h, axis=0), w_h)  # (h0, side, D)
    out = jnp.einsum("hotd,ot->hod", jnp.take(rows, idx_w, axis=1), w_w)  # (h0, w0, D)
    out = out.reshape(1, h0 * w0, dim).astype(pos_embed.dtype)
    return jnp.concatenate([pos_embed[:, :1], out], axis=1)


class ChannelVisionTransformer(nn.Module):
    """Per-channel-token ViT backbone with optional diversity losses."""

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
    use_channelvit_channels: bool = True
    orthogonal_channel_emb_init: bool = False
    freeze_channel_emb: bool = False
    # DiChaViT diversity losses (dichavit.py:378-408); 0 disables
    proxy_loss_lambda: float = 0.0
    ortho_loss_v1_lambda: float = 0.0
    proxy_orthogonal_init: bool = False
    gamma_s: float = 1.0
    gamma_d: float = 0.5
    reverse_pos_pairs: bool = False
    use_square: bool = False
    temperature: float = 0.11111  # channel_scale = sqrt(1/T) (dichavit.py:60)
    attention_impl: str = "auto"
    # token-reduction research knobs (SURVEY §5; static counts — see
    # ops/token_pruning.py for the dynamic->static design note)
    block_type: str = "block"  # block | block_v2
    dropout_tokens_hcs: str = "none"  # none|random|channel|channel_random50|token_random50
    token_keep_channels: Optional[int] = None  # host-drawn count; None -> ceil(C/2)
    keep_rate: Optional[float] = None  # EViT-style CLS-attention top-k (unused by ref recipes)
    remat: bool = False  # rematerialize blocks (trade FLOPs for HBM headroom)
    scan_blocks: bool = False  # compile blocks as one nn.scan loop (fast compile)
    # inference-only: the last block runs its queries + MLP on the CLS row
    # alone (exact — downstream reads only CLS). Auto-disabled whenever full
    # rows are observable (train, intermediates capture, xla_capture, remat,
    # scan, ring attention).
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
        """x: (B, C, H, W) with channels already selected/gathered;
        channel_ids: (C,) global channel ids indexing the embedding table.
        Returns (cls_emb (B, D) float32, extra_loss scalar float32).
        """
        b, c, h, w = x.shape
        p = self.patch_size
        n = (h // p) * (w // p)

        proj_kernel = self.param("proj_kernel", conv_patch_init(p * p), (p * p, self.embed_dim))
        proj_bias = self.param("proj_bias", nn.initializers.zeros, (self.embed_dim,))
        tokens = per_channel_patch_embed(
            x.astype(self.dtype), proj_kernel.astype(self.dtype), proj_bias.astype(self.dtype), patch_size=p
        )  # (B, C, N, D)

        extra_loss = jnp.float32(0.0)
        if train and self.ortho_loss_v1_lambda > 0:
            # TDL on post-projection, pre-channel-offset tokens (dichavit.py:377-391)
            extra_loss += self.ortho_loss_v1_lambda * orthogonal_projection_loss(
                tokens,
                gamma_s=self.gamma_s,
                gamma_d=self.gamma_d,
                reverse_pos_pairs=self.reverse_pos_pairs,
                use_square=self.use_square,
            )

        if self.use_channelvit_channels:
            emb_init = (
                scaled_orthogonal_init()
                if self.orthogonal_channel_emb_init
                else trunc_normal_init(std=0.02)
            )
            channel_embed = self.param(
                "channel_embed", emb_init, (self.num_total_channels, self.embed_dim)
            )
            if self.freeze_channel_emb:
                channel_embed = jax.lax.stop_gradient(channel_embed)
            if channel_embed_override is not None:
                sel_embed = channel_embed_override
            else:
                sel_embed = jnp.take(channel_embed, channel_ids, axis=0)  # (C, D)

            if self.proxy_loss_lambda > 0:
                # CDL (dichavit.py:399-404): channel embeddings vs per-channel proxies
                proxy_init = (
                    scaled_orthogonal_init() if self.proxy_orthogonal_init else normal_div8_init()
                )
                channel_emb_proxies = self.param(
                    "channel_emb_proxies", proxy_init, (self.num_total_channels, self.embed_dim)
                )
                if train and sel_embed.ndim == 2:
                    sel_proxies = jnp.take(channel_emb_proxies, channel_ids, axis=0)
                    channel_scale = math.sqrt(1.0 / self.temperature)
                    extra_loss += self.proxy_loss_lambda * proxy_loss(
                        sel_proxies, sel_embed, jnp.eye(c, dtype=jnp.float32), channel_scale
                    )

            tokens = add_channel_embedding(tokens, sel_embed.astype(self.dtype))

        # flatten to the channel-major token grid + CLS (dichavit.py:414-415, :560-565)
        tokens = tokens.reshape(b, c * n, self.embed_dim)
        cls_token = self.param("cls_token", trunc_normal_init(std=0.02), (1, 1, self.embed_dim))
        pos_embed = self.param(
            "pos_embed",
            trunc_normal_init(std=0.02),
            (1, (self.img_size // p) ** 2 + 1, self.embed_dim),
        )
        pos = interpolate_pos_embed(pos_embed, h // p, w // p, num_channels=c).astype(self.dtype)
        # per-channel replication of the positional table (dichavit.py:549-552)
        tokens = tokens + jnp.tile(pos[:, 1:], (1, c, 1))
        cls = jnp.broadcast_to(cls_token.astype(self.dtype) + pos[:, :1], (b, 1, self.embed_dim))
        xseq = jnp.concatenate([cls, tokens], axis=1)
        xseq = nn.Dropout(self.drop_rate, deterministic=not train)(xseq)

        # prepare_tokens-level HCS token dropout (channel_vit_adapt.py:436-495)
        if train and self.block_type == "block" and self.dropout_tokens_hcs not in ("none", None):
            from ..ops.token_pruning import random_channel_drop, random_token_drop

            kc = self.token_keep_channels or max(1, math.ceil(0.5 * c))
            key = self.make_rng("dropout")
            if self.dropout_tokens_hcs in ("random", "token_random50"):
                xseq = random_token_drop(key, xseq, kc * n)
            elif self.dropout_tokens_hcs in ("channel", "channel_random50"):
                xseq = random_channel_drop(key, xseq, c, kc)
            else:
                raise ValueError(f"Unknown dropout_tokens_hcs: {self.dropout_tokens_hcs}")

        # EViT token reorganization (reference Attention_EVIT, vit.py:291-343,
        # never consumed there; wired here at the EViT paper's prune layers
        # depth/4, depth/2, 3*depth/4 — {3, 6, 9} at depth 12)
        evit_on = self.keep_rate is not None and float(self.keep_rate) < 1.0
        evit_layers = {self.depth // 4, self.depth // 2, (3 * self.depth) // 4} if evit_on else set()

        # pad the token grid ONCE to the flash kernel's preferred multiple so
        # no layer re-pads q/k/v; padded key positions are masked via
        # valid_len and the CLS readout never touches padded query rows.
        # EViT blocks mask their CLS-score softmax the same way and re-pad
        # after each prune (shapes stay static: the keep counts are Python
        # ints derived from the running valid length).
        valid_len = None
        if self.block_type == "block":
            from ..ops.attention import maybe_pad_tokens

            xseq, valid_len = maybe_pad_tokens(
                xseq, self.dtype, num_heads=self.num_heads,
                attention_impl=self.attention_impl,
            )

        if self.scan_blocks and self.block_type == "block" and not evit_on:
            from .vit import BlockStack

            xseq = BlockStack(
                depth=self.depth,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rate=self.drop_path_rate,
                attention_impl=self.attention_impl,
                dtype=self.dtype,
                name="blocks",
            )(xseq, train=train, valid_len=valid_len)
            cls_out = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(xseq[:, :1])
            return cls_out[:, 0].astype(jnp.float32), extra_loss

        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]
        kc = self.token_keep_channels or max(1, math.ceil(0.5 * c))
        # last-block CLS-only readout: only the CLS row of the final block is
        # consumed (the final LN is already CLS-only), so its queries and MLP
        # run on one token. Exact for inference AND training (dead rows carry
        # zero gradient; the diversity losses attach at the patch embed).
        # Observability gates shared across trunks: vit.cls_readout_ok.
        from .vit import cls_readout_ok

        cls_last = self.cls_only_readout and cls_readout_ok(
            self, train=train, drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            attention_impl=self.attention_impl, remat=self.remat,
        )
        for i in range(self.depth):
            if self.block_type == "block_v2":
                from .vit import BlockV2

                # per-block PPT pruning: channel pruning fires once (the grid
                # stays channel-structured only until the first prune); token
                # pruning keeps a kc/c fraction of the current tail each block
                cur_n = xseq.shape[1] - 1
                xseq = BlockV2(
                    num_heads=self.num_heads,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    drop=self.drop_rate,
                    drop_path=dpr[i],
                    pruning_method=(
                        self.dropout_tokens_hcs
                        if self.dropout_tokens_hcs in ("token_pruning", "channel_pruning")
                        else None
                    ),
                    keep_tokens=max(1, (cur_n * kc) // c),
                    keep_channels=kc if i == 0 else None,
                    nc=c,
                    attention_impl=self.attention_impl,
                    dtype=self.dtype,
                    name=f"block_{i}",
                )(xseq, train=train)
                continue
            if i in evit_layers:
                from ..ops.attention import maybe_pad_tokens
                from .vit import BlockEViT

                xseq, valid_len = BlockEViT(
                    num_heads=self.num_heads,
                    keep_rate=float(self.keep_rate),
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    drop=self.drop_rate,
                    drop_path=dpr[i],
                    attention_impl=self.attention_impl,
                    dtype=self.dtype,
                    name=f"block_{i}",
                )(xseq, train=train, valid_len=valid_len)
                if valid_len is None:
                    # pruned (fully-valid) grid: re-establish the pad-once
                    # invariant for the remaining layers
                    xseq, valid_len = maybe_pad_tokens(
                        xseq, self.dtype, num_heads=self.num_heads,
                        attention_impl=self.attention_impl,
                    )
                continue
            blk = Block(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=dpr[i],
                attention_impl=self.attention_impl,
                dtype=self.dtype,
                name=f"block_{i}",
            )
            if self.remat:
                # closure keeps train/valid_len static under the remat trace
                xseq = nn.remat(
                    lambda mdl, xx: mdl(xx, train=train, valid_len=valid_len)
                )(blk, xseq)
            else:
                xseq = blk(xseq, train=train, valid_len=valid_len,
                           cls_query=cls_last and i == self.depth - 1)

        # LayerNorm is per-token: norm only the CLS row we actually read
        cls_out = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(xseq[:, :1])
        return cls_out[:, 0].astype(jnp.float32), extra_loss


def apply_preset_overrides(preset: dict, cfg_model) -> dict:
    """Optional ``++model.{embed_dim,depth,num_heads}`` overrides on a size
    preset. The headline use: ``++model.num_heads=3`` at ViT-S width gives
    head_dim 128 — the MXU-native geometry (every attention matmul uses the
    full 128-wide systolic array instead of half of it at dh=64) — measured
    +42%% training throughput at identical parameter count and FLOPs
    (PERFORMANCE.md). The reference's 6-head ViT-S stays the default for
    architectural parity."""
    out = dict(preset)
    for key in ("embed_dim", "depth", "num_heads"):
        val = cfg_model.get(key)
        if val:
            out[key] = int(val)
    return out


# size presets mirroring channelvit_{tiny,small,base,distill} (dichavit.py:676-745)
SIZE_PRESETS = {
    "tiny": dict(embed_dim=192, depth=12, num_heads=3),
    "small": dict(embed_dim=384, depth=12, num_heads=6),
    "base": dict(embed_dim=768, depth=12, num_heads=12),
    "distill": dict(embed_dim=384, depth=12, num_heads=6),
    # TPU-build additions: "small_tpu" is ViT-S re-headed for the 128-wide
    # MXU (identical params/FLOPs, +40% measured training throughput —
    # PERFORMANCE.md "MXU-native geometry"); "test" is a smoke-test scale
    "small_tpu": dict(embed_dim=384, depth=12, num_heads=3),
    "test": dict(embed_dim=64, depth=2, num_heads=2),
}
