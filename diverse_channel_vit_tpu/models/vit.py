"""Flax ViT building blocks.

TPU-native counterpart of the reference's DINO-style ViT pieces
(``models/vit.py``): ``Mlp`` (:59), ``Attention`` (:101-144, with the
xFormers/SDPA variants :232-264 replaced by the Pallas flash kernel),
``DropPath`` (:37-56) and ``Block`` (:346-399).

Initialization matches the reference's ``_init_weights``
(``channel_vit.py:509-516``): Dense kernels trunc-normal(std=0.02), zero
biases, LayerNorm (1, 0). GELU defaults to the tanh approximation on TPU
(~1.8 ms/layer cheaper than torch's erf default — see ops/activations.py);
``model.gelu_exact=true`` restores bit-parity with ``nn.GELU()``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import multi_head_attention_packed
from ..ops.activations import gelu
from ..ops.initializers import trunc_normal_init

Dtype = Any

dense_init = trunc_normal_init(std=0.02)


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        x = nn.Dense(self.hidden_features, kernel_init=dense_init, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        x = nn.Dense(self.out_features, kernel_init=dense_init, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop, deterministic=not train)(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth, per sample (reference ``vit.py:37-56``).

    ``rate_override`` accepts a traced rate (scanned per-layer schedule)."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool,
                 rate_override: Optional[jax.Array] = None) -> jax.Array:
        if not train or (rate_override is None and self.rate == 0.0):
            return x
        keep = (1.0 - rate_override) if rate_override is not None else (1.0 - self.rate)
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Attention(nn.Module):
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    impl: str = "auto"  # auto | pallas | xla
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool, valid_len: Optional[int] = None,
                 cls_query: bool = False) -> jax.Array:
        b, n, c = x.shape
        head_dim = c // self.num_heads
        sm_scale = self.qk_scale or head_dim**-0.5

        # three projections instead of the reference's fused qkv: each output
        # is (B, N, H*dh) in the GEMM's natural layout, which the lane-packed
        # flash kernel consumes (and whose gradients it emits) directly —
        # zero layout copies around the attention custom-call, measured
        # 47.6 ms/step at flagship geometry with the fused-qkv layout.
        # Numerically identical (one linear map either way).
        q = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=dense_init, dtype=self.dtype, name="wq")(
            x[:, :1] if cls_query else x)
        k = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=dense_init, dtype=self.dtype, name="wk")(x)
        v = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=dense_init, dtype=self.dtype, name="wv")(x)

        if cls_query:
            # inference-only CLS-readout path (Block(..., cls_query=True)):
            # only the CLS attention row is needed, so attention collapses to
            # an O(B*H*N*dh) matvec — exactly the softmax-row identity the
            # EViT rework uses (models/vit.py:_EViTAttention). Dense XLA ops;
            # a 1-row q does not fit (or need) the flash kernel.
            if train and self.attn_drop > 0.0:
                # callers gate on cls_readout_ok; fail loud rather than
                # silently dropping attention-probability dropout
                raise ValueError("cls_query with active attn_drop at train")
            qh = q.reshape(b, 1, self.num_heads, head_dim).transpose(0, 2, 1, 3)
            kh = k.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)
            vh = v.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
            ) * sm_scale
            if valid_len is not None and valid_len < n:
                from ..ops.attention import MASK_VALUE

                key_mask = jnp.arange(n) < valid_len
                s = jnp.where(key_mask[None, None, None, :], s, MASK_VALUE)
            p = jax.nn.softmax(s, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bqhd", p.astype(vh.dtype), vh)
            out = out.reshape(b, 1, c)
            out = nn.Dense(c, kernel_init=dense_init, dtype=self.dtype, name="proj")(out)
            return nn.Dropout(self.proj_drop, deterministic=not train)(out)

        from ..ops import ring_attention as _ring

        ring = _ring.active_ring()
        if ring is not None:
            # sequence-parallel: tokens sharded over a mesh axis, K/V shards
            # rotate on the ICI ring (ops/ring_attention.py). The context
            # carries the GLOBAL key mask; the local valid_len is unused.
            if self.attn_drop > 0.0 and train:
                raise ValueError("attn_drop>0 train is dense-path only and "
                                 "incompatible with sequence parallelism")
            axis, size, global_valid = ring
            out = _ring.ring_attention_packed(
                q, k, v, self.num_heads, axis_name=axis, axis_size=size,
                sm_scale=sm_scale, valid_len=global_valid,
            )
            out = nn.Dense(c, kernel_init=dense_init, dtype=self.dtype, name="proj")(out)
            return nn.Dropout(self.proj_drop, deterministic=not train)(out)

        impl = self.impl
        if self.attn_drop > 0.0 and train:
            impl = "xla"  # attention-prob dropout only exists on the dense path
        if impl == "xla_capture" or (self.attn_drop > 0.0 and train):
            qh, kh, vh = (
                t.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)
                for t in (q, k, v)
            )
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
            ) * sm_scale
            if valid_len is not None and valid_len < n:
                # padded keys carry LayerNorm'd bias values — mask them the
                # same way the flash / xla_attention paths do
                from ..ops.attention import MASK_VALUE

                key_mask = jnp.arange(n) < valid_len
                s = jnp.where(key_mask[None, None, None, :], s, MASK_VALUE)
            probs = jax.nn.softmax(s, axis=-1)
            if impl == "xla_capture":
                # analysis path: dense probs sown as intermediates
                self.sow("intermediates", "attn_probs", probs)
            if self.attn_drop > 0.0 and train:
                # prob-matrix dropout, matching the reference's placement
                # (vit.py:128); recipes use 0
                probs = nn.Dropout(self.attn_drop, deterministic=False)(probs)
            out = jnp.einsum("bhqk,bhkd->bqhd", probs.astype(vh.dtype), vh)
            out = out.reshape(b, n, c)
        else:
            out = multi_head_attention_packed(
                q, k, v, self.num_heads, sm_scale=sm_scale, impl=impl, valid_len=valid_len
            )

        out = nn.Dense(c, kernel_init=dense_init, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop, deterministic=not train)(out)
        return out


class AttentionWithScores(nn.Module):
    """PPTAttention (reference ``vit.py:147-229``): attention that also
    returns per-token significance scores (CLS-attention x value-norm).

    TPU-native rework: the reference materializes the dense (B, H, N, N)
    probability matrix, but the scores only read its CLS *row* — which is
    ``softmax(q_cls . K^T)``, an O(N.dh) matvec — and per-token value norms.
    The attention output runs through the flash kernel; nothing densifies.
    ``ops/token_pruning.ppt_significance_scores`` is the dense oracle this
    is tested against. Parameter tree matches :class:`Attention`
    (wq/wk/wv/proj), so block_v2 checkpoints interchange with plain blocks."""

    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        sm_scale = self.qk_scale or head_dim**-0.5
        q = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=dense_init, dtype=self.dtype, name="wq")(x)
        k = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=dense_init, dtype=self.dtype, name="wk")(x)
        v = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=dense_init, dtype=self.dtype, name="wv")(x)
        out = multi_head_attention_packed(
            q, k, v, self.num_heads, sm_scale=sm_scale, impl=self.impl
        )
        out = nn.Dense(c, kernel_init=dense_init, dtype=self.dtype, name="proj")(out)
        # PPT significance without the dense matrix: CLS attention row
        # (recomputed at O(N.dh)) x packed value norms (reference
        # vit.py:160-198 semantics, oracle-tested)
        q_cls = q.reshape(b, n, self.num_heads, head_dim)[:, 0].astype(jnp.float32)
        kh = k.reshape(b, n, self.num_heads, head_dim).astype(jnp.float32)
        logits = jnp.einsum("bhd,bnhd->bhn", q_cls, kh) * sm_scale  # (B, H, N)
        cls_attn = jax.nn.softmax(logits, axis=-1)
        v_norm = jnp.linalg.norm(v.astype(jnp.float32), ord=2, axis=2)  # (B, N)
        sig = jnp.sum(cls_attn, axis=1) * v_norm  # (B, N)
        sig = sig[:, 1:]
        scores = sig / jnp.sum(sig, axis=1, keepdims=True)
        return out, scores


class BlockV2(nn.Module):
    """Pre-norm block with PPT score-based pruning (reference ``vit.py:402-492``).

    TPU deviation (documented in ``ops/token_pruning.py``): the keep count is
    static — ``keep_tokens`` non-CLS tokens after this block (token pruning)
    or ``keep_channels`` channel groups (channel pruning); the reference
    redraws a random count per block, which would force dynamic shapes.
    """

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    drop_path: float = 0.0
    pruning_method: Optional[str] = None  # token_pruning | channel_pruning
    keep_tokens: Optional[int] = None
    keep_channels: Optional[int] = None
    nc: int = 0
    attention_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool) -> jax.Array:
        from ..ops.token_pruning import topk_channel_select, topk_token_select

        dim = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        y, scores = AttentionWithScores(
            num_heads=self.num_heads, qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            impl=self.attention_impl, dtype=self.dtype, name="attn",
        )(y.astype(self.dtype), train=train)
        if self.pruning_method == "token_pruning" and self.keep_tokens is not None:
            if self.keep_tokens < x.shape[1] - 1:
                x = topk_token_select(x, scores, self.keep_tokens)
                y = topk_token_select(y, scores, self.keep_tokens)
        elif self.pruning_method == "channel_pruning" and self.keep_channels is not None:
            if self.keep_channels < self.nc:
                x = topk_channel_select(x, scores, self.nc, self.keep_channels)
                y = topk_channel_select(y, scores, self.nc, self.keep_channels)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, train=train)
        z = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        z = Mlp(
            hidden_features=int(dim * self.mlp_ratio), out_features=dim,
            drop=self.drop, dtype=self.dtype, name="mlp",
        )(z.astype(self.dtype), train=train)
        return x + DropPath(self.drop_path, name="drop_path2")(z, train=train)


class _EViTAttention(nn.Module):
    """Attention that also returns the head-mean CLS attention row.

    TPU-native rework of the reference ``Attention_EVIT`` (``vit.py:291-343``),
    which materializes the full (B, H, N, N) probability matrix just to read
    its CLS row. Softmax is row-wise, so that row is independently computable
    as ``softmax(q_cls . K^T)`` — an O(B.H.N.dh) matvec — while the heavy
    attention output runs through the flash kernel. Mathematically identical,
    never densifies. Parameter tree matches :class:`Attention` (wq/wk/wv/proj)
    so checkpoints interchange with plain blocks."""

    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jax.Array, *, valid_len: Optional[int] = None):
        from ..ops.attention import MASK_VALUE

        b, n, c = y.shape
        head_dim = c // self.num_heads
        sm_scale = self.qk_scale or head_dim**-0.5
        q = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=dense_init, dtype=self.dtype, name="wq")(y)
        k = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=dense_init, dtype=self.dtype, name="wk")(y)
        v = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=dense_init, dtype=self.dtype, name="wv")(y)
        out = multi_head_attention_packed(
            q, k, v, self.num_heads, sm_scale=sm_scale, impl=self.impl, valid_len=valid_len
        )
        out = nn.Dense(c, kernel_init=dense_init, dtype=self.dtype, name="proj")(out)
        # CLS row of the attention matrix, recomputed at O(N.dh) in fp32
        q_cls = q.reshape(b, n, self.num_heads, head_dim)[:, 0].astype(jnp.float32)
        kh = k.reshape(b, n, self.num_heads, head_dim).astype(jnp.float32)
        logits = jnp.einsum("bhd,bnhd->bhn", q_cls, kh) * sm_scale  # (B, H, N)
        if valid_len is not None and valid_len < n:
            logits = jnp.where(jnp.arange(n)[None, None, :] < valid_len, logits, MASK_VALUE)
        cls_attn = jax.nn.softmax(logits, axis=-1)
        scores = jnp.mean(cls_attn[:, :, 1:], axis=1)  # (B, N-1) over non-CLS
        return out, scores


class BlockEViT(nn.Module):
    """Pre-norm block with EViT token reorganization (reference
    ``Attention_EVIT``, ``vit.py:291-343`` — defined there but never consumed
    by a Block; wired here at the EViT paper's fuse point: after the
    attention residual, before the MLP). Keeps the top
    ``int(keep_rate * (N_valid-1))`` non-CLS tokens by head-mean CLS
    attention. The keep count is static (jit-stable shapes).

    TPU-native design: attention runs the flash kernel and the CLS scores are
    recomputed from the CLS query row (see :class:`_EViTAttention`) — the
    reference's dense-probability formulation at a 0.9 keep rate measured
    137.9 imgs/s on the v5e vs 249.5 with pruning OFF, because three dense
    (B,H,N,N) blocks cost more than 10% fewer tokens save. Accepts padded
    grids (``valid_len``); returns ``(x, valid_len)`` — after a prune the
    sequence is fully valid and the caller re-pads once. The parameter tree
    is identical to :class:`Block`, so ``keep_rate`` is a pure runtime knob:
    checkpoints trained dense can be served pruned and vice versa."""

    num_heads: int
    keep_rate: float = 1.0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    drop_path: float = 0.0
    attention_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool,
                 valid_len: Optional[int] = None):
        from ..ops.token_pruning import topk_token_select

        b, n, c = x.shape
        n_valid = n if valid_len is None else int(valid_len)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        y, scores = _EViTAttention(
            num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, impl=self.attention_impl,
            dtype=self.dtype, name="attn",
        )(y.astype(self.dtype), valid_len=valid_len)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, train=train)
        new_valid = valid_len
        keep = int(self.keep_rate * (n_valid - 1))
        if self.keep_rate < 1.0 and keep < n_valid - 1:
            if n_valid < n:
                # padded scores underflow to 0 through the masked softmax;
                # pin them below any real probability so top-k can't tie
                scores = jnp.where(jnp.arange(n - 1)[None, :] < n_valid - 1,
                                   scores, -1.0)
            x = topk_token_select(x, scores, keep)
            new_valid = None  # pruned grid is fully valid; caller re-pads
        dim = x.shape[-1]
        z = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        z = Mlp(hidden_features=int(dim * self.mlp_ratio), out_features=dim,
                drop=self.drop, dtype=self.dtype, name="mlp")(z.astype(self.dtype), train=train)
        x = x + DropPath(self.drop_path, name="drop_path2")(z, train=train)
        return x, new_valid


def attention_maps(model, params, x, channel_ids, *, layer_idx: int = -1):
    """Dense attention probabilities of one layer, for analysis/plotting.

    Counterpart of ``get_last_selfattention`` (``vit.py:620-632``,
    ``channel_vit_adapt.py:522-531``) and the ``train.plot_attn`` hook: runs
    the model with dense attention and flax intermediates capture, returns
    the (B, H, N, N) probabilities of ``layer_idx`` (negative indexes from
    the end).
    """
    import jax

    dense = model.clone(backbone=model.backbone.clone(attention_impl="xla_capture"))
    _, state = dense.apply(
        {"params": params}, x, channel_ids, train=False, mutable=["intermediates"]
    )
    inter = state["intermediates"]
    # walk to the backbone's blocks
    node = inter.get("backbone", inter)
    keys = sorted((k for k in node if k.startswith("block_")), key=lambda s: int(s.split("_")[1]))
    probs = [node[k]["attn"]["attn_probs"][0] for k in keys if "attn" in node[k]]
    return probs[layer_idx]


def cls_readout_ok(mdl: nn.Module, *, train: bool, drop_rate: float,
                   attn_drop_rate: float, attention_impl: str,
                   remat: bool = False) -> bool:
    """Is the last-block CLS-only readout (``Block(..., cls_query=True)``)
    exact for this call? Shared by every trunk that owns the knob
    (channel_vit / trunk / vit_adapt) so the observability gates cannot
    drift apart. False whenever full final-block rows are observable:

    - intermediates capture (MIRO pre-featurizer taps, training/miro.py)
    - dense attention-prob capture (``attention_impl="xla_capture"``)
    - remat closures (the remat branch never threads ``cls_query``)
    - sequence-parallel runs (the CLS row lives on one shard)
    - train-time element-wise dropouts (fewer rows would reshuffle the CLS
      row's mask draw; DropPath is per-sample and stays exact)
    """
    from ..ops import ring_attention as _ring

    return (
        not remat
        and attention_impl != "xla_capture"
        and not mdl.is_mutable_collection("intermediates")
        and _ring.active_ring() is None
        and (not train or (drop_rate == 0.0 and attn_drop_rate == 0.0))
    )


class BlockStack(nn.Module):
    """``depth`` transformer blocks compiled as ONE ``nn.scan`` loop.

    Functionally identical to ``depth`` stacked :class:`Block` modules with
    the standard linear drop-path schedule, but XLA traces/compiles a single
    block body instead of ``depth`` inlined copies — first-compile drops
    ~an order of magnitude, which matters when every HCS channel count is
    its own specialization. Parameters stack along a leading (depth, ...)
    axis (``blocks/...``), so checkpoints are NOT interchangeable with the
    unrolled layout; pick one per run via ``model.scan_blocks``.
    """

    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    attention_impl: str = "auto"
    remat: bool = True  # scan stacks per-layer residuals; remat keeps HBM O(1 layer)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool, valid_len: Optional[int] = None) -> jax.Array:
        dpr = jnp.asarray(
            [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)],
            jnp.float32,
        )
        num_heads, mlp_ratio = self.num_heads, self.mlp_ratio
        qkv_bias, drop, attn_drop = self.qkv_bias, self.drop, self.attn_drop
        attention_impl, dtype, use_remat = self.attention_impl, self.dtype, self.remat

        class _Body(nn.Module):
            @nn.compact
            def __call__(self, carry, rate):
                blk = Block(
                    num_heads=num_heads,
                    mlp_ratio=mlp_ratio,
                    qkv_bias=qkv_bias,
                    drop=drop,
                    attn_drop=attn_drop,
                    drop_path=0.0,  # applied with the traced per-layer rate
                    attention_impl=attention_impl,
                    dtype=dtype,
                    name="block",
                )
                if use_remat:
                    y = nn.remat(
                        lambda mdl, xx, rr: mdl(
                            xx, train=train, valid_len=valid_len, drop_path_override=rr
                        ),
                        prevent_cse=False,  # safe under scan, enables fusion
                    )(blk, carry, rate)
                else:
                    y = blk(carry, train=train, valid_len=valid_len, drop_path_override=rate)
                return y, None

        scan = nn.scan(
            _Body,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(0,),
            length=self.depth,
        )
        y, _ = scan(name="blocks")(x, dpr)
        return y


class _LNParams(nn.Module):
    """Declares LayerNorm parameters (same names/shapes/init as
    ``nn.LayerNorm``) without computing — the fused Pallas path consumes the
    raw arrays, but the checkpoint tree stays identical to the unfused path."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class _DenseParams(nn.Module):
    """Declares ``nn.Dense``-compatible kernel/bias parameters."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", dense_init, (self.in_features, self.features))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class _FusedAttentionCore(nn.Module):
    """qkv + flash + proj (+ residual) via ops/fused_block.attend_project:
    one wide qkv GEMM (XLA, at GEMM peak), then flash + output projection
    (+ residual add) in one Pallas kernel pair. Takes the post-LN
    activations. Parameter tree identical to :class:`Attention`
    (wq/wk/wv/proj); the qkv kernels are concatenated at apply time."""

    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, y, *, x_res, valid_len):
        from ..ops import fused_block as _fb

        c = y.shape[-1]
        head_dim = c // self.num_heads
        wq, bq = _DenseParams(c, c, self.qkv_bias, name="wq")()
        wk, bk = _DenseParams(c, c, self.qkv_bias, name="wk")()
        wv, bv = _DenseParams(c, c, self.qkv_bias, name="wv")()
        wp, bp = _DenseParams(c, c, name="proj")()
        cast = lambda a: None if a is None else a.astype(self.dtype)
        # NOTE: the proj GEMM is deliberately NOT quantised under
        # model.quantization=int8 — measured 260.8 -> 257.8 imgs/s at dh=64
        # (the in-kernel quant VPU work serialises into the MXU-bound
        # attention programs) and noise at dh=128; see PERFORMANCE.md.
        # attend_project_sharded routes: plain kernel without non-data mesh
        # axes; Megatron per-head shards + one psum under a model axis
        # (round 5, closing the attend_project share of the TP tax).
        return _fb.attend_project_sharded(
            y, cast(wq), cast(wk), cast(wv),
            cast(bq), cast(bk), cast(bv),
            cast(wp), cast(bp), x_res,
            self.num_heads, self.qk_scale or head_dim**-0.5, valid_len,
        )


class _FusedMlpCore(nn.Module):
    """LN + fc1 + tanh-GELU + fc2 (+ optional fused residual) via
    ops/fused_block.ln_mlp; parameter tree identical to :class:`Mlp`."""

    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ln_scale, ln_bias, *, residual: bool):
        from ..ops import fused_block as _fb

        c = x.shape[-1]
        w1, b1 = _DenseParams(c, self.hidden_features, name="fc1")()
        w2, b2 = _DenseParams(self.hidden_features, self.out_features, name="fc2")()
        return _fb.ln_mlp_sharded(
            x, ln_scale, ln_bias,
            w1.astype(self.dtype), b1.astype(self.dtype),
            w2.astype(self.dtype), b2.astype(self.dtype),
            residual,
            _fb.quantized_default(),
        )


class Block(nn.Module):
    """Pre-norm transformer block (reference ``vit.py:346-399``).

    ``drop_path_override`` feeds a *traced* per-layer stochastic-depth rate
    (used by :class:`BlockStack`'s scanned schedule).

    On TPU in bf16 with inactive dropouts the block routes through the fused
    Pallas kernels (LN+qkv GEMM, packed-qkv flash, LN+MLP — see
    ops/fused_block.py); the parameter tree is identical either way, so
    checkpoints are interchangeable between the paths."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    attention_impl: str = "auto"
    dtype: Dtype = jnp.float32

    def _fused_ok(self, x, train: bool) -> bool:
        from ..ops import activations as _act
        from ..ops import fused_block as _fb
        from ..ops import ring_attention as _ring
        from ..ops.attention import MAX_SINGLE_PASS_N

        return (
            _ring.active_ring() is None  # fused kernels see only the local shard
            and self.attention_impl in ("auto", "pallas")
            and self.dtype == jnp.bfloat16
            and _fb.FUSED_BLOCK_DEFAULT
            and _fb.fused_block_available()
            and x.shape[1] % 8 == 0
            and x.shape[1] <= MAX_SINGLE_PASS_N
            and x.shape[-1] % 128 == 0
            # the fused kernels' static lane-offset head slices are only
            # designed/measured for 64-multiple head widths
            and (x.shape[-1] // self.num_heads) % 64 == 0
            and not (train and (self.attn_drop > 0.0 or self.drop > 0.0))
            and not _act.GELU_EXACT_DEFAULT
        )

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool, valid_len: Optional[int] = None,
                 drop_path_override: Optional[jax.Array] = None,
                 cls_query: bool = False) -> jax.Array:
        dim = x.shape[-1]
        if cls_query:
            # last-block CLS readout: downstream consumes ONLY the CLS row,
            # so this block's queries and MLP run on one token (keys/values
            # still see the full grid). Exact for inference AND training —
            # the dropped rows' forward values are dead code and their
            # gradients are zero (the loss reads only CLS; diversity losses
            # attach at the patch embed). Callers gate dropouts>0 at train
            # (dropout masks are per-element, so fewer rows would reshuffle
            # the CLS row's draw); DropPath's per-sample (B,1,1) mask draws
            # identically either way.
            y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
            a = Attention(
                num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, attn_drop=self.attn_drop,
                proj_drop=self.drop, impl=self.attention_impl,
                dtype=self.dtype, name="attn",
            )(y.astype(self.dtype), train=train, valid_len=valid_len, cls_query=True)
            xc = x[:, :1] + DropPath(self.drop_path, name="drop_path1")(
                a, train=train, rate_override=drop_path_override
            )
            y2 = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(xc)
            y2 = Mlp(
                hidden_features=int(dim * self.mlp_ratio), out_features=dim,
                drop=self.drop, dtype=self.dtype, name="mlp",
            )(y2.astype(self.dtype), train=train)
            return xc + DropPath(self.drop_path, name="drop_path2")(
                y2, train=train, rate_override=drop_path_override
            )
        if self._fused_ok(x, train):
            from ..ops import fused_block as _fb

            x = x.astype(self.dtype)
            fuse_res = (not train) or (
                drop_path_override is None and self.drop_path == 0.0
            )
            y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
            if _fb.mlp_only_mode() and not _fb.tp_attend_available(self.num_heads):
                # TP mode with heads not divisible by tp: the fused
                # attention core's Megatron head split can't engage, so it
                # runs unfused (the flash kernel itself still shards heads
                # via its inner shard_map when it can, else XLA attention);
                # ln_mlp below still takes the sharded fused path. When the
                # head split CAN engage, _FusedAttentionCore routes through
                # attend_project_sharded instead. Same parameter tree.
                a = Attention(
                    num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale, attn_drop=self.attn_drop,
                    proj_drop=self.drop, impl=self.attention_impl,
                    dtype=self.dtype, name="attn",
                )(y.astype(self.dtype), train=train, valid_len=valid_len)
                x = x + DropPath(self.drop_path, name="drop_path1")(
                    a, train=train, rate_override=drop_path_override
                )
            else:
                attn = _FusedAttentionCore(
                    num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale, dtype=self.dtype, name="attn",
                )
                if fuse_res:
                    x = attn(y.astype(self.dtype), x_res=x, valid_len=valid_len)
                else:
                    branch = attn(y.astype(self.dtype), x_res=None,
                                  valid_len=valid_len)
                    x = x + DropPath(self.drop_path, name="drop_path1")(
                        branch, train=train, rate_override=drop_path_override
                    )
            s2, b2 = _LNParams(dim, name="norm2")()
            z = _FusedMlpCore(
                hidden_features=int(dim * self.mlp_ratio), out_features=dim,
                dtype=self.dtype, name="mlp",
            )(x, s2, b2, residual=fuse_res)
            if fuse_res:
                return z
            return x + DropPath(self.drop_path, name="drop_path2")(
                z, train=train, rate_override=drop_path_override
            )
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        y = Attention(
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            impl=self.attention_impl,
            dtype=self.dtype,
            name="attn",
        )(y.astype(self.dtype), train=train, valid_len=valid_len)
        x = x + DropPath(self.drop_path, name="drop_path1")(
            y, train=train, rate_override=drop_path_override
        )

        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        y = Mlp(
            hidden_features=int(dim * self.mlp_ratio),
            out_features=dim,
            drop=self.drop,
            dtype=self.dtype,
            name="mlp",
        )(y.astype(self.dtype), train=train)
        x = x + DropPath(self.drop_path, name="drop_path2")(
            y, train=train, rate_override=drop_path_override
        )
        return x
