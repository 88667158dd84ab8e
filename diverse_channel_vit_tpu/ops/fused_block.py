"""Fused transformer-block ops: wide-qkv flash attention and LN+MLP.

Motivation (device trace + 12-layer chain measurements on the v5e-1,
PERFORMANCE.md round-2): at flagship geometry the non-attention step time is
HBM-traffic-bound — LayerNorm stats/normalize passes, the fc1 intermediate
(327 MB/layer round trip), and three narrow qkv GEMMs where one wide GEMM
runs measurably faster. Two ops close that:

- :func:`attend_project` — ``[x +] proj(flash(split(y @ W_qkv + b)))`` as
  ONE custom-vjp op. The forward runs a single (D, 3D) projection (a
  1152-wide GEMM beats three 384-wide ones by ~0.75 ms/layer, measured),
  then flash + output projection + residual add in one Pallas kernel pair:
  the flash kernel reads q/k/v as *lane-block views* of the packed qkv via
  BlockSpec index maps (zero slicing copies) and the in-kernel proj GEMM
  runs ~2x XLA's MFU at this shape. The backward keeps the fast
  decomposition — the 3-output flash backward kernel plus three narrow
  dX/dW GEMMs — and accumulates proj/bias grads as per-batch-row partials
  (a single-buffer d(qkv) variant was measured SLOWER — 188 vs 168 ms/12
  f+b — and an LN+qkv fused kernel lost to XLA's own LN+GEMM pipeline,
  38.6 vs 27.6 ms/12; both were dropped).
- :func:`ln_mlp` — LayerNorm + fc1 + tanh-GELU + fc2 (+ optional fused
  residual add) in one VMEM pass per row block; the (bm, 4D) intermediate
  never touches HBM. Measured 65.1 vs 69.0 ms/12 f+b against the XLA
  composition; the backward recomputes LN/fc1/GELU in VMEM and accumulates
  weight grads in f32 scratch across the sequential row sweep.

Parameters are taken as plain arrays, so the flax modules keep the
reference-parity parameter tree (``wq/wk/wv`` kernels are concatenated at
apply time — an 885 KB copy).

Reference roles: ``models/vit.py:346-399`` (Block: LN -> qkv -> attention ->
proj -> LN -> MLP), xFormers ``memory_efficient_attention`` (:232-249).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover - CPU-only hosts
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from . import attention as _attn

MASK_VALUE = _attn.MASK_VALUE
_EPS = 1e-6
# tanh-GELU constants (matches ops/activations.py / torch approximate="tanh")
_C0 = 0.7978845608028654  # sqrt(2/pi)
_C1 = 0.044715


def _interpret() -> bool:
    return _attn.INTERPRET


def _gelu_tanh_f32(x):
    inner = _C0 * (x + _C1 * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(inner))


def _dgelu_tanh_f32(x):
    inner = _C0 * (x + _C1 * x * x * x)
    t = jnp.tanh(inner)
    dinner = _C0 * (1.0 + 3.0 * _C1 * x * x)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * dinner


def _ln_f32(xf, scale, bias):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    xhat = xc * rstd
    return xhat * scale + bias, xhat, rstd


def _ln_bwd_f32(dy, xhat, rstd, scale):
    """dx for y = xhat*scale+bias given upstream dy (all f32)."""
    dxhat = dy * scale
    h1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    h2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return rstd * (dxhat - h1 - xhat * h2)


def _pick_bm(n: int, target: int) -> int:
    """Largest multiple-of-8 divisor of n that is <= target."""
    best = 8
    for b in range(8, min(n, target) + 1, 8):
        if n % b == 0:
            best = b
    return best


_MLP_VMEM_BUDGET = 100_000_000  # Mosaic scoped-vmem ceiling we compile with
# Activation-stack bytes per bm*d element, calibrated from the measured
# overflow point (bm=832, d=1024 -> 102.03M total, minus the 16d^2-byte
# resident fc1+fc2 bf16 weight mats): (102.03e6 - 16*1024^2)/(832*1024) ~ 100.
_MLP_ACT_BYTES_PER_ELEM = 100


def _mlp_footprint(bm: int, d: int) -> int:
    """Estimated ln_mlp kernel VMEM stack: row blocks (x/LN f32/h f32+bf16,
    double-buffered) + the two resident weight mats fc1 (d,4d) + fc2 (4d,d)
    in bf16."""
    return _MLP_ACT_BYTES_PER_ELEM * bm * d + 16 * d * d


def _mlp_bm(n: int, d: int) -> int:
    """ln_mlp row block: 832 is the measured sweep winner at d=384/768, but
    the kernel's VMEM stack scales with bm*4d — at d=1024 (ViT-L) bm=832
    overflows Mosaic's 100MB scoped-vmem budget (measured: 102.03M). Scale
    the target inversely with width past the measured envelope, and clamp by
    the full footprint estimate (the resident weight mats grow as d^2, so at
    d>~1500 the bm*d pin alone would overflow — ADVICE r3)."""
    target = 832 if d <= 768 else max(128, (832 * 768) // d // 8 * 8)
    act_budget = _MLP_VMEM_BUDGET - 16 * d * d
    if act_budget > 0:
        target = min(target, max(8, act_budget // (_MLP_ACT_BYTES_PER_ELEM * d)
                                 // 8 * 8))
    return _pick_bm(n, target)


def _pick_block_fwd(n: int) -> int:
    """Fwd q-block for the attend_project kernel: largest divisor of the
    lane-padded n within the f32 score budget, capped at 832 (block sweep:
    832 edges out 416/208 once the proj GEMM rides in the same program)."""
    n_pad = -(-n // 128) * 128
    cap = min(832, _attn._FWD_SCORE_BYTES // (4 * n_pad))
    best = 8
    for b in range(8, max(cap, 8) + 1, 8):
        if n_pad % b == 0:
            best = b
    return best


def _full_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b, i, _nd=nd: (0,) * _nd)


# ---------------------------------------------------------------------------
# ln_mlp: LayerNorm + fc1 + tanh-GELU + fc2 (+ optional residual)
# ---------------------------------------------------------------------------


def _ln_mlp_fwd_kernel(x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                       *, residual):
    xf = x_ref[0].astype(jnp.float32)
    y, _, _ = _ln_f32(xf, s_ref[...], b_ref[...])
    yb = y.astype(w1_ref.dtype)
    h_pre = jax.lax.dot(yb, w1_ref[...], preferred_element_type=jnp.float32)
    h_pre = h_pre + b1_ref[...].astype(jnp.float32)
    h = _gelu_tanh_f32(h_pre).astype(w2_ref.dtype)
    out = jax.lax.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    out = out + b2_ref[...].astype(jnp.float32)
    if residual:
        out = out + xf
    o_ref[0] = out.astype(o_ref.dtype)


def _ln_mlp_bwd_kernel(
    x_ref, s_ref, b_ref, w1_ref, b1_ref, w2_ref, do_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, ds_ref, db_ref,
    dw1_scr, db1_scr, dw2_scr, db2_scr, ds_scr, db_scr,
    *, n_blocks, residual,
):
    i = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dw1_scr[...] = jnp.zeros_like(dw1_scr)
        db1_scr[...] = jnp.zeros_like(db1_scr)
        dw2_scr[...] = jnp.zeros_like(dw2_scr)
        db2_scr[...] = jnp.zeros_like(db2_scr)
        ds_scr[...] = jnp.zeros_like(ds_scr)
        db_scr[...] = jnp.zeros_like(db_scr)

    xf = x_ref[0].astype(jnp.float32)
    scale = s_ref[...]
    y, xhat, rstd = _ln_f32(xf, scale, b_ref[...])
    yb = y.astype(w1_ref.dtype)
    h_pre = jax.lax.dot(yb, w1_ref[...], preferred_element_type=jnp.float32)
    h_pre = h_pre + b1_ref[...].astype(jnp.float32)
    h = _gelu_tanh_f32(h_pre).astype(w1_ref.dtype)

    do = do_ref[0]
    dof = do.astype(jnp.float32)
    dw2_scr[...] += jax.lax.dot_general(
        h, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db2_scr[...] += jnp.sum(dof, axis=0)
    dh = jax.lax.dot_general(
        do, w2_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bm, 4D)
    dh_pre = dh * _dgelu_tanh_f32(h_pre)
    dh_pre_b = dh_pre.astype(w1_ref.dtype)
    dw1_scr[...] += jax.lax.dot_general(
        yb, dh_pre_b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1_scr[...] += jnp.sum(dh_pre, axis=0)
    dy = jax.lax.dot_general(
        dh_pre_b, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds_scr[...] += jnp.sum(dy * xhat, axis=0)
    db_scr[...] += jnp.sum(dy, axis=0)
    dx = _ln_bwd_f32(dy, xhat, rstd, scale)
    if residual:
        dx = dx + dof
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(i == n_blocks - 1)
    def _store():
        dw1_ref[...] = dw1_scr[...]
        db1_ref[...] = db1_scr[...]
        dw2_ref[...] = dw2_scr[...]
        db2_ref[...] = db2_scr[...]
        ds_ref[...] = ds_scr[...]
        db_ref[...] = db_scr[...]


def _ln_mlp_fwd_impl(x, scale, bias, w1, b1, w2, b2, residual):
    b, n, d = x.shape
    hid = w1.shape[1]
    bm = _mlp_bm(n, d)  # bm sweep: 832 beats 416 (5.28 vs 5.42 ms/layer f+b) at d<=768
    return pl.pallas_call(
        functools.partial(_ln_mlp_fwd_kernel, residual=residual),
        grid=(b, n // bm),
        in_specs=[
            pl.BlockSpec((1, bm, d), lambda b_, i: (b_, i, 0)),
            _full_spec(scale.shape),
            _full_spec(bias.shape),
            _full_spec(w1.shape),
            _full_spec(b1.shape),
            _full_spec(w2.shape),
            _full_spec(b2.shape),
        ],
        out_specs=pl.BlockSpec((1, bm, d), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=None if pltpu is None else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * d * hid,
            bytes_accessed=b * n * d * 2 * 2,
            transcendentals=b * n * hid,
        ),
        interpret=_interpret(),
    )(x, scale, bias, w1, b1, w2, b2)


def _ln_mlp_bwd_impl(x, scale, bias, w1, b1, w2, do, residual):
    b, n, d = x.shape
    hid = w1.shape[1]
    bm = _mlp_bm(n, d)  # bm sweep: 832 beats 416 (5.28 vs 5.42 ms/layer f+b) at d<=768
    nb = n // bm
    outs = pl.pallas_call(
        functools.partial(_ln_mlp_bwd_kernel, n_blocks=b * nb, residual=residual),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, bm, d), lambda b_, i: (b_, i, 0)),
            _full_spec(scale.shape),
            _full_spec(bias.shape),
            _full_spec(w1.shape),
            _full_spec(b1.shape),
            _full_spec(w2.shape),
            pl.BlockSpec((1, bm, d), lambda b_, i: (b_, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bm, d), lambda b_, i: (b_, i, 0)),
            _full_spec((d, hid)),
            _full_spec((hid,)),
            _full_spec((hid, d)),
            _full_spec((d,)),
            _full_spec((d,)),
            _full_spec((d,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((d, hid), jnp.float32),
            jax.ShapeDtypeStruct((hid,), jnp.float32),
            jax.ShapeDtypeStruct((hid, d), jnp.float32),
            jax.ShapeDtypeStruct((d,), jnp.float32),
            jax.ShapeDtypeStruct((d,), jnp.float32),
            jax.ShapeDtypeStruct((d,), jnp.float32),
        ],
        scratch_shapes=[] if pltpu is None else [
            pltpu.VMEM((d, hid), jnp.float32),
            pltpu.VMEM((hid,), jnp.float32),
            pltpu.VMEM((hid, d), jnp.float32),
            pltpu.VMEM((d,), jnp.float32),
            pltpu.VMEM((d,), jnp.float32),
            pltpu.VMEM((d,), jnp.float32),
        ],
        compiler_params=None if pltpu is None else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n * d * hid,
            bytes_accessed=b * n * d * 2 * 3,
            transcendentals=2 * b * n * hid,
        ),
        interpret=_interpret(),
    )(x, scale, bias, w1, b1, w2, do)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def ln_mlp(x, scale, bias, w1, b1, w2, b2, residual=False, quantized=False):
    """fc2(tanh-GELU(fc1(LayerNorm(x)))) [+ x], one VMEM pass.

    ``quantized=True`` runs the GEMMs on the MXU's 2x int8 path (dynamic
    per-row activation scales, static per-column weight scales, int32
    accumulation — quantisation happens in VMEM where it is free of the HBM
    passes that refute XLA-level AQT at D=384, see PERFORMANCE.md round-3).
    The backward quantises the fc1 recompute and both dgrad GEMMs; weight
    grads stay bf16. Opt-in (``model.quantization=int8``): changes training
    numerics (~1% relative error per GEMM) and is NOT reference parity."""
    if quantized:
        return _ln_mlp_q_fwd_impl(x, scale, bias, w1, b1, w2, b2, residual)
    return _ln_mlp_fwd_impl(x, scale, bias, w1, b1, w2, b2, residual)


def _ln_mlp_vjp_fwd(x, scale, bias, w1, b1, w2, b2, residual, quantized):
    out = ln_mlp(x, scale, bias, w1, b1, w2, b2, residual, quantized)
    return out, (x, scale, bias, w1, b1, w2, b2)


def _ln_mlp_vjp_bwd(residual, quantized, res, do):
    x, scale, bias, w1, b1, w2, b2 = res
    impl = _ln_mlp_q_bwd_impl if quantized else _ln_mlp_bwd_impl
    dx, dw1, db1, dw2, db2, ds, db = impl(
        x, scale, bias, w1, b1, w2, do, residual
    )
    return (
        dx,
        ds.astype(scale.dtype),
        db.astype(bias.dtype),
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        # b2's own dtype, NOT w2's: the TP-sharded path feeds an f32 bias
        # (pre-divided by tp) and the cotangent must match it
        db2.astype(b2.dtype),
    )


ln_mlp.defvjp(_ln_mlp_vjp_fwd, _ln_mlp_vjp_bwd)


def ln_mlp_sharded(x, scale, bias, w1, b1, w2, b2, residual=False,
                   quantized=False):
    """:func:`ln_mlp` under active non-data mesh axes (TP/EP).

    Mosaic kernels cannot sit under GSPMD propagation, so the kernel runs
    per shard via an inner ``shard_map`` manual over every non-data axis
    (the same escape as ``attention.set_tp_attention``). Over the ``model``
    axis the weights take the Megatron split — fc1 column-sharded
    ``(D, 4D/tp)``, fc2 row-sharded ``(4D/tp, D)`` — and the row-parallel
    partial output psums once per call, exactly where the unfused GSPMD
    path puts its fc2 all-reduce. The fused residual moves outside the
    kernel (each shard adding x would psum to tp*x) and fc2's bias enters
    pre-divided by tp (summed back to b2 by the psum; exact in f32).
    Replicated inputs (x, LN params, b2) get their gradient psums from
    shard_map's transpose automatically; the sharded weight grads stay
    shard-local, matching the parameters' own shardings. Axes that shard
    nothing here (e.g. ``expert``) replicate the whole computation — the
    wrapper then only keeps the kernel out of GSPMD's reach."""
    from . import attention as _att

    wrap = _att._wrap_axes()
    if not wrap:
        return ln_mlp(x, scale, bias, w1, b1, w2, b2, residual, quantized)
    mesh = _att._tp_mesh()
    axis = _att._TP_STATE["axis"]
    tp = dict(mesh.shape).get(axis, 1)
    hid = w1.shape[1]
    model = axis if (axis in wrap and tp > 1 and hid % tp == 0
                     and (hid // tp) % 128 == 0) else None
    if model is None and axis in wrap and tp > 1:
        # The model axis is live but the Megatron split can't engage
        # (hid % tp != 0 or shard not lane-aligned). Replicating the full
        # MLP inside shard_map with P() in_specs would force per-step
        # all-gathers of the GSPMD-sharded fc1/fc2 — strictly worse than
        # plain dense ops, which GSPMD shards with its own fc2 all-reduce
        # (ADVICE r4). Fall back to XLA math, identical to the kernel's.
        return _ln_mlp_xla(x, scale, bias, w1, b1, w2, b2, residual)
    wrapped = _tp_ln_mlp_wrapper(mesh, wrap, model, bool(residual),
                                 bool(quantized))
    b2_in = b2.astype(jnp.float32) / tp if model is not None else b2
    return wrapped(x, scale, bias, w1, b1, w2, b2_in)


def _ln_mlp_xla(x, scale, bias, w1, b1, w2, b2, residual):
    """Dense-op twin of :func:`ln_mlp` (same math: f32 LN, bf16 GEMMs,
    tanh-GELU, f32 fc2 accumulation + bias). Used as the TP fallback when
    the in-kernel Megatron split can't engage — GSPMD shards these GEMMs
    over the params' own shardings and inserts the fc2 all-reduce itself.
    Quantisation is intentionally dropped here (it is a kernel-only lever;
    XLA-level int8 loses the gain to HBM quant passes, PERFORMANCE.md)."""
    y, _, _ = _ln_f32(x.astype(jnp.float32), scale.astype(jnp.float32),
                      bias.astype(jnp.float32))
    h = y.astype(x.dtype) @ w1 + b1
    h = _gelu_tanh_f32(h.astype(jnp.float32)).astype(x.dtype)
    out = jnp.dot(h, w2, preferred_element_type=jnp.float32)
    out = out + b2.astype(jnp.float32)
    if residual:
        out = out + x.astype(jnp.float32)
    return out.astype(x.dtype)


@functools.lru_cache(maxsize=64)
def _tp_ln_mlp_wrapper(mesh, wrap, model, residual, quantized):
    """jit(shard_map) cache — same partial-manual lowering constraint as
    ``attention._tp_flash_wrapper`` (jit-wrapped so eager callers trace)."""
    from jax.sharding import PartitionSpec as P

    def fn(x, scale, bias, w1, b1, w2, b2):
        if model is None:
            # nothing sharded (e.g. expert-only mesh): keep the in-kernel
            # residual — bit-equal to the unsharded kernel
            return ln_mlp(x, scale, bias, w1, b1, w2, b2, residual, quantized)
        part = ln_mlp(x, scale, bias, w1, b1, w2, b2, False, quantized)
        # f32 reduce: better partial-sum numerics, and bf16 all-reduce
        # under a partial-manual shard_map hard-aborts XLA:CPU
        # ("Invalid binary instruction opcode copy") in the virtual-mesh
        # test harness
        part = jax.lax.psum(part.astype(jnp.float32), model).astype(part.dtype)
        return part + x if residual else part

    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(None, model), P(model), P(model, None), P()),
        out_specs=P(),
        axis_names=frozenset(wrap),
        check_vma=False,
    ))


# ---------------------------------------------------------------------------
# int8-quantised ln_mlp (opt-in, ``model.quantization=int8``)
# ---------------------------------------------------------------------------
#
# Measured motivation (scripts/bench_int8*.py, v5e-1): int8 GEMMs at ViT-S
# shapes run 2.1x bf16 (253 vs 120 TF/s), but XLA-level AQT loses the whole
# gain to HBM-bound quant/dequant passes at D=384. Quantising inside the
# kernel keeps the quant work on VMEM-resident data. The dh=64 attention
# score matmul does NOT speed up under int8 (lane-width-bound, measured) —
# only the wide-contraction MLP/projection GEMMs are quantised.


def _quant_rows_f32(x):
    """Per-row symmetric int8 quantisation of an f32 block."""
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0, 1e-8)
    return jnp.round(x / s).astype(jnp.int8), s


def quantize_weight(w, axis):
    """Static symmetric int8 weight quantisation along ``axis`` (XLA-side;
    the (d, hid) reduce is ~1 MB of traffic per layer per step)."""
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=axis, keepdims=True) / 127.0, 1e-12)
    return jnp.round(wf / s).astype(jnp.int8), jnp.squeeze(s, axis)


def _ln_mlp_q_fwd_kernel(x_ref, s_ref, b_ref, w1q_ref, s1c_ref, b1_ref,
                         w2q_ref, s2c_ref, b2_ref, o_ref, *, residual):
    xf = x_ref[0].astype(jnp.float32)
    y, _, _ = _ln_f32(xf, s_ref[...], b_ref[...])
    yq, ys = _quant_rows_f32(y)
    acc = jax.lax.dot(yq, w1q_ref[...], preferred_element_type=jnp.int32)
    h_pre = acc.astype(jnp.float32) * ys * s1c_ref[...] + b1_ref[...].astype(jnp.float32)
    h = _gelu_tanh_f32(h_pre)
    hq, hs = _quant_rows_f32(h)
    acc2 = jax.lax.dot(hq, w2q_ref[...], preferred_element_type=jnp.int32)
    out = acc2.astype(jnp.float32) * hs * s2c_ref[...] + b2_ref[...].astype(jnp.float32)
    if residual:
        out = out + xf
    o_ref[0] = out.astype(o_ref.dtype)


def _ln_mlp_q_fwd_impl(x, scale, bias, w1, b1, w2, b2, residual):
    b, n, d = x.shape
    hid = w1.shape[1]
    w1q, s1c = quantize_weight(w1, 0)
    w2q, s2c = quantize_weight(w2, 0)
    bm = _pick_bm(n, 832)
    return pl.pallas_call(
        functools.partial(_ln_mlp_q_fwd_kernel, residual=residual),
        grid=(b, n // bm),
        in_specs=[
            pl.BlockSpec((1, bm, d), lambda b_, i: (b_, i, 0)),
            _full_spec(scale.shape),
            _full_spec(bias.shape),
            _full_spec(w1q.shape),
            _full_spec(s1c.shape),
            _full_spec(b1.shape),
            _full_spec(w2q.shape),
            _full_spec(s2c.shape),
            _full_spec(b2.shape),
        ],
        out_specs=pl.BlockSpec((1, bm, d), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=None if pltpu is None else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * d * hid,
            bytes_accessed=b * n * d * 2 * 2,
            transcendentals=b * n * hid,
        ),
        interpret=_interpret(),
    )(x, scale, bias, w1q, s1c, b1, w2q, s2c, b2)


def _ln_mlp_q_bwd_kernel(
    x_ref, s_ref, b_ref, w1q_ref, s1c_ref, b1_ref, w1r_ref, s1r_ref,
    w2r_ref, s2r_ref, do_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, ds_ref, db_ref,
    dw1_scr, db1_scr, dw2_scr, db2_scr, ds_scr, db_scr,
    *, n_blocks, residual,
):
    i = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dw1_scr[...] = jnp.zeros_like(dw1_scr)
        db1_scr[...] = jnp.zeros_like(db1_scr)
        dw2_scr[...] = jnp.zeros_like(dw2_scr)
        db2_scr[...] = jnp.zeros_like(db2_scr)
        ds_scr[...] = jnp.zeros_like(ds_scr)
        db_scr[...] = jnp.zeros_like(db_scr)

    xf = x_ref[0].astype(jnp.float32)
    scale = s_ref[...]
    y, xhat, rstd = _ln_f32(xf, scale, b_ref[...])
    # int8 recompute of fc1 — identical quantisation to the forward, so
    # h_pre/h match the forward's values bit-for-bit
    yq, ys = _quant_rows_f32(y)
    acc = jax.lax.dot(yq, w1q_ref[...], preferred_element_type=jnp.int32)
    h_pre = acc.astype(jnp.float32) * ys * s1c_ref[...] + b1_ref[...].astype(jnp.float32)
    h = _gelu_tanh_f32(h_pre).astype(jnp.bfloat16)

    do = do_ref[0]
    dof = do.astype(jnp.float32)
    # weight grads stay bf16 (quantised grads are the quality-risky part)
    dw2_scr[...] += jax.lax.dot_general(
        h, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db2_scr[...] += jnp.sum(dof, axis=0)
    # dgrad fc2: int8 over the d-contraction (w2 pre-quantised per-row)
    doq, dos = _quant_rows_f32(dof)
    dh = jax.lax.dot_general(
        doq, w2r_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * dos * s2r_ref[...]
    dh_pre = dh * _dgelu_tanh_f32(h_pre)
    dh_pre_b = dh_pre.astype(jnp.bfloat16)
    dw1_scr[...] += jax.lax.dot_general(
        y.astype(jnp.bfloat16), dh_pre_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db1_scr[...] += jnp.sum(dh_pre, axis=0)
    # dgrad fc1: int8 over the hid-contraction (w1 pre-quantised per-row)
    dhq, dhs = _quant_rows_f32(dh_pre)
    dy = jax.lax.dot_general(
        dhq, w1r_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * dhs * s1r_ref[...]
    ds_scr[...] += jnp.sum(dy * xhat, axis=0)
    db_scr[...] += jnp.sum(dy, axis=0)
    dx = _ln_bwd_f32(dy, xhat, rstd, scale)
    if residual:
        dx = dx + dof
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(i == n_blocks - 1)
    def _store():
        dw1_ref[...] = dw1_scr[...]
        db1_ref[...] = db1_scr[...]
        dw2_ref[...] = dw2_scr[...]
        db2_ref[...] = db2_scr[...]
        ds_ref[...] = ds_scr[...]
        db_ref[...] = db_scr[...]


def _ln_mlp_q_bwd_impl(x, scale, bias, w1, b1, w2, do, residual):
    b, n, d = x.shape
    hid = w1.shape[1]
    w1q, s1c = quantize_weight(w1, 0)   # fc1 recompute (contract d)
    w1r, s1r = quantize_weight(w1, 1)   # dgrad fc1 (contract hid)
    w2r, s2r = quantize_weight(w2, 1)   # dgrad fc2 (contract d)
    bm = _pick_bm(n, 832)
    nb = n // bm
    outs = pl.pallas_call(
        functools.partial(_ln_mlp_q_bwd_kernel, n_blocks=b * nb, residual=residual),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, bm, d), lambda b_, i: (b_, i, 0)),
            _full_spec(scale.shape),
            _full_spec(bias.shape),
            _full_spec(w1q.shape),
            _full_spec(s1c.shape),
            _full_spec(b1.shape),
            _full_spec(w1r.shape),
            _full_spec(s1r.shape),
            _full_spec(w2r.shape),
            _full_spec(s2r.shape),
            pl.BlockSpec((1, bm, d), lambda b_, i: (b_, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bm, d), lambda b_, i: (b_, i, 0)),
            _full_spec((d, hid)),
            _full_spec((hid,)),
            _full_spec((hid, d)),
            _full_spec((d,)),
            _full_spec((d,)),
            _full_spec((d,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), x.dtype),
            jax.ShapeDtypeStruct((d, hid), jnp.float32),
            jax.ShapeDtypeStruct((hid,), jnp.float32),
            jax.ShapeDtypeStruct((hid, d), jnp.float32),
            jax.ShapeDtypeStruct((d,), jnp.float32),
            jax.ShapeDtypeStruct((d,), jnp.float32),
            jax.ShapeDtypeStruct((d,), jnp.float32),
        ],
        scratch_shapes=[] if pltpu is None else [
            pltpu.VMEM((d, hid), jnp.float32),
            pltpu.VMEM((hid,), jnp.float32),
            pltpu.VMEM((hid, d), jnp.float32),
            pltpu.VMEM((d,), jnp.float32),
            pltpu.VMEM((d,), jnp.float32),
            pltpu.VMEM((d,), jnp.float32),
        ],
        compiler_params=None if pltpu is None else pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n * d * hid,
            bytes_accessed=b * n * d * 2 * 3,
            transcendentals=2 * b * n * hid,
        ),
        interpret=_interpret(),
    )(x, scale, bias, w1q, s1c, b1, w1r, s1r, w2r, s2r, do)
    return outs


def _project(y, w, b):
    qkv = jnp.einsum("bnd,df->bnf", y, w, preferred_element_type=jnp.float32)
    return (qkv + b.astype(jnp.float32)).astype(y.dtype)



# ---------------------------------------------------------------------------
# attend_project: flash + output projection (+ residual) in one kernel pair
# ---------------------------------------------------------------------------


def _ap_fwd_kernel(q_ref, k_ref, v_ref, x_ref, wp_ref, bp_ref, o_ref, xo_ref,
                   *, num_heads, sm_scale, n_valid, with_residual):
    d = o_ref.shape[-1]
    dh = d // num_heads
    outs = []
    # software-pipelined head loop: issue head h+1's score matmul before
    # head h's softmax so the scheduler can overlap VPU and MXU (measured
    # 4.21 vs 4.28 ms/layer)
    def score(h):
        s = jax.lax.dot_general(
            q_ref[0, :, h * dh:(h + 1) * dh], k_ref[0, :, h * dh:(h + 1) * dh],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        if sm_scale != 1.0:
            s = s * sm_scale
        if n_valid < s.shape[-1]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, MASK_VALUE)
        return s

    s_next = score(0)
    for h in range(num_heads):
        s = s_next
        if h + 1 < num_heads:
            s_next = score(h + 1)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0, :, h * dh:(h + 1) * dh],
            preferred_element_type=jnp.float32,
        )
        outs.append((o / l).astype(o_ref.dtype))
    ob = jnp.concatenate(outs, axis=1)  # (bq, D)
    o_ref[0] = ob
    proj = jax.lax.dot(ob, wp_ref[...], preferred_element_type=jnp.float32)
    proj = proj + bp_ref[...].astype(jnp.float32)
    if with_residual:
        proj = proj + x_ref[0].astype(jnp.float32)
    xo_ref[0] = proj.astype(xo_ref.dtype)


def _ap_bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, wp_ref, dxo_ref,
    dq_ref, dk_ref, dv_ref, dwp_ref, dbp_ref, db3_ref,
    dk_scr, dv_scr, dwp_scr, dbp_scr, dbq_scr,
    *, num_heads, sm_scale, n_valid, n_q_blocks,
):
    qi = pl.program_id(1)
    # all accumulators are per batch row (reset each b, stored at the last
    # q-block); the tiny per-b partials are summed over b by XLA outside,
    # which keeps the b grid dimension "parallel" (a whole-grid accumulator
    # needs sequential b — measured +3.7 ms/step)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)
        dwp_scr[...] = jnp.zeros_like(dwp_scr)
        dbp_scr[...] = jnp.zeros_like(dbp_scr)
        dbq_scr[...] = jnp.zeros_like(dbq_scr)

    d = dq_ref.shape[-1]
    dh = d // num_heads
    dxo = dxo_ref[0]  # (bq, D)
    ob = o_ref[0]
    dwp_scr[...] += jax.lax.dot_general(
        ob, dxo, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dbp_scr[...] += jnp.sum(dxo.astype(jnp.float32), axis=0)
    do = jax.lax.dot_general(
        dxo, wp_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(q_ref.dtype)  # (bq, D)

    def sl(h):
        return slice(h * dh, (h + 1) * dh)

    def soft(h):
        s = jax.lax.dot_general(
            q_ref[0, :, sl(h)], k_ref[0, :, sl(h)],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        if sm_scale != 1.0:
            s = s * sm_scale
        if n_valid < s.shape[-1]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        return p / jnp.sum(p, axis=1, keepdims=True)

    def dspart(h, p):
        doh = do[:, sl(h)]
        di = jnp.sum(
            ob[:, sl(h)].astype(jnp.float32) * doh.astype(jnp.float32),
            axis=1, keepdims=True,
        )
        dp = jax.lax.dot_general(
            doh, v_ref[0, :, sl(h)], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return p * (dp - di) * sm_scale

    dqs, dks, dvs = [], [], []
    # heads processed in pairs (staged softmax/ds) — measured 9.42 vs 9.60
    # ms/layer against the strictly sequential order; whole-row staging of
    # all 6 heads exceeds the VMEM sweet spot (9.98)
    for h0 in range(0, num_heads, 2):
        pair = [h for h in (h0, h0 + 1) if h < num_heads]
        ps = [soft(h) for h in pair]
        dss = [dspart(h, p) for h, p in zip(pair, ps)]
        for h, p, ds in zip(pair, ps, dss):
            dsb = ds.astype(q_ref.dtype)
            pb = p.astype(q_ref.dtype)
            dqs.append(
                jax.lax.dot(dsb, k_ref[0, :, sl(h)], preferred_element_type=jnp.float32)
                .astype(dq_ref.dtype)
            )
            dks.append(jax.lax.dot_general(
                dsb, q_ref[0, :, sl(h)], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
            dvs.append(jax.lax.dot_general(
                pb, do[:, sl(h)], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))
    dq_blk = jnp.concatenate(dqs, axis=1)
    dq_ref[0] = dq_blk
    dk_scr[...] += jnp.concatenate(dks, axis=1)
    dv_scr[...] += jnp.concatenate(dvs, axis=1)
    # qkv bias grads: column sums of dq (here) and dk/dv (at store time) —
    # free in VMEM vs XLA's ~4 ms/step bf16 reduces over the dq/dk/dv arrays
    dbq_scr[...] += jnp.sum(dq_blk.astype(jnp.float32), axis=0)

    @pl.when(qi == n_q_blocks - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)
        dwp_ref[0] = dwp_scr[...]
        dbp_ref[0, 0] = dbp_scr[...]
        # (3, d) rows [dbq, dbk, dbv] — sublane-offset stores; a 1-D concat
        # at lane offsets is not Mosaic-lowerable
        db3_ref[0, 0] = dbq_scr[...]
        db3_ref[0, 1] = jnp.sum(dk_scr[...], axis=0)
        db3_ref[0, 2] = jnp.sum(dv_scr[...], axis=0)


def _ap_fwd_impl(qkv, x_res, wp, bp, num_heads, sm_scale, n_valid, block_q,
                 with_residual):
    b, n, d3 = qkv.shape
    d = d3 // 3
    # wp may be rectangular (d, d_out): the TP head split feeds per-shard
    # row blocks (D/tp, D) whose proj partials psum outside (round 5)
    d_out = wp.shape[1]
    nq = n // block_q
    x_in = x_res if with_residual else jnp.zeros((b, 8, d_out), qkv.dtype)
    x_spec = (
        pl.BlockSpec((1, block_q, d_out), lambda b_, qi: (b_, qi, 0))
        if with_residual
        else pl.BlockSpec((1, 8, d_out), lambda b_, qi: (b_, 0, 0))
    )
    kernel = functools.partial(
        _ap_fwd_kernel, num_heads=num_heads, sm_scale=sm_scale,
        n_valid=n_valid, with_residual=with_residual,
    )
    o, xo = pl.pallas_call(
        kernel,
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),  # q view
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 1)),  # k view resident
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 2)),  # v view resident
            x_spec,
            _full_spec(wp.shape),
            _full_spec(bp.shape),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),
            pl.BlockSpec((1, block_q, d_out), lambda b_, qi: (b_, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, d_out), qkv.dtype),
        ],
        compiler_params=None if pltpu is None else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * n * d + 2 * b * n * d * d,
            bytes_accessed=b * n * d * 2 * 5,
            transcendentals=b * n * n * num_heads,
        ),
        interpret=_interpret(),
    )(qkv, qkv, qkv, x_in, wp, bp)
    return o, xo


def _ap_bwd_impl(qkv, o, wp, dxo, num_heads, sm_scale, n_valid):
    b, n, d3 = qkv.shape
    d = d3 // 3
    d_out = wp.shape[1]  # rectangular under the TP head split (round 5)
    block_q = _attn._pick_block_q_bwd(n, d // num_heads)
    nq = n // block_q
    dq, dk, dv, dwp_b, dbp_b, db3_b = pl.pallas_call(
        functools.partial(
            _ap_bwd_kernel, num_heads=num_heads, sm_scale=sm_scale,
            n_valid=n_valid, n_q_blocks=nq,
        ),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),  # q view
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 1)),  # k view resident
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 2)),  # v view resident
            pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),  # o
            _full_spec(wp.shape),
            pl.BlockSpec((1, block_q, d_out), lambda b_, qi: (b_, qi, 0)),  # dxo
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),  # dq
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 0)),  # dk (revisited)
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 0)),  # dv (revisited)
            pl.BlockSpec((1, d, d_out), lambda b_, qi: (b_, 0, 0)),  # dwp per-b
            pl.BlockSpec((1, 1, d_out), lambda b_, qi: (b_, 0, 0)),  # dbp per-b
            pl.BlockSpec((1, 3, d), lambda b_, qi: (b_, 0, 0)),  # dbqkv per-b
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
            jax.ShapeDtypeStruct((b, d, d_out), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, d_out), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, d), jnp.float32),
        ],
        scratch_shapes=[] if pltpu is None else [
            pltpu.VMEM((n, d), jnp.float32),
            pltpu.VMEM((n, d), jnp.float32),
            pltpu.VMEM((d, d_out), jnp.float32),
            pltpu.VMEM((d_out,), jnp.float32),
            pltpu.VMEM((d,), jnp.float32),
        ],
        compiler_params=None if pltpu is None else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n * n * d + 4 * b * n * d * d,
            bytes_accessed=b * n * d * 2 * 6,
            transcendentals=b * n * n * num_heads,
        ),
        interpret=_interpret(),
    )(qkv, qkv, qkv, o, wp, dxo)
    # per-b weight/bias partials -> tiny XLA sums (keeps the b grid parallel)
    return (
        dq, dk, dv,
        dwp_b.sum(axis=0), dbp_b.sum(axis=(0, 1)),
        db3_b.sum(axis=0).reshape(3 * d),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _apa(y, w, b, wp, bp, x_res, num_heads, sm_scale, n_valid, block_q,
         with_residual):
    qkv = _project(y, w, b)
    _, xo = _ap_fwd_impl(qkv, x_res, wp, bp, num_heads, sm_scale, n_valid,
                         block_q, with_residual)
    return xo


def _apa_vjp_fwd(y, w, b, wp, bp, x_res, num_heads, sm_scale, n_valid, block_q,
                 with_residual):
    qkv = _project(y, w, b)
    o, xo = _ap_fwd_impl(qkv, x_res, wp, bp, num_heads, sm_scale, n_valid,
                         block_q, with_residual)
    return xo, (y, w, wp, qkv, o)


def _apa_vjp_bwd(num_heads, sm_scale, n_valid, block_q, with_residual, res, dxo):
    y, w, wp, qkv, o = res
    # qkv slice width from w, not y: under the TP head split w is the
    # per-shard (D, 3*D/tp) block while y stays full-width (round 5)
    d = w.shape[1] // 3
    dq, dk, dv, dwp, dbp, db3 = _ap_bwd_impl(
        qkv, o, wp, dxo, num_heads, sm_scale, n_valid
    )
    dy = (
        jnp.einsum("bnf,df->bnd", dq, w[:, :d])
        + jnp.einsum("bnf,df->bnd", dk, w[:, d:2 * d])
        + jnp.einsum("bnf,df->bnd", dv, w[:, 2 * d:])
    )
    dw = jnp.concatenate(
        [
            jnp.einsum("bnd,bnf->df", y, g, preferred_element_type=jnp.float32)
            for g in (dq, dk, dv)
        ],
        axis=1,
    ).astype(w.dtype)
    db = db3.astype(w.dtype)
    dx_res = (
        dxo
        if with_residual
        else jnp.zeros((dxo.shape[0], 8, dxo.shape[2]), dxo.dtype)
    )
    return dy, dw, db, dwp.astype(wp.dtype), dbp.astype(wp.dtype), dx_res


_apa.defvjp(_apa_vjp_fwd, _apa_vjp_bwd)


def tp_attend_available(num_heads: int) -> bool:
    """True when the fused attention core can run under the active non-data
    mesh axes (round-5, closing the attend_project share of the TP tax):

    - no wrap axes: trivially yes (plain kernel);
    - model axis >1: the Megatron head split must engage — heads % tp == 0
      (each shard owns whole heads; per-head qkv column blocks + proj row
      blocks shard cleanly, one psum at the residual merge);
    - axes that shard nothing here (e.g. ``expert``): replicate inside the
      wrapper — correct and all-gather-free because the attention weights
      are genuinely replicated over those axes."""
    from . import attention as _att

    wrap = _att._wrap_axes()
    if not wrap:
        return True
    mesh = _att._tp_mesh()
    axis = _att._TP_STATE["axis"]
    tp = dict(mesh.shape).get(axis, 1)
    if axis in wrap and tp > 1:
        return num_heads % tp == 0
    return True


def attend_project_sharded(y, wq, wk, wv, bq, bk, bv, wp, bp, x_res,
                           num_heads, sm_scale=None, valid_len=None):
    """:func:`attend_project` under active non-data mesh axes (TP/EP).

    The Megatron attention split over the ``model`` axis: each shard owns
    ``num_heads/tp`` whole heads — its qkv slice is the per-head column
    blocks of wq/wk/wv (``P(None, model)``; heads are output-column blocks,
    so the qkv biases shard with them, ``P(model)``), its output-projection
    slice is the matching row block of wp (``P(model, None)``). Attention
    itself is embarrassingly parallel over heads; the row-parallel proj
    produces partial sums that psum ONCE in f32 — exactly where the
    unfused GSPMD path puts its proj all-reduce. The proj bias and the
    fused residual move outside the psum (each shard adding them would
    multiply by tp). Axes that shard nothing (``expert``) replicate the
    whole kernel — the wrapper then only keeps Mosaic out of GSPMD's
    reach, bit-equal to the unsharded kernel.

    Callers must gate on :func:`tp_attend_available` — when the head split
    cannot engage under a live model axis this falls back to the plain
    (unsharded) math, which would force weight all-gathers if jitted with
    Megatron-sharded params (the Block routes to the unfused attention
    core in that case, per the ADVICE r4 ln_mlp lesson)."""
    from . import attention as _att

    d = y.shape[-1]
    dh = d // num_heads
    if sm_scale is None:
        sm_scale = dh**-0.5
    wrap = _att._wrap_axes()

    def _plain():
        w = jnp.concatenate([wq, wk, wv], axis=1)
        b = (jnp.concatenate([bq, bk, bv]) if bq is not None
             else jnp.zeros((3 * d,), y.dtype))
        return attend_project(y, w, b, wp, bp, x_res, num_heads,
                              float(sm_scale), valid_len)

    if not wrap:
        return _plain()
    mesh = _att._tp_mesh()
    axis = _att._TP_STATE["axis"]
    tp = dict(mesh.shape).get(axis, 1)
    model = axis if (axis in wrap and tp > 1) else None
    if model is not None and num_heads % tp != 0:
        # head split can't engage; do NOT replicate sharded weights inside
        # shard_map (forced all-gathers) — run the plain path, which GSPMD
        # shards via the params' own shardings
        return _plain()
    if bq is None:
        bq = bk = bv = jnp.zeros((d,), y.dtype)
    vl = None if valid_len is None else int(valid_len)
    if model is None:
        # nothing sharded: full kernel incl. bias/residual, bit-equal
        wrapped = _tp_attend_wrapper(mesh, wrap, model, int(num_heads),
                                     float(sm_scale), vl,
                                     x_res is not None)
        args = (y, wq, wk, wv, bq, bk, bv, wp, bp)
        return wrapped(*(args + ((x_res,) if x_res is not None else ())))
    wrapped = _tp_attend_wrapper(mesh, wrap, model, int(num_heads),
                                 float(sm_scale), vl, False)
    out = wrapped(y, wq, wk, wv, bq, bk, bv, wp, bp)
    out = out + bp.astype(jnp.float32)
    if x_res is not None:
        out = out + x_res.astype(jnp.float32)
    return out.astype(y.dtype)


@functools.lru_cache(maxsize=64)
def _tp_attend_wrapper(mesh, wrap, model, num_heads, sm_scale, valid_len,
                       with_residual):
    """jit(shard_map) cache — same partial-manual lowering constraint as
    ``attention._tp_flash_wrapper``."""
    from jax.sharding import PartitionSpec as P

    tp = dict(mesh.shape).get(model, 1) if model is not None else 1

    if model is None:
        def fn_rep(y, wq, wk, wv, bq, bk, bv, wp, bp, *rest):
            w = jnp.concatenate([wq, wk, wv], axis=1)
            b = jnp.concatenate([bq, bk, bv])
            x_res = rest[0] if rest else None
            return attend_project(y, w, b, wp, bp, x_res, num_heads,
                                  sm_scale, valid_len)

        n_in = 10 if with_residual else 9
        return jax.jit(jax.shard_map(
            fn_rep, mesh=mesh,
            in_specs=tuple([P()] * n_in),
            out_specs=P(),
            axis_names=frozenset(wrap),
            check_vma=False,
        ))

    def fn(y, wq, wk, wv, bq, bk, bv, wp, bp):
        # per-shard: whole heads; bias/residual added outside the psum
        w = jnp.concatenate([wq, wk, wv], axis=1)
        b = jnp.concatenate([bq, bk, bv])
        d = y.shape[-1]
        part = attend_project(y, w, b, wp, jnp.zeros((d,), y.dtype), None,
                              num_heads // tp, sm_scale, valid_len)
        return jax.lax.psum(part.astype(jnp.float32), model)

    return jax.jit(jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P(None, model), P(None, model), P(None, model),
                  P(model), P(model), P(model), P(model, None), P()),
        out_specs=P(),
        axis_names=frozenset(wrap),
        check_vma=False,
    ))


def attend_project(
    y: jax.Array,
    w_qkv: jax.Array,
    b_qkv: jax.Array,
    w_proj: jax.Array,
    b_proj: jax.Array,
    x_res: Optional[jax.Array],
    num_heads: int,
    sm_scale: Optional[float] = None,
    valid_len: Optional[int] = None,
) -> jax.Array:
    """[x_res +] proj(flash_attention(split(y @ w_qkv + b_qkv))).

    The full attention sub-block as one custom-vjp op: wide qkv GEMM (XLA,
    measured at GEMM peak), flash + output projection (+ residual add) in
    one Pallas kernel (the in-kernel proj GEMM runs ~2x the XLA MFU at this
    shape and the bias grad costs nothing vs XLA's 2.6 ms/step bf16 reduce).
    ``x_res=None`` returns the branch only (drop-path active)."""
    bsz, n, d = y.shape
    dh = d // num_heads
    if sm_scale is None:
        sm_scale = dh**-0.5
    n_valid = n if valid_len is None else int(valid_len)
    block_q = _pick_block_fwd(n)
    n_pad = -(-n // block_q) * block_q
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        y = jnp.pad(y, pad)
        if x_res is not None:
            x_res = jnp.pad(x_res, pad)
    with_residual = x_res is not None
    if x_res is None:
        x_res = jnp.zeros((bsz, 8, w_proj.shape[1]), y.dtype)
    xo = _apa(y, w_qkv, b_qkv, w_proj, b_proj, x_res, num_heads,
              float(sm_scale), n_valid, block_q, with_residual)
    return xo[:, :n]


# ---------------------------------------------------------------------------
# availability gates
# ---------------------------------------------------------------------------

# process-wide default, set once from config (``model.fused_block``) before
# models build; tests flip it to exercise both paths
FUSED_BLOCK_DEFAULT = True
# explicit opt-in for running the fused path on CPU via the Pallas
# interpreter (slow) — used by the equivalence tests only
FORCE_ON_CPU = False


def set_fused_block(enabled) -> None:
    """True/False, or ``"mlp"`` — the TP mode: both fused paths run with
    their weights sharded over the inner shard_map
    (:func:`ln_mlp_sharded` Megatron fc1/fc2; round-5
    :func:`attend_project_sharded` per-head qkv/proj). The attention core
    drops to the unfused path only when the head split can't engage
    (``num_heads % tp != 0`` — :func:`tp_attend_available`), and the MLP
    to dense XLA ops when the hidden split can't (``ln_mlp_sharded``'s
    own fallback). The historical mode name "mlp" is kept for the
    trainer's config surface."""
    global FUSED_BLOCK_DEFAULT
    FUSED_BLOCK_DEFAULT = "mlp" if enabled == "mlp" else bool(enabled)


def mlp_only_mode() -> bool:
    return FUSED_BLOCK_DEFAULT == "mlp"


# opt-in int8 GEMM quantisation for the fused MLP/projection paths
# (``model.quantization``: "none" | "int8"); NOT reference parity
QUANTIZATION_DEFAULT = "none"


def set_quantization(mode: str) -> None:
    if mode not in ("none", "int8"):
        raise ValueError(f"unknown quantization mode: {mode!r}")
    global QUANTIZATION_DEFAULT
    QUANTIZATION_DEFAULT = mode


def quantized_default() -> bool:
    return QUANTIZATION_DEFAULT == "int8"


def fused_block_available(dtype=None) -> bool:
    """True when the fused LN+GEMM / packed-qkv path can run here."""
    if pltpu is None:
        return False
    if jax.default_backend() in ("cpu",):
        return FORCE_ON_CPU and _interpret()
    return True
