"""Multi-head attention for the channel-token grid.

The reference's hot path is full O(N^2) attention over N = C*(H/p)*(W/p)+1
tokens (``models/vit.py:101-144``), optionally routed through xFormers'
memory-efficient attention (``vit.py:232-249``). The TPU-native equivalent
here is a Pallas flash-attention kernel (forward + backward), with an XLA
einsum fallback for CPU tests and as a numerics oracle.

Kernel design (sized for this workload: N <= ~2.5k tokens, head_dim 64):

- **Full-KV-row, single-pass softmax.** At these sequence lengths a whole
  K/V row for one (batch, head) fits in VMEM (N=2432: ~0.6 MB bf16), so
  each program computes the complete softmax for its q-block in one shot —
  no online rescaling, no scratch revisits. A streaming-flash first cut
  (grid (B*H, N/128, N/128) = 65k tiny programs) was DMA-latency-bound and
  ran 35x slower on a v5e. This design also beats jax's official pallas
  flash kernel by ~8x at this geometry (33 ms/layer vs 4.1, measured).
- **Lane-packed layout.** q/k/v stay (B, N, H*dh) — the projections'
  natural GEMM output — and heads are static 64-lane slices inside the
  kernel, so there are ZERO layout copies around the pallas calls
  (an earlier (B*H, N, dh) kernel family cost 47.6 ms/step in XLA
  transposes and was deleted once this matched its speed).
- **K/V fetched once per program row-sweep.** Grid (B, q-blocks) with the
  q index innermost and K/V index maps constant in it.
- fp32 scores/softmax on the VPU, bf16 MXU matmuls with
  ``preferred_element_type=f32``; padding minimizes n_pad^2. (Measured:
  the kernel is NOT exp-bound — deleting the exp entirely does not move
  the runtime; see PERFORMANCE.md round-2 table.)
- Backward = one fused kernel per q-block sweep: emits dq, accumulates
  dk/dv in fp32 VMEM scratch (the XLA backward stages a multi-GB
  probability tensor and OOMs a 16GB v5e at batch 64).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU-only hosts
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

MASK_VALUE = -1e30
LANE = 128
# beyond this, a K/V row + fp32 score block no longer fits VMEM comfortably
MAX_SINGLE_PASS_N = 8192

# Interpret mode runs the Pallas kernels on the CPU emulator (for tests).
INTERPRET = False

# --- tensor-parallel head sharding -------------------------------------
# GSPMD cannot auto-partition Mosaic kernels, so under a mesh with a >1
# "model" axis the lane-packed kernel runs under an inner shard_map over
# that axis: heads are embarrassingly parallel, each TP shard computes its
# local H/tp block of 64-lane head slices. q/k/v arrive model-sharded from
# the column-parallel projections (parallel/shardings.py) and the output
# stays model-sharded into the row-parallel proj, so the wrapper introduces
# ZERO collectives — the one all-reduce per block stays where Megatron puts
# it (after proj). Set by the Trainer when the mesh has model > 1.
_TP_STATE = {"mesh": None, "axis": "model"}


def set_tp_attention(mesh=None, axis: str = "model") -> None:
    """Enable (mesh with a >1 ``axis``) or disable (``None``) tensor-parallel
    head sharding for :func:`flash_attention_packed`."""
    _TP_STATE["mesh"] = mesh
    _TP_STATE["axis"] = axis


def tp_degree(num_heads: int) -> int:
    """Active TP split of the packed flash kernel (1 = run unsharded)."""
    mesh = _TP_STATE["mesh"]
    if mesh is None:
        return 1
    tp = dict(mesh.shape).get(_TP_STATE["axis"], 1)
    return tp if tp > 1 and num_heads % tp == 0 else 1


def _wrap_axes() -> tuple:
    """Every non-data-parallel mesh axis of size >1: the kernel must be
    manual over ALL of them (Mosaic refuses GSPMD propagation even for axes
    the activations are replicated over, e.g. an ``expert`` axis sharding
    only the per-channel parameter tables). ``model`` shards heads when
    divisible; the rest replicate. ``data``/``dcn`` are the outer
    data-parallel axes, already manual in the step's own shard_map."""
    mesh = _TP_STATE["mesh"]
    if mesh is None:
        return ()
    return tuple(ax for ax, sz in dict(mesh.shape).items()
                 if ax not in ("data", "dcn") and sz > 1)


def _tp_mesh():
    """The mesh for the inner shard_map. Inside an already-manual context
    (the data-sharded train step body) the context's AbstractMesh must be
    passed instead of the concrete mesh, else shard_map rejects the
    axis-type mismatch (data is Manual there, Auto on the stored mesh)."""
    axis = _TP_STATE["axis"]
    ctx = jax.sharding.get_abstract_mesh()
    if ctx is not None and not ctx.empty and axis in ctx.shape:
        return ctx
    return _TP_STATE["mesh"]

# VMEM budgets for the fp32 score block(s): hp * block_q * n_pad * 4B.
# fwd holds one live score matrix; bwd holds two (p and ds) plus f32 dk/dv
# scratch, hence the smaller budget (hp=2, bq=416 at N=1664 fails to fit).
# The lane-packed kernels raise vmem_limit_bytes past the compiler's 16 MB
# scoped default (v5e physical VMEM is far larger), which the block sweep
# below relies on.
_FWD_SCORE_BYTES = 9 * 1024 * 1024
_BWD_SCORE_BYTES = 3 * 1024 * 1024


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pick_block_q(n: int, *, hp: int = 1, budget: int = _FWD_SCORE_BYTES) -> int:
    """Minimal lane-aligned padding first (score matrix + exp are
    O(n_pad^2)), then the largest q-block that divides it and keeps the fp32
    score block within the VMEM budget. Measured on v5e at N=1569:
    n_pad=1664 with block_q=416 beats both 128 (more program overhead) and
    512 (pads to 2048)."""
    n_pad = _cdiv(n, LANE) * LANE
    cap = min(512, budget // (4 * n_pad * hp))
    best = 8
    for b in range(8, max(cap, 8) + 1, 8):
        if n_pad % b == 0:
            best = b
    return best


def _pick_block_q_bwd(n: int, dh: int = 64, *, hp: int = 2,
                      budget: int = _BWD_SCORE_BYTES) -> int:
    """Backward q-block chooser.

    At dh < 128 (half-width MXU matmuls) a 128-multiple block wins when one
    fits the budget — measured with the proj-fused backward kernel: at
    N=2432 bq=128 beats the largest-divisor pick 152 by 14% (10.62 vs
    12.29 ms/layer); at N=1664 bq=128 vs 208 is 10.22 vs 10.28 and the full
    bench gains (+1.0 imgs/s flagship, +4 recipe). At dh >= 128 the matmuls
    already fill the array and the LARGEST divisor wins (3-head sweep:
    bq=208 5.88 vs 128 6.42 ms/layer; forcing 128 cost 17 imgs/s on the
    dh=128 bench metric)."""
    n_pad = _cdiv(n, LANE) * LANE
    cap = min(512, budget // (4 * n_pad * hp))
    best, best128 = 8, None
    for b in range(8, max(cap, 8) + 1, 8):
        if n_pad % b == 0:
            best = b
            if b % 128 == 0:
                best128 = b
    if dh < 128 and best128 is not None:
        return best128
    return best


def preferred_pad(n: int) -> int:
    """Token count the model should pad to so per-layer padding is a no-op."""
    if jax.default_backend() in ("cpu",) or pltpu is None or n > MAX_SINGLE_PASS_N:
        return n
    block_q = _pick_block_q(n)
    return _cdiv(n, block_q) * block_q


def maybe_pad_tokens(
    xseq: jax.Array,
    dtype,
    *,
    num_heads: Optional[int] = None,
    attention_impl: str = "auto",
) -> Tuple[jax.Array, Optional[int]]:
    """Pad a (B, N, D) token grid ONCE to the flash kernel's preferred
    multiple, so no layer re-pads q/k/v; padded keys are masked downstream
    via the returned ``valid_len``.

    Only pads when the dense-layer overhead stays small; the fused-block
    path (TPU bf16, padded/even sequence only) gains enough on the dense
    side to justify a wider cap (the k=3/6 HCS draws pad at 1.086/1.088).
    The wider cap is only chosen when the Block's fused gate can actually
    accept this geometry (D multiple of 128, 64-multiple head width, pallas
    impl) — otherwise up to 20% extra dense compute would buy nothing.
    Returns ``(xseq, valid_len)`` with ``valid_len=None`` when unpadded.
    """
    from . import fused_block as _fb  # circular-at-import, fine at call time

    n_tok = xseq.shape[1]
    dim = xseq.shape[-1]
    n_padded = preferred_pad(n_tok)
    fused_geometry = (
        dim % 128 == 0
        and (num_heads is None or (dim // num_heads) % 64 == 0)
        and attention_impl in ("auto", "pallas")
    )
    cap = (
        1.20
        if (_fb.FUSED_BLOCK_DEFAULT and _fb.fused_block_available()
            and dtype == jnp.bfloat16 and fused_geometry)
        else 1.08
    )
    if n_tok < n_padded <= int(cap * n_tok):
        return jnp.pad(xseq, ((0, 0), (0, n_padded - n_tok), (0, 0))), n_tok
    return xseq, None


# ---------------------------------------------------------------------------
# XLA reference implementation ((B, H, N, dh) layout)
# ---------------------------------------------------------------------------


def xla_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: float,
    valid_len: Optional[int] = None,
) -> jax.Array:
    """Plain einsum attention; numerics oracle for the Pallas kernel."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * sm_scale
    if valid_len is not None and valid_len < k.shape[2]:
        mask = jnp.arange(k.shape[2]) < valid_len
        s = jnp.where(mask[None, None, None, :], s, MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


# ---------------------------------------------------------------------------
# Lane-packed kernels: q/k/v stay (B, N, H*dh) — the projections' natural
# output layout — and heads are static 64-lane slices inside the kernel.
# This removes ALL XLA layout copies around the pallas calls (measured
# 47.6 ms/step at flagship geometry: pallas operands must be default-layout,
# so the (B,N,H,dh)->(B*H,N,dh) transposes materialized as %copy fusions).
# Kernel speed matches the head-packed (B*H,N,dh) design (4.10 vs 4.07
# ms/layer measured) — the in-kernel lane slices are register moves.
# ---------------------------------------------------------------------------


def _packed_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads, sm_scale, n_valid):
    q = q_ref[0]  # (bq, H*dh)
    k = k_ref[0]  # (n, H*dh)
    v = v_ref[0]
    dh = q.shape[-1] // num_heads
    outs = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, n)
        if sm_scale != 1.0:
            s = s * sm_scale
        if n_valid < s.shape[-1]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(p.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32)
        outs.append((o / l).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)


def _packed_fwd_impl(q, k, v, num_heads, sm_scale, n_valid, block_q):
    b, n, d = q.shape
    nq = n // block_q
    kernel = functools.partial(
        _packed_fwd_kernel, num_heads=num_heads, sm_scale=sm_scale, n_valid=n_valid
    )
    return pl.pallas_call(
        kernel,
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 0)),  # resident
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * n * d,
            bytes_accessed=b * n * d * 2 * 4,
            transcendentals=b * n * n * num_heads,
        ),
        interpret=INTERPRET,
    )(q, k, v)


def _packed_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, o_ref,
    dq_ref, dk_ref, dv_ref, dk_scr, dv_scr,
    *, num_heads, sm_scale, n_valid, n_q_blocks,
):
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]   # (bq, D)
    k = k_ref[0]   # (n, D)
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]
    dh = q.shape[-1] // num_heads
    dqs, dks, dvs = [], [], []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh, kh, vh, doh = q[:, sl], k[:, sl], v[:, sl], do[:, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if sm_scale != 1.0:
            s = s * sm_scale
        if n_valid < s.shape[-1]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)  # == exp(s - lse)
        di = jnp.sum(
            o[:, sl].astype(jnp.float32) * doh.astype(jnp.float32), axis=1, keepdims=True
        )
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - di) * sm_scale
        dsb = ds.astype(kh.dtype)
        pb = p.astype(doh.dtype)
        dqs.append(
            jax.lax.dot(dsb, kh, preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        )
        dks.append(jax.lax.dot_general(
            dsb, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ))
        dvs.append(jax.lax.dot_general(
            pb, doh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ))
    dq_ref[0] = jnp.concatenate(dqs, axis=1)
    dk_scr[...] += jnp.concatenate(dks, axis=1)
    dv_scr[...] += jnp.concatenate(dvs, axis=1)

    @pl.when(qi == n_q_blocks - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _packed_bwd_impl(q, k, v, o, do, num_heads, sm_scale, n_valid):
    b, n, d = q.shape
    # measured: bwd bq 208 (156.4 ms/12 fwd+bwd) beats 416 (159.9) and
    # 104 (184) at N=1664 once vmem_limit_bytes unblocks the compile
    block_q = _pick_block_q_bwd(n, d // num_heads)
    nq = n // block_q
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _packed_bwd_kernel, num_heads=num_heads, sm_scale=sm_scale,
            n_valid=n_valid, n_q_blocks=nq,
        ),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),  # q
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 0)),  # k resident
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 0)),  # v resident
            pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),  # do
            pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),  # o
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),  # dq
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 0)),  # dk (revisited)
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 0)),  # dv (revisited)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, n, d), q.dtype),
            jax.ShapeDtypeStruct((b, n, d), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, d), jnp.float32),
            pltpu.VMEM((n, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # the full-width f32 scratch + per-head temps overflow the 16 MB
            # scoped-vmem default in some surrounding-program contexts; the
            # physical VMEM is larger — raise the cap for this kernel
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n * n * d,
            bytes_accessed=b * n * d * 2 * 6,
            transcendentals=b * n * n * num_heads,
        ),
        interpret=INTERPRET,
    )(q, k, v, do, o)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_packed(q, k, v, num_heads, sm_scale, n_valid, block_q):
    return _packed_fwd_impl(q, k, v, num_heads, sm_scale, n_valid, block_q)


def _flash_packed_vjp_fwd(q, k, v, num_heads, sm_scale, n_valid, block_q):
    o = _packed_fwd_impl(q, k, v, num_heads, sm_scale, n_valid, block_q)
    return o, (q, k, v, o)


def _flash_packed_vjp_bwd(num_heads, sm_scale, n_valid, block_q, res, do):
    q, k, v, o = res
    return _packed_bwd_impl(q, k, v, o, do, num_heads, sm_scale, n_valid)


_flash_packed.defvjp(_flash_packed_vjp_fwd, _flash_packed_vjp_bwd)


def flash_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    sm_scale: Optional[float] = None,
    valid_len: Optional[int] = None,
) -> jax.Array:
    """Flash attention over lane-packed (B, N, H*dh) q/k/v; returns the same
    layout — zero layout copies on either side. Pads N to a block multiple
    (already a no-op when the model pads via :func:`preferred_pad`).

    Under an active TP mesh (:func:`set_tp_attention`, heads divisible) the
    kernel runs per model-axis shard via an inner ``shard_map`` — heads are
    embarrassingly parallel, so each shard computes its local H/tp heads on
    its local lane slice with no collectives."""
    b, n, d = q.shape
    dh = d // num_heads
    if sm_scale is None:
        sm_scale = dh**-0.5
    wrap = _wrap_axes()
    if wrap:
        tp = tp_degree(num_heads)
        head_axis = _TP_STATE["axis"] if (tp > 1 and _TP_STATE["axis"] in wrap) else None
        wrapped = _tp_flash_wrapper(
            _tp_mesh(), wrap, head_axis, num_heads // tp, float(sm_scale),
            None if valid_len is None else int(valid_len),
        )
        return wrapped(q, k, v)
    return _flash_packed_shard(
        q, k, v, num_heads=num_heads, sm_scale=float(sm_scale), valid_len=valid_len
    )


@functools.lru_cache(maxsize=64)
def _tp_flash_wrapper(mesh, wrap_axes, head_axis, heads_local, sm_scale, valid_len):
    """jitted shard_map manual over every non-data mesh axis: the ``model``
    axis (``head_axis``) shards the lane-packed heads, any other axis (e.g.
    ``expert``) sees replicated activations and just keeps the Mosaic call
    out of GSPMD propagation. jit-wrapped because a partial-manual
    shard_map (axis_names ⊂ mesh axes) only lowers under a trace — eager
    callers would hit a confusing out_specs error; under an outer
    jit/shard_map trace the wrapper inlines."""
    from jax.sharding import PartitionSpec as P

    fn = functools.partial(
        _flash_packed_shard, num_heads=heads_local, sm_scale=sm_scale,
        valid_len=valid_len,
    )
    return jax.jit(jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(None, None, head_axis),) * 3,
        out_specs=P(None, None, head_axis),
        axis_names=frozenset(wrap_axes),
        check_vma=False,
    ))


def _flash_packed_shard(q, k, v, *, num_heads, sm_scale, valid_len):
    """One (possibly TP-local) lane-packed flash call: pad + kernel."""
    b, n, d = q.shape
    n_valid = n if valid_len is None else int(valid_len)
    # measured sweep at N=1664 (vmem_limit raised): fwd bq 416 (47.4 ms/12)
    # beats 208 (49.2); bwd picks its own (208 beats 416 there)
    block_q = _pick_block_q(n, hp=2, budget=_FWD_SCORE_BYTES)
    n_pad = _cdiv(n, block_q) * block_q
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    o = _flash_packed(q, k, v, num_heads, sm_scale, n_valid, block_q)
    return o[:, :n]


def multi_head_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    sm_scale: Optional[float] = None,
    impl: str = "auto",
    valid_len: Optional[int] = None,
) -> jax.Array:
    """(B, N, H*dh) dispatch — Pallas lane-packed kernel or XLA fallback."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() not in ("cpu",) and pltpu is not None else "xla"
    if impl == "pallas" and _TP_STATE["mesh"] is not None and tp_degree(num_heads) == 1:
        # TP mesh active but heads don't divide: an unsharded Mosaic call
        # would sit under GSPMD model-axis propagation, which Mosaic refuses
        # — the XLA einsum path partitions fine instead
        if dict(_TP_STATE["mesh"].shape).get(_TP_STATE["axis"], 1) > 1:
            impl = "xla"
    if impl == "pallas" and q.shape[1] <= MAX_SINGLE_PASS_N:
        return flash_attention_packed(q, k, v, num_heads, sm_scale, valid_len)
    b, n, d = q.shape
    dh = d // num_heads
    if sm_scale is None:
        sm_scale = dh**-0.5
    qh = q.reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, n, num_heads, dh).transpose(0, 2, 1, 3)
    o = xla_attention(qh, kh, vh, sm_scale, valid_len=valid_len)
    return o.transpose(0, 2, 1, 3).reshape(b, n, d)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: Optional[float] = None,
    valid_len: Optional[int] = None,
) -> jax.Array:
    """(B, H, N, Dh) convenience wrapper over the lane-packed kernel.

    The production modules use the packed (B, N, H*dh) layout directly
    (:func:`flash_attention_packed` / ops/fused_block.py) — this wrapper is
    the generic public API; its transposes fold into neighbouring ops."""
    b, h, n, dh = q.shape
    qp = q.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
    kp = k.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
    vp = v.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
    o = flash_attention_packed(qp, kp, vp, h, sm_scale, valid_len)
    return o.reshape(b, n, h, dh).transpose(0, 2, 1, 3)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: Optional[float] = None,
    impl: str = "auto",
    valid_len: Optional[int] = None,
) -> jax.Array:
    """(B, H, N, Dh) dispatch between Pallas flash and the XLA fallback."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() not in ("cpu",) and pltpu is not None else "xla"
    if impl == "pallas" and _TP_STATE["mesh"] is not None and tp_degree(q.shape[1]) == 1:
        if dict(_TP_STATE["mesh"].shape).get(_TP_STATE["axis"], 1) > 1:
            impl = "xla"  # see multi_head_attention_packed
    if impl == "pallas" and q.shape[2] <= MAX_SINGLE_PASS_N:
        return flash_attention(q, k, v, sm_scale, valid_len=valid_len)
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    return xla_attention(q, k, v, sm_scale, valid_len=valid_len)
