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
  ran 35x slower on a v5e.
- **K/V fetched once per (batch, head).** Grid (B, H, q-blocks) with the q
  index innermost and K/V index maps constant in it — Pallas keeps K/V
  resident across the row sweep.
- **(B, N, H, dh) layout end-to-end.** The kernel indexes the head dim via
  block specs, so the module-level ``(B,N,3,H,dh) -> (B,H,N,dh)``
  transposes (and their HBM round-trips) disappear; callers hand over the
  qkv reshape output directly.
- **Caller-side padding is free when N is already a lane multiple** — the
  model pads its token grid once after CLS concat (``valid_len`` masks the
  tail), instead of every layer re-padding q/k/v.
- fp32 scores/softmax on the VPU (the actual bottleneck at dh=64:
  ~1G exps per layer at CHAMMI/JUMP-CP sizes), bf16 MXU matmuls with
  ``preferred_element_type=f32``; padding is chosen to minimize n_pad^2.
- Backward = dq over (B, H, q-blocks) and dk/dv over (B, H, k-blocks),
  recomputing P from the saved log-sum-exp (the XLA backward stages a
  multi-GB probability tensor and OOMs a 16GB v5e at batch 64).
"""

from __future__ import annotations

import functools
from typing import Optional

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


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pick_block_q(n: int) -> int:
    """Minimal lane-aligned padding first (score matrix + exp are
    O(n_pad^2)), then the largest q-block that divides it and keeps the fp32
    score block within a VMEM budget (block_q * n_pad * 4B <= ~3 MB).
    Measured on v5e at N=1569: n_pad=1664 with block_q=416 beats both 128
    (more program overhead) and 512 (pads to 2048)."""
    n_pad = _cdiv(n, LANE) * LANE
    cap = min(512, (3 * 1024 * 1024) // (4 * n_pad))
    best = LANE
    for b in range(8, cap + 1, 8):
        if n_pad % b == 0:
            best = b
    return best


def preferred_pad(n: int) -> int:
    """Token count the model should pad to so per-layer padding is a no-op."""
    if jax.default_backend() in ("cpu",) or pltpu is None or n > MAX_SINGLE_PASS_N:
        return n
    block_q = _pick_block_q(n)
    return _cdiv(n, block_q) * block_q


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
# Pallas forward — single-pass softmax over a resident K/V row, BNHD layout
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, sm_scale, n_valid):
    q = q_ref[0]  # (bq, dh)
    k = k_ref[0]  # (n, dh)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, n)
    if sm_scale != 1.0:
        s = s * sm_scale
    if n_valid < s.shape[1]:
        col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col_ids < n_valid, s, MASK_VALUE)

    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l))[:, 0][None, :]


def _flash_fwd_impl(q, k, v, sm_scale: float, n_valid: int, block_q: int):
    bh, n, dh = q.shape
    nq = n // block_q
    kernel = functools.partial(_fwd_kernel, sm_scale=sm_scale, n_valid=n_valid)
    o, lse = pl.pallas_call(
        kernel,
        grid=(bh, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, qi: (b, qi, 0)),
            pl.BlockSpec((1, n, dh), lambda b, qi: (b, 0, 0)),  # resident
            pl.BlockSpec((1, n, dh), lambda b, qi: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, qi: (b, qi, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, qi: (b, qi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, nq, 1, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n * n * dh,
            bytes_accessed=bh * n * dh * 2 * 4,
            transcendentals=bh * n * n,
        ),
        interpret=INTERPRET,
    )(q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# Pallas backward: dq over q-blocks, dk/dv over k-blocks (K/Q resident)
# ---------------------------------------------------------------------------


def _bwd_fused_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
    dq_ref, dk_ref, dv_ref, dk_scr, dv_scr,
    *, sm_scale, n_valid, n_q_blocks,
):
    """One pass per q-block: emits the dq block and accumulates dk/dv in
    fp32 VMEM scratch across the sequential q sweep (dk/dv blocks are
    revisited — index maps constant in qi). Halves the exp work and drops
    two matmuls vs separate dq / dkv kernels."""
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]  # (bq, dh)
    k = k_ref[0]  # (n, dh)
    v = v_ref[0]  # (n, dh)
    do = do_ref[0]  # (bq, dh)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if sm_scale != 1.0:
        s = s * sm_scale
    if n_valid < s.shape[1]:
        col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col_ids < n_valid, s, MASK_VALUE)
    p = jnp.exp(s - lse_ref[0, 0, 0][:, None])  # (bq, n)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, n)
    ds = p * (dp - di_ref[0, 0, 0][:, None]) * sm_scale
    dq_ref[0] = jax.lax.dot(
        ds.astype(k.dtype), k, preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dsb = ds.astype(q.dtype)
    pb = p.astype(do.dtype)
    dk_scr[...] += jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (n, dh)
    dv_scr[...] += jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (n, dh)

    @pl.when(qi == n_q_blocks - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, o, lse, do, sm_scale, n_valid, block_q):
    bh, n, dh = q.shape
    nq = n // block_q
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)  # (bh, n)
    di_blocked = di.reshape(bh, nq, 1, block_q)

    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_fused_kernel, sm_scale=sm_scale, n_valid=n_valid, n_q_blocks=nq
        ),
        grid=(bh, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, qi: (b, qi, 0)),  # q
            pl.BlockSpec((1, n, dh), lambda b, qi: (b, 0, 0)),  # k resident
            pl.BlockSpec((1, n, dh), lambda b, qi: (b, 0, 0)),  # v resident
            pl.BlockSpec((1, block_q, dh), lambda b, qi: (b, qi, 0)),  # do
            pl.BlockSpec((1, 1, 1, block_q), lambda b, qi: (b, qi, 0, 0)),  # lse
            pl.BlockSpec((1, 1, 1, block_q), lambda b, qi: (b, qi, 0, 0)),  # di
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, qi: (b, qi, 0)),  # dq
            pl.BlockSpec((1, n, dh), lambda b, qi: (b, 0, 0)),  # dk (revisited)
            pl.BlockSpec((1, n, dh), lambda b, qi: (b, 0, 0)),  # dv (revisited)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, n, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, n, dh), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, dh), jnp.float32),
            pltpu.VMEM((n, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * n * n * dh,
            bytes_accessed=bh * n * dh * 2 * 6,
            transcendentals=bh * n * n,
        ),
        interpret=INTERPRET,
    )(q, k, v, do, lse, di_blocked)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, sm_scale, n_valid, block_q):
    o, _ = _flash_fwd_impl(q, k, v, sm_scale, n_valid, block_q)
    return o


def _flash_vjp_fwd(q, k, v, sm_scale, n_valid, block_q):
    o, lse = _flash_fwd_impl(q, k, v, sm_scale, n_valid, block_q)
    return o, (q, k, v, o, lse)


def _flash_vjp_bwd(sm_scale, n_valid, block_q, res, do):
    q, k, v, o, lse = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, o, lse, do, sm_scale, n_valid, block_q)
    return dq, dk, dv


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention_bnhd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: Optional[float] = None,
    valid_len: Optional[int] = None,
    block_q: Optional[int] = None,
) -> jax.Array:
    """Flash attention over (B, N, H, Dh); pads N to a block multiple.

    Internally transposes to the (B*H, N, dh) layout Mosaic tiles best
    (a BNHD-native kernel hit "unsupported shape cast" relayouts — see git
    history); ``valid_len`` masks key positions >= valid_len.
    """
    b, n, h, dh = q.shape
    if sm_scale is None:
        sm_scale = dh**-0.5
    n_valid = n if valid_len is None else int(valid_len)
    if block_q is None:
        block_q = _pick_block_q(n)
    n_pad = _cdiv(n, block_q) * block_q
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, n, dh)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, n, dh)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, n, dh)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        qf, kf, vf = jnp.pad(qf, pad), jnp.pad(kf, pad), jnp.pad(vf, pad)
    o = _flash(qf, kf, vf, float(sm_scale), n_valid, block_q)
    return o[:, :n].reshape(b, h, n, dh).transpose(0, 2, 1, 3)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    valid_len: Optional[int] = None,
) -> jax.Array:
    """(B, H, N, Dh) wrapper."""
    b, h, n, dh = q.shape
    if sm_scale is None:
        sm_scale = dh**-0.5
    n_valid = n if valid_len is None else int(valid_len)
    if block_q is None:
        block_q = _pick_block_q(n)
    n_pad = _cdiv(n, block_q) * block_q
    qf = q.reshape(b * h, n, dh)
    kf = k.reshape(b * h, n, dh)
    vf = v.reshape(b * h, n, dh)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        qf, kf, vf = jnp.pad(qf, pad), jnp.pad(kf, pad), jnp.pad(vf, pad)
    o = _flash(qf, kf, vf, float(sm_scale), n_valid, block_q)
    return o[:, :n].reshape(b, h, n, dh)


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
    if impl == "pallas" and q.shape[2] <= MAX_SINGLE_PASS_N:
        return flash_attention(q, k, v, sm_scale, valid_len=valid_len)
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    return xla_attention(q, k, v, sm_scale, valid_len=valid_len)


def multi_head_attention_bnhd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: Optional[float] = None,
    impl: str = "auto",
    valid_len: Optional[int] = None,
) -> jax.Array:
    """(B, N, H, Dh) dispatch — the transpose-free fast path for modules."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() not in ("cpu",) and pltpu is not None else "xla"
    if impl == "pallas" and q.shape[1] <= MAX_SINGLE_PASS_N:
        return flash_attention_bnhd(q, k, v, sm_scale, valid_len)
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    o = xla_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        sm_scale, valid_len=valid_len,
    )
    return o.transpose(0, 2, 1, 3)
