"""Multi-head attention for the channel-token grid.

The reference's hot path is full O(N^2) attention over N = C*(H/p)*(W/p)+1
tokens (``models/vit.py:101-144``), optionally routed through xFormers'
memory-efficient attention (``vit.py:232-249``). The TPU-native equivalent
here is a Pallas flash-attention kernel (forward + backward), with an XLA
einsum fallback for CPU tests and as a numerics oracle.

Design notes:
- online softmax with deferred normalization (divide by l once, at the end)
- fp32 softmax statistics, bf16-friendly matmuls with
  ``preferred_element_type=jnp.float32``
- sequence padding to a block multiple is handled in the wrapper with
  zero-padding + a *static* valid-length mask baked into the kernel, so no
  extra mask tensors move through HBM
- backward = two Pallas kernels (dKV and dQ) that recompute P from the
  saved log-sum-exp instead of materializing the (N, N) probability matrix
  (at CHAMMI/JUMP-CP sizes the XLA backward would stage multi-GB buffers)
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
BLOCK = 128

# Interpret mode runs the Pallas kernels on the CPU emulator (for tests).
INTERPRET = False


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# XLA reference implementation
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
# Pallas forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *, sm_scale, n_valid, n_kv_blocks, block_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if sm_scale != 1.0:
        s = s * sm_scale
    col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col_ids < n_valid, s, MASK_VALUE)

    m_prev = m_scr[...]
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # (bq, 1)
    m_next = jnp.maximum(m_prev, m_curr)  # (bq, 128)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[...] = m_next
    l_scr[...] = l_next

    v = v_ref[0]
    pv = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(ki == n_kv_blocks - 1)
    def _store():
        l_final = l_scr[:, :1]
        l_inv = jnp.where(l_final == 0.0, 1.0, 1.0 / l_final)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        lse = m_scr[:, :1] + jnp.log(jnp.maximum(l_final, 1e-30))
        # lane-aligned (1, block_q) row of the (bh, nq, 1, block_q) lse array
        lse_ref[0, 0] = lse[:, 0][None, :]


def _flash_fwd_impl(q, k, v, sm_scale: float, n_valid: int, block_q: int, block_k: int):
    bh, n, dh = q.shape
    nq, nk = n // block_q, n // block_k
    # the lse layout (bh, nq, 1, block_q) needs a lane-aligned trailing dim
    assert block_q % 128 == 0, "block_q must be a multiple of the 128-lane tile"
    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, n_valid=n_valid, n_kv_blocks=nk, block_k=block_k
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, dh), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, dh), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, qi, ki: (b, qi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, nq, 1, block_q), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, BLOCK), jnp.float32),
            pltpu.VMEM((block_q, BLOCK), jnp.float32),
            pltpu.VMEM((block_q, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# Pallas backward: dKV kernel (iterates q blocks per kv block)
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, sm_scale, n_valid, n_q_blocks, block_k):
    qi = pl.program_id(2)
    ki = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if sm_scale != 1.0:
        s = s * sm_scale
    col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col_ids < n_valid, s, MASK_VALUE)

    p = jnp.exp(s - lse_ref[0, 0, 0][:, None])  # (bq, bk), exact softmax probs
    dv_scr[...] += jax.lax.dot_general(
        p, do.astype(jnp.float32), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - di_ref[0, 0, 0][:, None]) * sm_scale
    dk_scr[...] += jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == n_q_blocks - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, dq_scr, *, sm_scale, n_valid, n_kv_blocks, block_k):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if sm_scale != 1.0:
        s = s * sm_scale
    col_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
    s = jnp.where(col_ids < n_valid, s, MASK_VALUE)

    p = jnp.exp(s - lse_ref[0, 0, 0][:, None])
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - di_ref[0, 0, 0][:, None]) * sm_scale
    dq_scr[...] += jax.lax.dot(ds, k.astype(jnp.float32), preferred_element_type=jnp.float32)

    @pl.when(ki == n_kv_blocks - 1)
    def _store():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _flash_bwd_impl(q, k, v, o, lse, do, sm_scale, n_valid, block_q, block_k):
    bh, n, dh = q.shape
    nq, nk = n // block_q, n // block_k
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)  # (bh, n)
    di = di.reshape(bh, nq, 1, block_q)  # lane-aligned, same layout as lse

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, sm_scale=sm_scale, n_valid=n_valid, n_q_blocks=nq, block_k=block_k
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, ki, qi: (b, qi, 0)),  # q
            pl.BlockSpec((1, block_k, dh), lambda b, ki, qi: (b, ki, 0)),  # k
            pl.BlockSpec((1, block_k, dh), lambda b, ki, qi: (b, ki, 0)),  # v
            pl.BlockSpec((1, block_q, dh), lambda b, ki, qi: (b, qi, 0)),  # do
            pl.BlockSpec((1, 1, 1, block_q), lambda b, ki, qi: (b, qi, 0, 0)),  # lse
            pl.BlockSpec((1, 1, 1, block_q), lambda b, ki, qi: (b, qi, 0, 0)),  # di
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, dh), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_k, dh), lambda b, ki, qi: (b, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, dh), q.dtype),
            jax.ShapeDtypeStruct((bh, n, dh), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dh), jnp.float32),
            pltpu.VMEM((block_k, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, k, v, do, lse, di)

    dq_kernel = functools.partial(
        _bwd_dq_kernel, sm_scale=sm_scale, n_valid=n_valid, n_kv_blocks=nk, block_k=block_k
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, dh), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, dh), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_q, dh), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, qi, ki: (b, qi, 0, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b, qi, ki: (b, qi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=INTERPRET,
    )(q, k, v, do, lse, di)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, sm_scale, n_valid, block_q, block_k):
    o, _ = _flash_fwd_impl(q, k, v, sm_scale, n_valid, block_q, block_k)
    return o


def _flash_vjp_fwd(q, k, v, sm_scale, n_valid, block_q, block_k):
    o, lse = _flash_fwd_impl(q, k, v, sm_scale, n_valid, block_q, block_k)
    return o, (q, k, v, o, lse)


def _flash_vjp_bwd(sm_scale, n_valid, block_q, block_k, res, do):
    q, k, v, o, lse = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, o, lse, do, sm_scale, n_valid, block_q, block_k)
    return dq, dk, dv


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: Optional[float] = None,
    block_q: int = BLOCK,
    block_k: int = BLOCK,
) -> jax.Array:
    """Flash attention over (B, H, N, Dh); pads N to a block multiple."""
    b, h, n, dh = q.shape
    if sm_scale is None:
        sm_scale = dh**-0.5
    n_pad = max(block_q, block_k, _cdiv(n, max(block_q, block_k)) * max(block_q, block_k))
    qf = q.reshape(b * h, n, dh)
    kf = k.reshape(b * h, n, dh)
    vf = v.reshape(b * h, n, dh)
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n), (0, 0))
        qf = jnp.pad(qf, pad)
        kf = jnp.pad(kf, pad)
        vf = jnp.pad(vf, pad)
    o = _flash(qf, kf, vf, float(sm_scale), n, block_q, block_k)
    return o[:, :n].reshape(b, h, n, dh)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: Optional[float] = None,
    impl: str = "auto",
) -> jax.Array:
    """Dispatch between the Pallas flash kernel and the XLA fallback."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() not in ("cpu",) and pltpu is not None else "xla"
    if impl == "pallas":
        return flash_attention(q, k, v, sm_scale)
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    return xla_attention(q, k, v, sm_scale)
