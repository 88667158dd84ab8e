"""Head-packing sweep (fwd) + packed fused backward prototype."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diverse_channel_vit_tpu.compile_cache import enable

enable()

B, N, D, H = 64, 1569, 384, 6
dh = D // H
NP = 1664
MASK_VALUE = -1e30


def bench(f, *args, iters=10):
    r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(iters):
        r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def report(tag, dt, per_layer=12):
    print(f"{tag:<46} {dt*1e3:8.2f} ms  ({dt*1e3/per_layer:.2f} ms/layer)", flush=True)


qf = jax.random.normal(jax.random.key(0), (B * H, NP, dh), jnp.bfloat16)
kf = jax.random.normal(jax.random.key(1), (B * H, NP, dh), jnp.bfloat16)
vf = jax.random.normal(jax.random.key(2), (B * H, NP, dh), jnp.bfloat16)


def make_fwd(hp: int, block_q: int, n_valid: int):
    def kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale):
        q = q_ref[...]
        k = k_ref[...]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * sm_scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < n_valid, s, MASK_VALUE)
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=2, keepdims=True)
        o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[...],
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o_ref[...] = (o / l).astype(o_ref.dtype)

    def run(q, k, v):
        bh = q.shape[0]
        nq = NP // block_q
        return pl.pallas_call(
            functools.partial(kernel, sm_scale=dh**-0.5),
            grid=(bh // hp, nq),
            in_specs=[
                pl.BlockSpec((hp, block_q, dh), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((hp, NP, dh), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((hp, NP, dh), lambda b, qi: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((hp, block_q, dh), lambda b, qi: (b, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, NP, dh), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(q, k, v)

    return run


for hp, bq in ():
    if NP % bq or (B * H) % hp:
        continue
    try:
        runf = make_fwd(hp, bq, N)

        @jax.jit
        def chainf(q, k, v, runf=runf):
            o = q
            for _ in range(12):
                o = runf(o, k, v)
            return o

        report(f"fwd hp={hp} bq={bq}", bench(chainf, qf, kf, vf))
    except Exception as e:
        print(f"fwd hp={hp} bq={bq}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


# ---- packed fused backward -------------------------------------------------
def make_bwd(hp: int, block_q: int, n_valid: int):
    nq = NP // block_q

    def kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
               dq_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, sm_scale):
        qi = pl.program_id(1)

        @pl.when(qi == 0)
        def _init():
            dk_scr[...] = jnp.zeros_like(dk_scr)
            dv_scr[...] = jnp.zeros_like(dv_scr)

        q = q_ref[...]   # (hp, bq, dh)
        k = k_ref[...]   # (hp, n, dh)
        v = v_ref[...]
        do = do_ref[...]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * sm_scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < n_valid, s, MASK_VALUE)
        lse = lse_ref[...].reshape(s.shape[0], s.shape[1])
        di = di_ref[...].reshape(s.shape[0], s.shape[1])
        p = jnp.exp(s - lse[:, :, None])                      # (hp, bq, n)
        dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - di[:, :, None]) * sm_scale
        dsb = ds.astype(q.dtype)
        pb = p.astype(do.dtype)
        dq_ref[...] = jax.lax.dot_general(
            dsb, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_scr[...] += jax.lax.dot_general(
            dsb, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dv_scr[...] += jax.lax.dot_general(
            pb, do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        @pl.when(qi == nq - 1)
        def _store():
            dk_ref[...] = dk_scr[...].astype(dk_ref.dtype)
            dv_ref[...] = dv_scr[...].astype(dv_ref.dtype)

    def run(q, k, v, do, lse, di):
        bh = q.shape[0]
        return pl.pallas_call(
            functools.partial(kernel, sm_scale=dh**-0.5),
            grid=(bh // hp, nq),
            in_specs=[
                pl.BlockSpec((hp, block_q, dh), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((hp, NP, dh), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((hp, NP, dh), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((hp, block_q, dh), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((hp, 1, 1, block_q), lambda b, qi: (b, qi, 0, 0)),
                pl.BlockSpec((hp, 1, 1, block_q), lambda b, qi: (b, qi, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((hp, block_q, dh), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((hp, NP, dh), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((hp, NP, dh), lambda b, qi: (b, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, NP, dh), q.dtype),
                jax.ShapeDtypeStruct((bh, NP, dh), q.dtype),
                jax.ShapeDtypeStruct((bh, NP, dh), q.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((hp, NP, dh), jnp.float32),
                pltpu.VMEM((hp, NP, dh), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(q, k, v, do, lse, di)

    return run


dof = jax.random.normal(jax.random.key(3), (B * H, NP, dh), jnp.bfloat16)

for hp, bq in ((1, 416), (2, 416), (3, 416), (3, 208), (2, 208)):
    if NP % bq:
        continue
    nq = NP // bq
    lse_in = jax.random.normal(jax.random.key(4), (B * H, nq, 1, bq), jnp.float32)
    di_in = lse_in
    try:
        runb = make_bwd(hp, bq, N)

        @jax.jit
        def chainb(q, k, v, do, lse_in, di_in, runb=runb):
            dq = q
            for _ in range(12):
                dq, dk, dv = runb(dq, k, v, do, lse_in, di_in)
            return dq

        report(f"bwd-only hp={hp} bq={bq}", bench(chainb, qf, kf, vf, dof, lse_in, di_in))
    except Exception as e:
        print(f"bwd hp={hp} bq={bq}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
