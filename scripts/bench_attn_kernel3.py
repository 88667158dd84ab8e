"""Compare: production kernel vs official jax pallas flash vs 2-head variant."""

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

# ---- official kernel ------------------------------------------------------
try:
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention as official_flash,
    )

    q4 = qf.reshape(B, H, NP, dh)
    k4 = kf.reshape(B, H, NP, dh)
    v4 = vf.reshape(B, H, NP, dh)

    @jax.jit
    def official_chain(q, k, v):
        o = q
        for _ in range(12):
            o = official_flash(o, k, v, sm_scale=dh**-0.5)
        return o

    report("official pallas flash fwd x12", bench(official_chain, q4, k4, v4))

    def official_loss(q, k, v):
        o = q
        for _ in range(12):
            o = official_flash(o, k, v, sm_scale=dh**-0.5)
        return jnp.sum(o.astype(jnp.float32))

    report("official pallas flash fwd+bwd x12",
           bench(jax.jit(jax.grad(official_loss, argnums=(0, 1, 2))), q4, k4, v4))
except Exception as e:
    print(f"official flash failed: {type(e).__name__}: {str(e)[:200]}", flush=True)


# ---- 2-head-per-program variant -------------------------------------------
def make_fwd_2h(block_q: int, n_valid: int):
    def kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale):
        for h in range(2):
            q = q_ref[h]
            k = k_ref[h]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * sm_scale
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, MASK_VALUE)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[h],
                            preferred_element_type=jnp.float32)
            o_ref[h] = (o / l).astype(o_ref.dtype)

    def run(q, k, v):
        bh = q.shape[0]
        nq = NP // block_q
        return pl.pallas_call(
            functools.partial(kernel, sm_scale=dh**-0.5),
            grid=(bh // 2, nq),
            in_specs=[
                pl.BlockSpec((2, block_q, dh), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((2, NP, dh), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((2, NP, dh), lambda b, qi: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((2, block_q, dh), lambda b, qi: (b, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, NP, dh), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * NP * NP * dh,
                bytes_accessed=bh * NP * dh * 2 * 4,
                transcendentals=bh * NP * NP,
            ),
        )(q, k, v)

    return run


for bq in (208, 416):
    run2h = make_fwd_2h(bq, N)

    @jax.jit
    def chain2h(q, k, v, run2h=run2h):
        o = q
        for _ in range(12):
            o = run2h(o, k, v)
        return o

    report(f"2-head fwd x12 bq={bq}", bench(chain2h, qf, kf, vf))


# ---- batched-dot 2-head variant --------------------------------------------
def make_fwd_2h_batched(block_q: int, n_valid: int):
    def kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale):
        q = q_ref[...]  # (2, bq, dh)
        k = k_ref[...]  # (2, n, dh)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)  # (2, bq, n)
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
            grid=(bh // 2, nq),
            in_specs=[
                pl.BlockSpec((2, block_q, dh), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((2, NP, dh), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((2, NP, dh), lambda b, qi: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((2, block_q, dh), lambda b, qi: (b, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, NP, dh), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(q, k, v)

    return run


try:
    runb = make_fwd_2h_batched(416, N)

    @jax.jit
    def chainb(q, k, v):
        o = q
        for _ in range(12):
            o = runb(o, k, v)
        return o

    report("2-head batched-dot fwd x12 bq=416", bench(chainb, qf, kf, vf))
except Exception as e:
    print(f"batched-dot variant failed: {type(e).__name__}: {str(e)[:200]}", flush=True)
