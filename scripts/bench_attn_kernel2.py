"""Kernel-internals ablation: what limits the flash kernel on v5e?

All variants run as a 12-layer chained loop inside ONE jit — single-call
timings over the axon tunnel carry ~3 ms dispatch overhead and mislead.
"""

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

import numpy as np  # noqa: E402

B, N, D, H = 64, 1569, 384, 6
dh = D // H
NP = 1664
MASK_VALUE = -1e30
LOG2E = 1.4426950408889634


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


def make_fwd(variant: str, block_q: int, n_valid: int):
    def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, sm_scale):
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if variant in ("exp2", "masktile"):
            s = s * (sm_scale * LOG2E)
        else:
            s = s * sm_scale
        if variant == "masktile":
            # only the last 128-col tile contains padded columns
            tail = s[:, NP - 128:]
            col = jax.lax.broadcasted_iota(jnp.int32, tail.shape, 1) + (NP - 128)
            tail = jnp.where(col < n_valid, tail, MASK_VALUE)
            s = jnp.concatenate([s[:, : NP - 128], tail], axis=1)
        elif variant not in ("nomask", "noexp"):
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        if variant == "noexp":
            p = s - m
        elif variant in ("exp2", "masktile"):
            p = jnp.exp2(s - m)
        else:
            p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0],
                        preferred_element_type=jnp.float32)
        o_ref[0] = (o / l).astype(o_ref.dtype)
        lse_ref[0, 0] = (m + jnp.log(l))[:, 0][None, :]

    def run(q, k, v):
        bh = q.shape[0]
        nq = NP // block_q
        o, _ = pl.pallas_call(
            functools.partial(kernel, sm_scale=dh**-0.5),
            grid=(bh, nq),
            in_specs=[
                pl.BlockSpec((1, block_q, dh), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((1, NP, dh), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((1, NP, dh), lambda b, qi: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, dh), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((1, 1, 1, block_q), lambda b, qi: (b, qi, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, NP, dh), q.dtype),
                jax.ShapeDtypeStruct((bh, nq, 1, block_q), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * bh * NP * NP * dh,
                bytes_accessed=bh * NP * dh * 2 * 4,
                transcendentals=bh * NP * NP,
            ),
        )(q, k, v)
        return o

    return run


qf = jax.random.normal(jax.random.key(0), (B * H, NP, dh), jnp.bfloat16)
kf = jax.random.normal(jax.random.key(1), (B * H, NP, dh), jnp.bfloat16)
vf = jax.random.normal(jax.random.key(2), (B * H, NP, dh), jnp.bfloat16)

for variant in ("base", "exp2", "masktile", "nomask", "noexp"):
    for bq in (416,):
        run1 = make_fwd(variant, bq, N)

        @jax.jit
        def chain(q, k, v, run1=run1):
            o = q
            for _ in range(12):
                o = run1(o, k, v)
            return o

        report(f"fwd x12 {variant} bq={bq}", bench(chain, qf, kf, vf))

# current production kernel as the baseline (includes custom vjp plumbing)
from diverse_channel_vit_tpu.ops import attention as A  # noqa: E402


@jax.jit
def prod_chain(q, k, v):
    o = q
    for _ in range(12):
        o = A._flash(o, k, v, dh**-0.5, N, 416)
    return o


report("fwd x12 production", bench(prod_chain, qf, kf, vf))


def prod_loss(q, k, v):
    o = q
    for _ in range(12):
        o = A._flash(o, k, v, dh**-0.5, N, 416)
    return jnp.sum(o.astype(jnp.float32))


report("fwd+bwd x12 production", bench(jax.jit(jax.grad(prod_loss, argnums=(0, 1, 2))), qf, kf, vf))

# raw VPU passes at the score-matrix volume, for the roofline
big = jax.random.normal(jax.random.key(3), (B * H // 4, NP, NP), jnp.float32)


@jax.jit
def just_exp(x):
    return jnp.exp(x)


@jax.jit
def just_exp2(x):
    return jnp.exp2(x)


@jax.jit
def just_add(x):
    return x + 1.0


t = bench(just_exp, big)
print(f"exp  f32 {big.size/1e9:.2f}G elems: {t*1e3:.2f} ms -> {big.size/t/1e9:.0f} Gexp/s", flush=True)
t = bench(just_exp2, big)
print(f"exp2 f32 {big.size/1e9:.2f}G elems: {t*1e3:.2f} ms -> {big.size/t/1e9:.0f} Gexp2/s", flush=True)
t = bench(just_add, big)
print(f"add  f32 {big.size/1e9:.2f}G elems: {t*1e3:.2f} ms -> {big.size/t/1e9:.0f} Gadd/s", flush=True)
