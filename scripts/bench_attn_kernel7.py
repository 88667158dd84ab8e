"""Attention kernel scheduling variants: per-head loop vs staged (all-s,
all-softmax, all-o) issue order, +prescaled q. Hypothesis: staging lets
Mosaic overlap head h's VPU softmax with head h+1's MXU matmul."""

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
L = 12
SM = dh**-0.5
MASK_VALUE = -1e30


def bench(f, *args, iters=10):
    r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(iters):
        r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def report(tag, dt):
    print(f"{tag:<58} {dt*1e3:8.2f} ms ({dt*1e3/L:.2f} ms/layer)", flush=True)


# ------------------------------------------------------------------ forward


def fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, variant, block_q):
    qi = pl.program_id(1)
    heads = range(H)

    def score(h):
        s = jax.lax.dot_general(
            q_ref[0, :, h * dh:(h + 1) * dh], k_ref[0, :, h * dh:(h + 1) * dh],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        s = s * SM
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        return jnp.where(col < N, s, MASK_VALUE)

    def soft(s):
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        return p, jnp.sum(p, axis=1, keepdims=True)

    def pv(h, p, l):
        o = jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0, :, h * dh:(h + 1) * dh],
            preferred_element_type=jnp.float32,
        )
        return (o / l).astype(o_ref.dtype)

    if variant == "loop":  # shipped order
        outs = []
        for h in heads:
            p, l = soft(score(h))
            outs.append(pv(h, p, l))
    elif variant == "staged":
        ss = [score(h) for h in heads]
        pls = [soft(s) for s in ss]
        outs = [pv(h, p, l) for h, (p, l) in zip(heads, pls)]
    elif variant == "pipelined":
        outs = []
        s_next = score(0)
        for h in heads:
            s_cur = s_next
            if h + 1 < H:
                s_next = score(h + 1)
            p, l = soft(s_cur)
            outs.append(pv(h, p, l))
    o_ref[0] = jnp.concatenate(outs, axis=1)


def make_fwd(variant, block_q):
    nq = NP // block_q

    def f(q, k, v):
        return pl.pallas_call(
            functools.partial(fwd_kernel, variant=variant, block_q=block_q),
            grid=(B, nq),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((1, NP, D), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((1, NP, D), lambda b, qi: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, D), lambda b, qi: (b, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((B, NP, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * B * NP * NP * D,
                bytes_accessed=B * NP * D * 2 * 4,
                transcendentals=B * NP * NP * H,
            ),
        )(q, k, v)

    def chain(q, k, v):
        for _ in range(L):
            q = q + f(q, k, v) * 0.01
        return q

    return jax.jit(chain)


# ------------------------------------------------------------------ backward


def bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, dq_ref, dk_ref, dv_ref,
               dk_scr, dv_scr, *, variant, n_q_blocks):
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    def sl(h):
        return slice(h * dh, (h + 1) * dh)

    def score(h):
        s = jax.lax.dot_general(
            q_ref[0, :, sl(h)], k_ref[0, :, sl(h)],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) * SM
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        return jnp.where(col < N, s, MASK_VALUE)

    def soft(s):
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        return p / jnp.sum(p, axis=1, keepdims=True)

    def dpart(h, p):
        doh = do_ref[0, :, sl(h)]
        di = jnp.sum(
            o_ref[0, :, sl(h)].astype(jnp.float32) * doh.astype(jnp.float32),
            axis=1, keepdims=True,
        )
        dp = jax.lax.dot_general(
            doh, v_ref[0, :, sl(h)], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return p * (dp - di) * SM

    def emit(h, p, ds):
        dsb = ds.astype(q_ref.dtype)
        pb = p.astype(q_ref.dtype)
        dq = jax.lax.dot(dsb, k_ref[0, :, sl(h)], preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            dsb, q_ref[0, :, sl(h)], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv = jax.lax.dot_general(
            pb, do_ref[0, :, sl(h)], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dq.astype(dq_ref.dtype), dk, dv

    if variant == "loop":
        dqs, dks, dvs = [], [], []
        for h in range(H):
            p = soft(score(h))
            ds = dpart(h, p)
            dq, dk, dv = emit(h, p, ds)
            dqs.append(dq); dks.append(dk); dvs.append(dv)
    elif variant == "staged":
        ps = [soft(score(h)) for h in range(H)]
        dss = [dpart(h, p) for h, p in enumerate(ps)]
        outs = [emit(h, p, ds) for h, (p, ds) in enumerate(zip(ps, dss))]
        dqs = [o[0] for o in outs]; dks = [o[1] for o in outs]; dvs = [o[2] for o in outs]
    elif variant == "staged2":  # pairs: bound VMEM while allowing overlap
        dqs, dks, dvs = [], [], []
        for h0 in range(0, H, 2):
            pair = [h0, h0 + 1]
            ps = [soft(score(h)) for h in pair]
            dss = [dpart(h, p) for h, p in zip(pair, ps)]
            for h, p, ds in zip(pair, ps, dss):
                dq, dk, dv = emit(h, p, ds)
                dqs.append(dq); dks.append(dk); dvs.append(dv)
    dq_ref[0] = jnp.concatenate(dqs, axis=1)
    dk_scr[...] += jnp.concatenate(dks, axis=1)
    dv_scr[...] += jnp.concatenate(dvs, axis=1)

    @pl.when(qi == n_q_blocks - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def make_bwd(variant, block_q):
    nq = NP // block_q

    def f(q, k, v, do, o):
        return pl.pallas_call(
            functools.partial(bwd_kernel, variant=variant, n_q_blocks=nq),
            grid=(B, nq),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((1, NP, D), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((1, NP, D), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((1, block_q, D), lambda b, qi: (b, qi, 0)),  # do
                pl.BlockSpec((1, block_q, D), lambda b, qi: (b, qi, 0)),  # o
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, qi: (b, qi, 0)),
                pl.BlockSpec((1, NP, D), lambda b, qi: (b, 0, 0)),
                pl.BlockSpec((1, NP, D), lambda b, qi: (b, 0, 0)),
            ],
            out_shape=[jax.ShapeDtypeStruct((B, NP, D), q.dtype)] * 3,
            scratch_shapes=[
                pltpu.VMEM((NP, D), jnp.float32),
                pltpu.VMEM((NP, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=10 * B * NP * NP * D,
                bytes_accessed=B * NP * D * 2 * 6,
                transcendentals=B * NP * NP * H,
            ),
        )(q, k, v, do, o)

    def chain(q, k, v, do, o):
        acc = None
        for _ in range(L):
            dq, dk, dv = f(q, k, v, do, o)
            q = q + dq * 0.01
            acc = dk if acc is None else acc + dk
        return q, acc

    return jax.jit(chain)


def main():
    key = jax.random.key(0)
    mk = lambda i: (jax.random.normal(jax.random.fold_in(key, i), (B, NP, D)) * 0.3).astype(jnp.bfloat16)
    q, k, v, do, o = mk(1), mk(2), mk(3), mk(4), mk(5)

    # correctness cross-check of variants
    f_loop = make_fwd("loop", 416)
    for var, bq in (("staged", 416), ("staged", 208), ("pipelined", 416)):
        f = make_fwd(var, bq)
        if bq == 416:
            d = float(jnp.max(jnp.abs(f(q, k, v).astype(jnp.float32) - f_loop(q, k, v).astype(jnp.float32))))
            assert d == 0.0, d
        report(f"fwd {var} bq={bq}", bench(f, q, k, v))
    report("fwd loop bq=416 (shipped)", bench(f_loop, q, k, v))

    b_loop = make_bwd("loop", 208)
    for var, bq in (("staged", 208), ("staged", 104), ("staged2", 208), ("staged2", 416)):
        f = make_bwd(var, bq)
        if bq == 208:
            r1 = f(q, k, v, do, o)
            r2 = b_loop(q, k, v, do, o)
            d = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))) for a, b in zip(r1, r2))
            assert d == 0.0, d
        report(f"bwd {var} bq={bq}", bench(f, q, k, v, do, o))
    report("bwd loop bq=208 (shipped)", bench(b_loop, q, k, v, do, o))


if __name__ == "__main__":
    main()
