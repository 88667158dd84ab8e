"""Prototype: attention kernel consuming (B, N, H*dh) lane-packed q/k/v
(the qkv projection's natural output layout) with in-kernel per-head lane
slices — if this compiles and runs near the (B*H, N, dh) kernel's speed,
the ~48 ms/step of XLA layout copies around the pallas calls disappear."""

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
    print(f"{tag:<52} {dt*1e3:8.2f} ms  ({dt*1e3/per_layer:.2f} ms/layer)", flush=True)


def make_fwd_packed(block_q: int, n_valid: int):
    def kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale):
        q = q_ref[0]  # (bq, H*dh)
        k = k_ref[0]  # (n, H*dh)
        v = v_ref[0]
        outs = []
        for h in range(H):
            qh = q[:, h * dh:(h + 1) * dh]
            kh = k[:, h * dh:(h + 1) * dh]
            vh = v[:, h * dh:(h + 1) * dh]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * sm_scale
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, MASK_VALUE)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot(p.astype(vh.dtype), vh, preferred_element_type=jnp.float32)
            outs.append((o / l).astype(o_ref.dtype))
        o_ref[0] = jnp.concatenate(outs, axis=1)

    def run(q, k, v):
        b = q.shape[0]
        nq = NP // block_q
        return pl.pallas_call(
            functools.partial(kernel, sm_scale=dh**-0.5),
            grid=(b, nq),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda b_, qi: (b_, qi, 0)),
                pl.BlockSpec((1, NP, D), lambda b_, qi: (b_, 0, 0)),
                pl.BlockSpec((1, NP, D), lambda b_, qi: (b_, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, D), lambda b_, qi: (b_, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((b, NP, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * H * NP * NP * dh,
                bytes_accessed=b * NP * D * 2 * 4,
                transcendentals=b * H * NP * NP,
            ),
        )(q, k, v)

    return run


qp = jax.random.normal(jax.random.key(0), (B, NP, D), jnp.bfloat16)
kp = jax.random.normal(jax.random.key(1), (B, NP, D), jnp.bfloat16)
vp = jax.random.normal(jax.random.key(2), (B, NP, D), jnp.bfloat16)

for bq in (208, 416):
    try:
        runp = make_fwd_packed(bq, N)

        @jax.jit
        def chainp(q, k, v, runp=runp):
            o = q
            for _ in range(12):
                o = runp(o, k, v)
            return o

        report(f"lane-packed fwd bq={bq}", bench(chainp, qp, kp, vp))
    except Exception as e:
        print(f"lane-packed fwd bq={bq}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

# correctness vs the production kernel
from diverse_channel_vit_tpu.ops import attention as A  # noqa: E402

try:
    runp = make_fwd_packed(416, N)
    o_packed = jax.jit(lambda q, k, v: runp(q, k, v))(qp, kp, vp)
    q4 = qp.reshape(B, NP, H, dh).transpose(0, 2, 1, 3).reshape(B * H, NP, dh)
    k4 = kp.reshape(B, NP, H, dh).transpose(0, 2, 1, 3).reshape(B * H, NP, dh)
    v4 = vp.reshape(B, NP, H, dh).transpose(0, 2, 1, 3).reshape(B * H, NP, dh)
    o_ref = jax.jit(lambda q, k, v: A._flash(q, k, v, dh**-0.5, N, 416))(q4, k4, v4)
    o_ref = o_ref.reshape(B, H, NP, dh).transpose(0, 2, 1, 3).reshape(B, NP, D)
    err = float(jnp.max(jnp.abs(o_packed.astype(jnp.float32) - o_ref.astype(jnp.float32))))
    print(f"max err vs production kernel: {err}", flush=True)
except Exception as e:
    print(f"correctness check failed: {type(e).__name__}: {str(e)[:200]}", flush=True)
