"""Packed-bwd VPU-trimming variants + MLP gelu cost probe."""

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
    print(f"{tag:<52} {dt*1e3:8.2f} ms  ({dt*1e3/per_layer:.2f} ms/layer)", flush=True)


def make_bwd(variant: str, block_q: int, n_valid: int):
    nq = NP // block_q

    def kernel(q_ref, k_ref, v_ref, do_ref, o_ref,
               dq_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, sm_scale):
        qi = pl.program_id(1)

        @pl.when(qi == 0)
        def _init():
            dk_scr[...] = jnp.zeros_like(dk_scr)
            dv_scr[...] = jnp.zeros_like(dv_scr)

        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        o = o_ref[0]
        dqs, dks, dvs = [], [], []
        for h in range(H):
            sl = slice(h * dh, (h + 1) * dh)
            qh, kh, vh, doh = q[:, sl], k[:, sl], v[:, sl], do[:, sl]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if variant == "exp2_masktile":
                s = s * (sm_scale * LOG2E)
                tail = s[:, NP - 128:]
                col = jax.lax.broadcasted_iota(jnp.int32, tail.shape, 1) + (NP - 128)
                tail = jnp.where(col < n_valid, tail, MASK_VALUE)
                s = jnp.concatenate([s[:, : NP - 128], tail], axis=1)
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp2(s - m)
            else:
                s = s * sm_scale
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < n_valid, s, MASK_VALUE)
                m = jnp.max(s, axis=1, keepdims=True)
                p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            di = jnp.sum(o[:, sl].astype(jnp.float32) * doh.astype(jnp.float32),
                         axis=1, keepdims=True)
            dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - di) * sm_scale
            dsb = ds.astype(kh.dtype)
            pb = p.astype(doh.dtype)
            dqs.append(jax.lax.dot(dsb, kh, preferred_element_type=jnp.float32)
                       .astype(dq_ref.dtype))
            dks.append(jax.lax.dot_general(dsb, qh, (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32))
            dvs.append(jax.lax.dot_general(pb, doh, (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32))
        dq_ref[0] = jnp.concatenate(dqs, axis=1)
        dk_scr[...] += jnp.concatenate(dks, axis=1)
        dv_scr[...] += jnp.concatenate(dvs, axis=1)

        @pl.when(qi == nq - 1)
        def _store():
            dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
            dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)

    def run(q, k, v, do, o):
        b = q.shape[0]
        return pl.pallas_call(
            functools.partial(kernel, sm_scale=dh**-0.5),
            grid=(b, nq),
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda b_, qi: (b_, qi, 0)),
                pl.BlockSpec((1, NP, D), lambda b_, qi: (b_, 0, 0)),
                pl.BlockSpec((1, NP, D), lambda b_, qi: (b_, 0, 0)),
                pl.BlockSpec((1, block_q, D), lambda b_, qi: (b_, qi, 0)),
                pl.BlockSpec((1, block_q, D), lambda b_, qi: (b_, qi, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, D), lambda b_, qi: (b_, qi, 0)),
                pl.BlockSpec((1, NP, D), lambda b_, qi: (b_, 0, 0)),
                pl.BlockSpec((1, NP, D), lambda b_, qi: (b_, 0, 0)),
            ],
            out_shape=[jax.ShapeDtypeStruct((b, NP, D), q.dtype)] * 3,
            scratch_shapes=[pltpu.VMEM((NP, D), jnp.float32),
                            pltpu.VMEM((NP, D), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(q, k, v, do, o)

    return run


qf = jax.random.normal(jax.random.key(0), (B, NP, D), jnp.bfloat16)
do = jax.random.normal(jax.random.key(1), (B, NP, D), jnp.bfloat16)

for variant in ("base", "exp2_masktile"):
    runb = make_bwd(variant, 208, N)

    @jax.jit
    def chainb(q, do, runb=runb):
        dq = q
        for _ in range(12):
            dq, dk, dv = runb(dq, q, q, do, do)
        return dq

    report(f"packed bwd {variant}", bench(chainb, qf, do))

# ---- MLP gelu cost ----------------------------------------------------------
x = jax.random.normal(jax.random.key(2), (B, NP, D), jnp.bfloat16)
w1 = jax.random.normal(jax.random.key(3), (D, 4 * D), jnp.bfloat16) * 0.02
w2 = jax.random.normal(jax.random.key(4), (4 * D, D), jnp.bfloat16) * 0.02


def mk_mlp(approx):
    @jax.jit
    def mlp12(x):
        y = x
        for _ in range(12):
            y = jax.nn.gelu(y @ w1, approximate=approx) @ w2 + y
        return y
    return mlp12


report("mlp fwd x12 gelu exact", bench(mk_mlp(False), x))
report("mlp fwd x12 gelu tanh", bench(mk_mlp(True), x))


@jax.jit
def mlp12_nogelu(x):
    y = x
    for _ in range(12):
        y = (y @ w1) @ w2 + y
    return y


report("mlp fwd x12 no gelu", bench(mlp12_nogelu, x))
