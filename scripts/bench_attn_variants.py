"""Measure attention-kernel variants on the real TPU (round-2 perf work).

Answers, with measurements:
1. What do the per-layer (B,N,H,dh)<->(B*H,N,dh) transposes cost?
2. Does a larger block_q (fewer programs, bigger VMEM score block) help?
3. fwd vs fwd+bwd cost of the kernel itself.
4. f32 vs bf16 LayerNorm.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diverse_channel_vit_tpu.compile_cache import enable

enable()

from diverse_channel_vit_tpu.ops import attention as A  # noqa: E402

B, N, D, H = 64, 1569, 384, 6
dh = D // H
NP = A.preferred_pad(N)  # 1664
print(f"padded N = {NP}", flush=True)


def bench(f, *args, iters=10):
    r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(iters):
        r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def report(tag, dt, flops=None):
    extra = f" ({flops/dt/1e12:.0f} TF/s)" if flops else ""
    print(f"{tag:<42} {dt*1e3:8.2f} ms{extra}", flush=True)


key = jax.random.key(0)
qf = jax.random.normal(key, (B * H, NP, dh), jnp.bfloat16)
kf = jax.random.normal(jax.random.key(1), (B * H, NP, dh), jnp.bfloat16)
vf = jax.random.normal(jax.random.key(2), (B * H, NP, dh), jnp.bfloat16)

FWD_FLOPS = 4 * B * H * NP * NP * dh

# --- 1. kernel alone at several block sizes -------------------------------
for bq in (128, 208, 416, 832):
    if NP % bq:
        continue
    f = jax.jit(lambda q, k, v, bq=bq: A._flash(q, k, v, dh**-0.5, N, bq))
    try:
        report(f"kernel fwd block_q={bq}", bench(f, qf, kf, vf), FWD_FLOPS)
    except Exception as e:  # VMEM overflow etc.
        print(f"kernel fwd block_q={bq}: FAILED {type(e).__name__}: {str(e)[:120]}")

# --- 2. fwd+bwd ------------------------------------------------------------
for bq in (208, 416, 832):
    if NP % bq:
        continue
    def loss(q, k, v, bq=bq):
        return jnp.sum(A._flash(q, k, v, dh**-0.5, N, bq).astype(jnp.float32))
    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    try:
        report(f"kernel fwd+bwd block_q={bq}", bench(g, qf, kf, vf), 3 * FWD_FLOPS)
    except Exception as e:
        print(f"kernel fwd+bwd block_q={bq}: FAILED {type(e).__name__}: {str(e)[:120]}")

# --- 3. transposes around the kernel ---------------------------------------
q4 = jax.random.normal(jax.random.key(3), (B, NP, H, dh), jnp.bfloat16)
k4 = jax.random.normal(jax.random.key(4), (B, NP, H, dh), jnp.bfloat16)
v4 = jax.random.normal(jax.random.key(5), (B, NP, H, dh), jnp.bfloat16)


@jax.jit
def with_transposes(q, k, v):
    return A.flash_attention_bnhd(q, k, v, valid_len=N)


report("bnhd wrapper (transposes + kernel) fwd", bench(with_transposes, q4, k4, v4), FWD_FLOPS)


@jax.jit
def transposes_only(q, k, v):
    o = [t.transpose(0, 2, 1, 3).reshape(B * H, NP, dh) for t in (q, k, v)]
    return o[0] + o[1] + o[2]


report("3x transpose only", bench(transposes_only, q4, k4, v4))


def bnhd_loss(q, k, v):
    return jnp.sum(A.flash_attention_bnhd(q, k, v, valid_len=N).astype(jnp.float32))


report("bnhd wrapper fwd+bwd", bench(jax.jit(jax.grad(bnhd_loss, argnums=(0, 1, 2))), q4, k4, v4), 3 * FWD_FLOPS)

# --- 4. LayerNorm f32 vs bf16 ----------------------------------------------
x = jax.random.normal(jax.random.key(6), (B, NP, D), jnp.bfloat16)
g_ln = jnp.ones((D,), jnp.float32)
b_ln = jnp.zeros((D,), jnp.float32)


@jax.jit
def ln_f32(x):
    y = x
    for _ in range(24):
        xn = y.astype(jnp.float32)
        mu = xn.mean(-1, keepdims=True)
        var = xn.var(-1, keepdims=True)
        y = (((xn - mu) * jax.lax.rsqrt(var + 1e-6)) * g_ln + b_ln).astype(jnp.bfloat16)
    return y


@jax.jit
def ln_bf16(x):
    y = x
    for _ in range(24):
        mu = y.mean(-1, keepdims=True)
        var = ((y - mu) ** 2).mean(-1, keepdims=True)
        y = ((y - mu) * jax.lax.rsqrt(var + 1e-6)) * g_ln.astype(jnp.bfloat16) + b_ln.astype(jnp.bfloat16)
    return y


report("24x LayerNorm f32 (fwd)", bench(ln_f32, x))
report("24x LayerNorm bf16 (fwd)", bench(ln_bf16, x))

# --- 5. qkv projection: reshape+transpose vs direct einsum -----------------
w_qkv = jax.random.normal(jax.random.key(7), (D, 3, H, dh), jnp.bfloat16) * 0.02


@jax.jit
def qkv_reshape_transpose(x):
    y = x @ w_qkv.reshape(D, 3 * D)  # (B, NP, 3D)
    y = y.reshape(B, NP, 3, H, dh)
    q, k, v = [y[:, :, i].transpose(0, 2, 1, 3).reshape(B * H, NP, dh) for i in range(3)]
    return q + k + v


@jax.jit
def qkv_direct_einsum(x):
    y = jnp.einsum("bnd,dthe->tbhne", x, w_qkv)  # (3, B, H, NP, dh)
    q, k, v = y.reshape(3, B * H, NP, dh)
    return q + k + v


qkv_flops = 2 * B * NP * D * 3 * D
report("qkv proj: matmul+reshape+transpose", bench(qkv_reshape_transpose, x), qkv_flops)
report("qkv proj: direct einsum -> (3,BH,N,dh)", bench(qkv_direct_einsum, x), qkv_flops)
