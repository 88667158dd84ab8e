"""Per-op fwd+bwd timing: fused kernels vs XLA compositions (12x chains)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diverse_channel_vit_tpu.compile_cache import enable

enable()

from diverse_channel_vit_tpu.ops.fused_block import (
    _gelu_tanh_f32,
    flash_attention_qkv,
    ln_mlp,
    ln_qkv,
)
from diverse_channel_vit_tpu.ops.attention import flash_attention_packed

B, N, D, H = 64, 1569, 384, 6
NP = 1664
L = 12
SM = (D // H) ** -0.5


def bench(f, *args, iters=8):
    r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(iters):
        r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def report(tag, dt):
    print(f"{tag:<52} {dt*1e3:8.2f} ms ({dt*1e3/L:.2f} ms/layer)", flush=True)


def ln_ref(x, s, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * s + b).astype(x.dtype)


def main():
    key = jax.random.key(0)
    x = (jax.random.normal(jax.random.fold_in(key, 1), (B, NP, D)) * 0.5).astype(jnp.bfloat16)
    s = jnp.ones((D,), jnp.float32)
    bi = jnp.zeros((D,), jnp.float32)
    w = (jax.random.normal(jax.random.fold_in(key, 2), (D, 3 * D)) * 0.02).astype(jnp.bfloat16)
    wb = jnp.zeros((3 * D,), jnp.bfloat16)
    w1 = (jax.random.normal(jax.random.fold_in(key, 3), (D, 4 * D)) * 0.02).astype(jnp.bfloat16)
    b1 = jnp.zeros((4 * D,), jnp.bfloat16)
    w2 = (jax.random.normal(jax.random.fold_in(key, 4), (4 * D, D)) * 0.02).astype(jnp.bfloat16)
    b2 = jnp.zeros((D,), jnp.bfloat16)

    # ---- ln_qkv: fused vs XLA (LN + one fused GEMM; weight-major chain)
    def chain_lnqkv_fused(x, w):
        acc = jnp.float32(0)
        for _ in range(L):
            o = ln_qkv(x, s, bi, w, wb)
            acc += jnp.sum(o.astype(jnp.float32))
            x = x + o[..., :D]  # keep chain realistic, feed back
        return acc

    def chain_lnqkv_xla(x, w):
        acc = jnp.float32(0)
        for _ in range(L):
            y = ln_ref(x, s, bi)
            o = (y @ w + wb).astype(x.dtype)
            acc += jnp.sum(o.astype(jnp.float32))
            x = x + o[..., :D]
        return acc

    for tag, fn in (("ln_qkv fused", chain_lnqkv_fused), ("ln_qkv xla", chain_lnqkv_xla)):
        report(tag + " fwd", bench(jax.jit(fn), x, w))
        report(tag + " f+b", bench(jax.jit(jax.grad(fn, argnums=(0, 1))), x, w))

    # ---- ln_mlp: fused vs XLA
    def chain_lnmlp_fused(x, w1, w2):
        for _ in range(L):
            x = ln_mlp(x, s, bi, w1, b1, w2, b2, True)
        return jnp.sum(x.astype(jnp.float32))

    def chain_lnmlp_xla(x, w1, w2):
        for _ in range(L):
            y = ln_ref(x, s, bi)
            h = _gelu_tanh_f32((y @ w1).astype(jnp.float32) + b1.astype(jnp.float32))
            x = x + (h.astype(x.dtype) @ w2 + b2)
        return jnp.sum(x.astype(jnp.float32))

    for tag, fn in (("ln_mlp fused", chain_lnmlp_fused), ("ln_mlp xla", chain_lnmlp_xla)):
        report(tag + " fwd", bench(jax.jit(fn), x, w1, w2))
        report(tag + " f+b", bench(jax.jit(jax.grad(fn, argnums=(0, 1, 2))), x, w1, w2))

    # ---- flash qkv (packed single array) vs 3-array packed kernel
    qkv = jax.random.normal(jax.random.fold_in(key, 5), (B, NP, 3 * D)).astype(jnp.bfloat16)

    def chain_qkv(qkv):
        o = qkv
        for _ in range(L):
            att = flash_attention_qkv(o, H, SM, valid_len=N)
            o = o + jnp.concatenate([att, att, att], axis=-1) * 0.01
        return jnp.sum(o.astype(jnp.float32))

    def chain_3arr(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        acc = jnp.float32(0)
        for _ in range(L):
            att = flash_attention_packed(q, k, v, H, SM, valid_len=N)
            q = q + att * 0.01
            acc += jnp.sum(att.astype(jnp.float32))
        return acc

    for tag, fn in (("flash_qkv packed1", chain_qkv), ("flash 3-array", chain_3arr)):
        report(tag + " fwd", bench(jax.jit(fn), qkv))
        report(tag + " f+b", bench(jax.jit(jax.grad(fn)), qkv))


if __name__ == "__main__":
    main()
