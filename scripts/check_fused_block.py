"""Interpret-mode correctness check of ops/fused_block vs XLA compositions."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from diverse_channel_vit_tpu.ops import attention as attn_mod

attn_mod.INTERPRET = True

from diverse_channel_vit_tpu.ops.fused_block import (
    _gelu_tanh_f32,
    flash_attention_qkv,
    ln_mlp,
    ln_qkv,
)

B, N, D, H = 2, 256, 128, 2
key = jax.random.key(0)


def ln_ref(x, s, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * s + b).astype(x.dtype)


def rel(a, b):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))


def check(tag, a, b, tol):
    r = rel(a, b)
    status = "OK " if r < tol else "FAIL"
    print(f"{status} {tag}: rel {r:.2e} (tol {tol})")
    return r < tol


ok = True
for dtype, tol in ((jnp.float32, 3e-5), (jnp.bfloat16, 3e-2)):
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, N, D)).astype(dtype)
    s = jax.random.normal(jax.random.fold_in(key, 2), (D,), jnp.float32) * 0.1 + 1.0
    bi = jax.random.normal(jax.random.fold_in(key, 3), (D,), jnp.float32) * 0.1
    w = (jax.random.normal(jax.random.fold_in(key, 4), (D, 3 * D)) * 0.05).astype(dtype)
    wb = (jax.random.normal(jax.random.fold_in(key, 5), (3 * D,)) * 0.05).astype(dtype)

    # --- ln_qkv fwd
    got = ln_qkv(x, s, bi, w, wb)
    y = ln_ref(x, s, bi)
    want = (y @ w).astype(jnp.float32) + wb.astype(jnp.float32)
    ok &= check(f"ln_qkv fwd {dtype.__name__}", got, want.astype(dtype), tol)

    # --- ln_qkv grads
    def f_fused(x, s, bi, w, wb):
        return jnp.sum(ln_qkv(x, s, bi, w, wb).astype(jnp.float32) ** 2)

    def f_ref(x, s, bi, w, wb):
        y = ln_ref(x, s, bi)
        o = ((y @ w).astype(jnp.float32) + wb.astype(jnp.float32)).astype(x.dtype)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4))(x, s, bi, w, wb)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(x, s, bi, w, wb)
    for name, a, b in zip(("dx", "dscale", "dbias", "dw", "dwb"), g1, g2):
        ok &= check(f"ln_qkv {name} {dtype.__name__}", a, b, tol * 10)

    # --- ln_mlp
    w1 = (jax.random.normal(jax.random.fold_in(key, 6), (D, 4 * D)) * 0.05).astype(dtype)
    b1 = (jax.random.normal(jax.random.fold_in(key, 7), (4 * D,)) * 0.05).astype(dtype)
    w2 = (jax.random.normal(jax.random.fold_in(key, 8), (4 * D, D)) * 0.05).astype(dtype)
    b2 = (jax.random.normal(jax.random.fold_in(key, 9), (D,)) * 0.05).astype(dtype)

    for residual in (False, True):
        def m_fused(x, s, bi, w1, b1, w2, b2):
            return jnp.sum(ln_mlp(x, s, bi, w1, b1, w2, b2, residual).astype(jnp.float32) ** 2)

        def m_ref(x, s, bi, w1, b1, w2, b2):
            y = ln_ref(x, s, bi)
            h = _gelu_tanh_f32((y @ w1).astype(jnp.float32) + b1.astype(jnp.float32))
            o = (h.astype(x.dtype) @ w2).astype(jnp.float32) + b2.astype(jnp.float32)
            if residual:
                o = o + x.astype(jnp.float32)
            return jnp.sum(o.astype(x.dtype).astype(jnp.float32) ** 2)

        got = ln_mlp(x, s, bi, w1, b1, w2, b2, residual)
        yh = ln_ref(x, s, bi)
        h = _gelu_tanh_f32((yh @ w1).astype(jnp.float32) + b1.astype(jnp.float32))
        want = (h.astype(x.dtype) @ w2).astype(jnp.float32) + b2.astype(jnp.float32)
        if residual:
            want = want + x.astype(jnp.float32)
        ok &= check(f"ln_mlp fwd res={residual} {dtype.__name__}", got, want.astype(dtype), tol)

        g1 = jax.grad(m_fused, argnums=tuple(range(7)))(x, s, bi, w1, b1, w2, b2)
        g2 = jax.grad(m_ref, argnums=tuple(range(7)))(x, s, bi, w1, b1, w2, b2)
        for name, a, b in zip(("dx", "ds", "db", "dw1", "db1", "dw2", "db2"), g1, g2):
            ok &= check(f"ln_mlp {name} res={residual} {dtype.__name__}", a, b, tol * 10)

    # --- flash_attention_qkv vs xla attention
    qkv = jax.random.normal(jax.random.fold_in(key, 10), (B, N, 3 * D)).astype(dtype)
    valid = N - 7

    def a_fused(qkv):
        return jnp.sum(flash_attention_qkv(qkv, H, valid_len=valid).astype(jnp.float32) ** 2)

    def a_ref(qkv):
        from diverse_channel_vit_tpu.ops.attention import xla_attention

        q, k, v = jnp.split(qkv, 3, axis=-1)
        dh = D // H
        qh, kh, vh = (
            t.reshape(B, N, H, dh).transpose(0, 2, 1, 3) for t in (q, k, v)
        )
        o = xla_attention(qh, kh, vh, dh**-0.5, valid_len=valid)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    got = flash_attention_qkv(qkv, H, valid_len=valid)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    dh = D // H
    qh, kh, vh = (t.reshape(B, N, H, dh).transpose(0, 2, 1, 3) for t in (q, k, v))
    from diverse_channel_vit_tpu.ops.attention import xla_attention

    want = xla_attention(qh, kh, vh, dh**-0.5, valid_len=valid)
    want = want.transpose(0, 2, 1, 3).reshape(B, N, D).astype(dtype)
    ok &= check(f"flash_qkv fwd {dtype.__name__}", got, want, tol)

    g1 = jax.grad(a_fused)(qkv)
    g2 = jax.grad(a_ref)(qkv)
    ok &= check(f"flash_qkv dqkv {dtype.__name__}", g1, g2, tol * 10)

print("ALL OK" if ok else "FAILURES", flush=True)
sys.exit(0 if ok else 1)
