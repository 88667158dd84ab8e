"""Measure int8 vs bf16 GEMM throughput on the real chip.

The v5e MXU has a 2x int8 peak (394 TOPS) over bf16 (197 TFLOPs). If XLA
delivers a real speedup on training-shaped GEMMs, an AQT-style quantized
path for the dense layers is worth building; if not, refute it here.

Chains L GEMMs inside one jit (axon per-dispatch overhead is ~1.2 ms) and
syncs with a host readback.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diverse_channel_vit_tpu import compile_cache

compile_cache.enable()

L = 24


def sync(x):
    return float(jnp.sum(jnp.asarray(x, jnp.float32)))


def bench(fn, args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters / L


def main():
    key = jax.random.PRNGKey(0)
    MN = 64 * 1600
    for (m, k, n) in [(MN, 384, 1536), (MN, 1536, 384), (8192, 4096, 4096)]:
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(key, (k, n), jnp.bfloat16)
        bT = jax.random.normal(key, (n, k), jnp.bfloat16)
        ai = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
        bi = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
        biT = jax.random.randint(key, (n, k), -127, 127, jnp.int8)

        # chain through a cheap elementwise twist so XLA can't CSE the loop;
        # alternate b / bT to keep shapes closed under the chain
        def chain_bf(a, b, bT):
            x = a
            for i in range(L // 2):
                x = jnp.tanh(x @ b) @ bT
            return x

        def chain_i8(a, b, bT):
            x = a
            for i in range(L // 2):
                h = jax.lax.dot(x, b, preferred_element_type=jnp.int32)
                x = jnp.clip(h >> 8, -127, 127).astype(jnp.int8)
                h = jax.lax.dot(x, bT, preferred_element_type=jnp.int32)
                x = jnp.clip(h >> 8, -127, 127).astype(jnp.int8)
            return x

        def chain_aqt(a, b_q, b_scale, bT_q, bT_scale):
            x = a
            for i in range(L // 2):
                for (w_q, w_s) in ((b_q, b_scale), (bT_q, bT_scale)):
                    a_s = jnp.max(jnp.abs(x), axis=1, keepdims=True).astype(jnp.float32) / 127.0
                    a_q = jnp.round(x.astype(jnp.float32) / a_s).astype(jnp.int8)
                    acc = jax.lax.dot(a_q, w_q, preferred_element_type=jnp.int32)
                    x = (acc.astype(jnp.float32) * a_s * w_s).astype(jnp.bfloat16)
                    x = jnp.tanh(x)
            return x

        def quant_w(w, axis):
            s = jnp.max(jnp.abs(w), axis=axis, keepdims=True).astype(jnp.float32) / 127.0
            return jnp.round(w.astype(jnp.float32) / s).astype(jnp.int8), s

        b_q, b_s = quant_w(b, 0)
        bT_q, bT_s = quant_w(bT, 0)

        t_bf = bench(jax.jit(chain_bf), (a, b, bT))
        t_i8 = bench(jax.jit(chain_i8), (ai, bi, biT))
        t_aqt = bench(jax.jit(chain_aqt), (a, b_q, b_s, bT_q, bT_s))
        fl = 2 * m * k * n
        print(f"({m},{k})x({k},{n}): bf16 {t_bf*1e3:7.3f} ms/gemm {fl/t_bf/1e12:6.1f} TF/s | "
              f"int8 {t_i8*1e3:7.3f} ms {fl/t_i8/1e12:6.1f} TOP/s | "
              f"aqt(e2e) {t_aqt*1e3:7.3f} ms {fl/t_aqt/1e12:6.1f} TF/s-eff")


if __name__ == "__main__":
    main()
