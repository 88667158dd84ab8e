"""Prototype: int8-quantized ln_mlp forward kernel vs the shipped bf16 one.

Quantization happens INSIDE the kernel (VMEM-resident), so unlike the XLA
AQT pattern (refuted for D=384 in bench_int8.py — the HBM quant passes eat
the entire 2.1x int8 MXU gain) the quant cost here is pure VPU work
overlapped with the MXU.

Scheme: per-row dynamic absmax for activations, per-column static absmax
for weights (pre-quantized outside), int32 accumulation, f32 rescale.
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

from diverse_channel_vit_tpu import compile_cache
from diverse_channel_vit_tpu.ops import fused_block as fb

compile_cache.enable()

L = 12
B, N, D, HID = 64, 1600, 384, 1536


def _quant_rows(x):
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.round(x / s).astype(jnp.int8)
    return q, s


def _int8_kernel(x_ref, s_ref, b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                 b2_ref, o_ref, *, residual):
    xf = x_ref[0].astype(jnp.float32)
    y, _, _ = fb._ln_f32(xf, s_ref[...], b_ref[...])
    yq, ys = _quant_rows(y)
    acc = jax.lax.dot(yq, w1_ref[...], preferred_element_type=jnp.int32)
    h_pre = acc.astype(jnp.float32) * ys * s1_ref[...] + b1_ref[...].astype(jnp.float32)
    h = fb._gelu_tanh_f32(h_pre)
    hq, hs = _quant_rows(h)
    acc2 = jax.lax.dot(hq, w2_ref[...], preferred_element_type=jnp.int32)
    out = acc2.astype(jnp.float32) * hs * s2_ref[...] + b2_ref[...].astype(jnp.float32)
    if residual:
        out = out + xf
    o_ref[0] = out.astype(o_ref.dtype)


def int8_ln_mlp(x, scale, bias, w1q, s1, b1, w2q, s2, b2, residual=True):
    b, n, d = x.shape
    bm = fb._pick_bm(n, 832)
    return pl.pallas_call(
        functools.partial(_int8_kernel, residual=residual),
        grid=(b, n // bm),
        in_specs=[
            pl.BlockSpec((1, bm, d), lambda b_, i: (b_, i, 0)),
            fb._full_spec(scale.shape), fb._full_spec(bias.shape),
            fb._full_spec(w1q.shape), fb._full_spec(s1.shape),
            fb._full_spec(b1.shape),
            fb._full_spec(w2q.shape), fb._full_spec(s2.shape),
            fb._full_spec(b2.shape),
        ],
        out_specs=pl.BlockSpec((1, bm, d), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=fb._interpret(),
    )(x, scale, bias, w1q, s1, b1, w2q, s2, b2)


def quant_w(w):
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True) / 127.0
    return jnp.round(w.astype(jnp.float32) / s).astype(jnp.int8), s


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
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, N, D), jnp.bfloat16)
    scale = jnp.ones((D,), jnp.float32)
    bias = jnp.zeros((D,), jnp.float32)
    w1 = jax.random.normal(k, (D, HID), jnp.bfloat16) * 0.05
    b1 = jnp.zeros((HID,), jnp.bfloat16)
    w2 = jax.random.normal(k, (HID, D), jnp.bfloat16) * 0.05
    b2 = jnp.zeros((D,), jnp.bfloat16)
    w1q, s1 = quant_w(w1)
    w2q, s2 = quant_w(w2)

    def chain_bf(x):
        for _ in range(L):
            x = fb._ln_mlp_fwd_impl(x, scale, bias, w1, b1, w2, b2, True)
        return x

    def chain_i8(x):
        for _ in range(L):
            x = int8_ln_mlp(x, scale, bias, w1q, s1, b1, w2q, s2, b2, True)
        return x

    f_bf = jax.jit(chain_bf)
    f_i8 = jax.jit(chain_i8)

    # numerics sanity on one layer
    o_bf = fb._ln_mlp_fwd_impl(x, scale, bias, w1, b1, w2, b2, True)
    o_i8 = int8_ln_mlp(x, scale, bias, w1q, s1, b1, w2q, s2, b2, True)
    err = float(jnp.max(jnp.abs(o_bf.astype(jnp.float32) - o_i8.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(o_bf.astype(jnp.float32))))
    print(f"one-layer max abs err bf16-vs-int8: {err:.4f} (rel {rel:.4f})")

    t_bf = bench(f_bf, (x,))
    t_i8 = bench(f_i8, (x,))
    fl = 4 * B * N * D * HID
    print(f"bf16 ln_mlp fwd: {t_bf*1e3:6.3f} ms/layer  {fl/t_bf/1e12:6.1f} TF/s-eff")
    print(f"int8 ln_mlp fwd: {t_i8*1e3:6.3f} ms/layer  {fl/t_i8/1e12:6.1f} TF/s-eff")
    print(f"speedup: {t_bf/t_i8:.2f}x")


if __name__ == "__main__":
    main()
