"""Ablate the flagship forward pass to find the slow component."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

from diverse_channel_vit_tpu.compile_cache import enable

enable()

from diverse_channel_vit_tpu.ops.attention import flash_attention  # noqa: E402
from diverse_channel_vit_tpu.ops.patch_embed import per_channel_patch_embed  # noqa: E402

B, N, D, H = 64, 1569, 384, 6


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
    print(f"{tag:<28} {dt*1e3:8.2f} ms{extra}", flush=True)


x = jax.random.normal(jax.random.key(0), (B, N, D), jnp.bfloat16)

# 1. bare matmul chain: 12 x (qkv 3D + proj D + mlp 8D) = 12 x 12 D^2 matmuls
w_qkv = jax.random.normal(jax.random.key(1), (D, 3 * D), jnp.bfloat16) * 0.02
w_proj = jax.random.normal(jax.random.key(2), (D, D), jnp.bfloat16) * 0.02
w_up = jax.random.normal(jax.random.key(3), (D, 4 * D), jnp.bfloat16) * 0.02
w_dn = jax.random.normal(jax.random.key(4), (4 * D, D), jnp.bfloat16) * 0.02


@jax.jit
def dense_stack(x):
    for _ in range(12):
        y = x @ w_qkv
        x = x + y[..., :D] @ w_proj
        x = x + jax.nn.gelu(x @ w_up, approximate=False) @ w_dn
    return x


flops = B * N * 12 * 2 * (D * 3 * D + D * D + 2 * D * 4 * D)
report("dense stack (12 blocks)", bench(dense_stack, x), flops)


@jax.jit
def dense_stack_ln(x):
    for _ in range(12):
        xn = x.astype(jnp.float32)
        mu = xn.mean(-1, keepdims=True)
        var = xn.var(-1, keepdims=True)
        xn = ((xn - mu) * jax.lax.rsqrt(var + 1e-6)).astype(jnp.bfloat16)
        y = xn @ w_qkv
        x = x + y[..., :D] @ w_proj
        xn2 = x.astype(jnp.float32)
        xn2 = ((xn2 - xn2.mean(-1, keepdims=True)) * jax.lax.rsqrt(xn2.var(-1, keepdims=True) + 1e-6)).astype(jnp.bfloat16)
        x = x + jax.nn.gelu(xn2 @ w_up, approximate=False) @ w_dn
    return x


report("dense stack + f32 LN", bench(dense_stack_ln, x), flops)

# 2. attention only, 12x
q = jax.random.normal(jax.random.key(5), (B, H, N, D // H), jnp.bfloat16)


@jax.jit
def attn12(q):
    o = q
    for _ in range(12):
        o = flash_attention(o, o, o)
    return o


report("flash attention x12", bench(attn12, q), 12 * 4 * B * H * N * N * (D // H))

# 3. patch embed
img = jax.random.normal(jax.random.key(6), (B, 8, 224, 224), jnp.bfloat16)
kern = jax.random.normal(jax.random.key(7), (256, D), jnp.bfloat16) * 0.02


@jax.jit
def pembed(img):
    return per_channel_patch_embed(img, kern, None, patch_size=16)


report("per-channel patch embed", bench(pembed, img), 2 * B * 8 * 196 * 256 * D)

# 4. f32 input conversion cost: img comes in f32 from the loader
img32 = img.astype(jnp.float32)


@jax.jit
def pembed32(img32):
    return per_channel_patch_embed(img32.astype(jnp.bfloat16), kern, None, patch_size=16)


report("patch embed + f32->bf16", bench(pembed32, img32))

# 5. full eval fwd reference point
from __graft_entry__ import _build_flagship  # noqa: E402

model = _build_flagship(224, 16, 12, 384, 6, 8, 161, jnp.bfloat16)
cids = jnp.arange(8)
params = jax.jit(lambda r1, r2: model.init({"params": r1, "dropout": r2}, img32[:2], cids, train=False)["params"])(jax.random.key(8), jax.random.key(9))
fwd = jax.jit(lambda p, xx: model.apply({"params": p}, xx, cids, train=False)[0])
report("full model fwd", bench(fwd, params, img32))
