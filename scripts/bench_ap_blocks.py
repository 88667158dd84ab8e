"""Block-size sweep for the attend_project fwd/bwd kernels (12x chains)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diverse_channel_vit_tpu.compile_cache import enable

enable()

from diverse_channel_vit_tpu.ops import attention as attn
from diverse_channel_vit_tpu.ops import fused_block as fb

import os as _os
B = int(_os.environ.get('BATCH', 64))
N = int(_os.environ.get('SEQ', 1569))
D, H = 384, int(_os.environ.get('HEADS', 6))
NP = -(-N // 128) * 128
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


def main():
    key = jax.random.key(0)
    mk = lambda i, shape: (jax.random.normal(jax.random.fold_in(key, i), shape) * 0.1).astype(jnp.bfloat16)
    y = mk(1, (B, NP, D))
    x = mk(2, (B, NP, D))
    w = mk(3, (D, 3 * D))
    b = jnp.zeros((3 * D,), jnp.bfloat16)
    wp = mk(4, (D, D))
    bp = jnp.zeros((D,), jnp.bfloat16)

    def chain_fwd(bq_fwd):
        def f(y, x):
            for _ in range(L):
                qkv = fb._project(y, w, b)
                _, xo = fb._ap_fwd_impl(qkv, x, wp, bp, H, SM, N, bq_fwd, True)
                x2 = xo
                y = y + x2 * 0.01
                x = x2
            return y
        return jax.jit(f)

    fwd_bqs = sorted({b for b in (152, 208, 304, 416, 608, 832) if NP % b == 0})
    for bq in fwd_bqs:
        print(f"fwd bq={bq}: {bench(chain_fwd(bq), y, x)*1e3/L:.2f} ms/layer", flush=True)

    def chain_bwd(bq_bwd):
        orig = attn._pick_block_q

        def f(y, x, dxo):
            qkv = fb._project(y, w, b)
            o, _ = fb._ap_fwd_impl(qkv, x, wp, bp, H, SM, N, 416, True)
            acc = None
            for _ in range(L):
                outs = fb._ap_bwd_impl(qkv, o, wp, dxo, H, SM, N)
                g = outs[0]
                acc = g if acc is None else acc + g
                dxo = dxo + g * 0.01
            return acc
        return jax.jit(f)

    dxo = mk(5, (B, NP, D))
    bwd_bqs = sorted({b for b in (76, 104, 128, 152, 208, 304, 416) if NP % b == 0 and b % 8 == 0})
    for bq in bwd_bqs:
        attn_orig = attn._pick_block_q
        attn._pick_block_q = lambda n, hp=1, budget=0, _bq=bq: _bq
        try:
            t = bench(chain_bwd(bq), y, x, dxo)
        finally:
            attn._pick_block_q = attn_orig
        print(f"bwd bq={bq}: {t*1e3/L:.2f} ms/layer", flush=True)


if __name__ == "__main__":
    main()
