"""ln_mlp row-block (bm) sweep on the TPU (12x chains, fwd and fwd+bwd)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diverse_channel_vit_tpu.compile_cache import enable

enable()

from diverse_channel_vit_tpu.ops import fused_block as fb

B, N, D = 64, 1664, 384
L = 12


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
    x = (jax.random.normal(jax.random.fold_in(key, 1), (B, N, D)) * 0.5).astype(jnp.bfloat16)
    s = jnp.ones((D,), jnp.float32)
    bi = jnp.zeros((D,), jnp.float32)
    w1 = (jax.random.normal(jax.random.fold_in(key, 2), (D, 4 * D)) * 0.02).astype(jnp.bfloat16)
    b1 = jnp.zeros((4 * D,), jnp.bfloat16)
    w2 = (jax.random.normal(jax.random.fold_in(key, 3), (4 * D, D)) * 0.02).astype(jnp.bfloat16)
    b2 = jnp.zeros((D,), jnp.bfloat16)

    orig = fb._pick_bm
    for bm in (104, 208, 416, 832, 1664):
        fb._pick_bm = lambda n, t, _bm=bm: _bm if n % _bm == 0 else orig(n, t)

        def chain(x, w1, w2):
            for _ in range(L):
                x = fb.ln_mlp(x, s, bi, w1, b1, w2, b2, True)
            return jnp.sum(x.astype(jnp.float32))

        t_f = bench(jax.jit(chain), x, w1, w2)
        t_fb = bench(jax.jit(jax.grad(chain, argnums=(0, 1, 2))), x, w1, w2)
        print(f"bm={bm}: fwd {t_f*1e3/L:.2f} ms/layer, f+b {t_fb*1e3/L:.2f} ms/layer", flush=True)
    fb._pick_bm = orig


if __name__ == "__main__":
    main()
