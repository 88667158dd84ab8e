"""Quality evidence for ``model.quantization=int8``: overfit a fixed
synthetic batch with the flagship DiChaViT-S step in bf16 and in int8 and
compare the loss trajectories. Runs on the real TPU (the int8 kernels need
the MXU); results go to PERFORMANCE.md.

Usage: python scripts/train_quality_int8.py [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diverse_channel_vit_tpu.compile_cache import enable

enable()

import bench
from diverse_channel_vit_tpu.ops.fused_block import set_quantization


def run(mode: str, steps: int):
    set_quantization(mode)
    model, state, data, mesh = bench._setup(num_heads=6, batch=64)
    step = bench._mk_step(model, None, mesh)
    key = jax.random.key(7)
    losses = []
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, data, jax.random.fold_in(key, i))
        if i % 10 == 0 or i == steps - 1:
            losses.append((i, float(m["loss"])))
            print(f"  {mode} step {i:4d}: loss {losses[-1][1]:.4f}", flush=True)
    print(f"  {mode}: {steps} steps in {time.perf_counter()-t0:.1f}s")
    return losses


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    print("bf16:")
    l_bf = run("none", steps)
    print("int8:")
    l_i8 = run("int8", steps)
    print("\nstep  bf16    int8    |delta|")
    for (i, a), (_, b) in zip(l_bf, l_i8):
        print(f"{i:4d}  {a:7.4f} {b:7.4f} {abs(a-b):7.4f}")


if __name__ == "__main__":
    main()
