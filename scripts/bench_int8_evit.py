"""Compose the two documented-trade throughput knobs: int8 fused-MLP GEMMs
(``model.quantization=int8``) + flash-native EViT pruning (``keep_rate``) on
the MXU-native dh=128 geometry, recipe workload (HCS on, k ~ U[1,8]).

Both knobs are opt-in numerics trades (int8: ~1e-2 rel per GEMM, same
convergence floor; EViT keep 0.7: ~1% loss-trajectory drift — PERFORMANCE.md)
and both keep the dense model's exact parameter tree, so the composition is
a pure runtime configuration. This measures whether their speedups stack on
the recipe workload (int8 helps the dense-dominated small-k steps; EViT
helps the attention-dominated large-k steps).

Usage: python scripts/bench_int8_evit.py [keep_rate] [--flagship]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diverse_channel_vit_tpu.compile_cache import enable

enable()

import jax

from bench import _measure, _mk_step, _recipe_ks, _setup, _sync


def main():
    keep = float(sys.argv[1]) if len(sys.argv) > 1 else 0.7
    flagship_too = "--flagship" in sys.argv

    from diverse_channel_vit_tpu.ops.fused_block import set_quantization

    set_quantization("int8")
    try:
        # mirror bench.py: scale the batch by device count, report per-chip
        n_devices = len(jax.devices())
        b = 64 * n_devices
        model, state, data, mesh = _setup(3, b)
        model_e = model.clone(backbone=model.backbone.clone(keep_rate=keep))

        if flagship_too:
            flag, state = _measure(state, data, [_mk_step(model_e, None, mesh)],
                                   b, iters=20)
            print(f"int8+evit{keep} dh128 flagship: {flag / n_devices:.1f} "
                  "imgs/s/chip", flush=True)

        ks = _recipe_ks()
        steps = {k: _mk_step(model_e, k, mesh) for k in sorted(set(ks))}
        t0 = time.perf_counter()
        for k, s in sorted(steps.items()):
            state, metrics = s(state, data, jax.random.key(9))
            _sync(metrics)
            print(f"  warmed k={k} ({time.perf_counter() - t0:.0f}s)", flush=True)
        recipe, _ = _measure(state, data, [steps[k] for k in ks], b,
                             iters=len(ks), warmup=0)
        print(f"int8+evit{keep} dh128 recipe: {recipe / n_devices:.1f} "
              "imgs/s/chip", flush=True)
    finally:
        set_quantization("none")


if __name__ == "__main__":
    main()
