"""Non-GEMM step-tail sweep (VERDICT r3 item 8).

The roofline residual — "LayerNorm1 f+b, embed, losses, optimizer, copies"
— measures ~21 ms/step against a ~14 ms HBM-pass bound. Two numerically
identical levers are measured here on the full flagship step:

1. **grad_norm metric off**: ``optax.global_norm`` over the 200-leaf grad
   tree (one reduction per leaf + rsqrt chain) exists only as a logged
   metric at flagship settings (no clipping). Measures its real cost.
2. **optax.flatten**: the AdamW update runs on ONE concatenated vector
   instead of ~200 small per-leaf fusions (each with launch + HBM-tile
   overhead). Bit-identical update math.
3. both combined.

Run WITHOUT JAX_PLATFORMS: python scripts/bench_tail.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diverse_channel_vit_tpu.compile_cache import enable

enable()

import jax
import jax.numpy as jnp
import optax

from bench import _measure, _mk_step, _setup


def measure(variant: str) -> float:
    import diverse_channel_vit_tpu.training.steps as steps_mod
    from diverse_channel_vit_tpu.training import optim as optim_mod

    n = len(jax.devices())
    orig_norm = optax.global_norm
    orig_make = optim_mod.make_optimizer
    try:
        if "no_gradnorm" in variant:
            steps_mod.optax.global_norm = lambda tree: jnp.float32(0.0)
        if "flat" in variant:
            def flat_make(*a, **k):
                return optax.flatten(orig_make(*a, **k))

            import diverse_channel_vit_tpu.training as training_mod

            # bench._setup does `from ...training import make_optimizer`
            # at call time, so patching the package attribute reaches it
            training_mod.make_optimizer = flat_make
        model, state, data, mesh = _setup(6, 64 * n)
        step = _mk_step(model, None, mesh)
        ips, _ = _measure(state, data, [step], 64 * n, iters=20)
        return ips / n
    finally:
        steps_mod.optax.global_norm = orig_norm
        import diverse_channel_vit_tpu.training as training_mod

        training_mod.make_optimizer = orig_make


def main():
    out = {}
    for variant in ("baseline", "no_gradnorm", "flat", "flat_no_gradnorm"):
        out[variant] = round(measure(variant), 1)
        print(json.dumps({variant: out[variant]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
