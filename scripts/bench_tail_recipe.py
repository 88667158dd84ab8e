"""Non-GEMM tail sweep on the RECIPE workload (VERDICT r4 item 7).

Round 4's tail sweep refuted grad_norm-metric and optax.flatten on the
FLAGSHIP step; the two untested candidates — per-channel-embed +
channel-offset fusion, and loss-term fusion — matter most on the recipe
path where k is small and the tail is proportionally larger. Each variant
here removes a candidate's ENTIRE cost (upper-bounding what any fusion of
it could recover):

- ``no_extra_losses``: proxy/ortho/CDL/TDL lambdas 0 AND the loss terms
  compiled out (extra_loss_lambda=0) — bounds loss-term fusion.
- ``no_channel_embed``: ``use_channelvit_channels=False`` (the per-channel
  embedding gather+add never runs) — bounds embed/channel-offset fusion.
  (Numerically a different model; cost isolation only.)

Run WITHOUT JAX_PLATFORMS: python scripts/bench_tail_recipe.py [n_draws]
Prints one JSON line with imgs/s/chip per variant on the 48-draw k~U[1,8]
recipe mixture (same mixture as bench.py's recipe metric).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diverse_channel_vit_tpu.compile_cache import enable

enable()

import jax
import jax.numpy as jnp

from bench import CLASSES, IMG, N_CHANNELS, _measure, _recipe_ks, _setup
from diverse_channel_vit_tpu.training.steps import make_train_step


def _variant_model(variant: str):
    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier

    kw = dict(num_total_channels=N_CHANNELS, img_size=IMG, patch_size=16,
              embed_dim=384, depth=12, num_heads=6,
              proxy_loss_lambda=1e-3, ortho_loss_v1_lambda=1e-3,
              gamma_s=1.0, gamma_d=4.0, dtype=jnp.bfloat16)
    if variant == "no_extra_losses":
        kw["proxy_loss_lambda"] = 0.0
        kw["ortho_loss_v1_lambda"] = 0.0
    if variant == "no_channel_embed":
        kw["use_channelvit_channels"] = False
    backbone = ChannelVisionTransformer(**kw)
    return ChannelAdaptiveClassifier(backbone=backbone, embed_dim=384,
                                     num_classes=CLASSES, with_head=True)


def measure(variant: str, n_draws: int) -> float:
    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.schedules import make_lr_schedule

    n = len(jax.devices())
    batch = 64 * n
    model = _variant_model(variant)
    lr = make_lr_schedule("cosine", 4e-4,
                          dict(t_initial=100, warmup_t=10, warmup_lr_init=1e-5),
                          num_epochs=100, steps_per_epoch=100)
    tx = make_optimizer("adamw", dict(weight_decay=0.04), lr_schedule=lr,
                        total_steps=10000)
    x0 = jnp.zeros((2, N_CHANNELS, IMG, IMG), jnp.float32)
    state = create_train_state(model, tx, rng=jax.random.key(0),
                               sample_input=x0,
                               sample_channel_ids=jnp.arange(N_CHANNELS))
    mesh = None
    data = {"image": jax.random.normal(jax.random.key(2),
                                       (batch, N_CHANNELS, IMG, IMG), jnp.float32),
            "label": jnp.arange(batch) % CLASSES}
    ks = _recipe_ks(n_draws)
    extra = 0.0 if variant == "no_extra_losses" else 1.0
    # the DCS cosine scorer reads the channel-embed table, which the
    # no_channel_embed model doesn't have — that variant (and its matched
    # "uniform" baseline) samples uniformly so the sampler cost is equal
    # on both sides of the embed comparison
    method = ("uniform" if variant in ("no_channel_embed", "uniform")
              else "lowest_cosine_prob")
    steps_by_k = {
        k: make_train_step(
            model, channel_ids=range(N_CHANNELS), k=k,
            hcs_method=method, hcs_temp=1000.0, patch_size=16,
            loss_type="ce", extra_loss_lambda=extra, donate=True, mesh=mesh)
        for k in sorted(set(ks))
    }
    for s in steps_by_k.values():
        state, metrics = s(state, data, jax.random.key(9))
    float(jnp.sum(metrics["loss"]))
    # run the mixture TWICE and keep the second: the first pass through a
    # fresh set of k-specializations still pays executable-load /
    # tunnel-state costs (measured: first pass 505-535 vs 613-615 warm —
    # a 17% cold artifact that a single pass would misattribute)
    ips = 0.0
    for _ in range(2):
        ips, state = _measure(state, data, [steps_by_k[k] for k in ks],
                              batch, iters=len(ks), warmup=0)
    return ips / n


def main():
    n_draws = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    out = {}
    for variant in ("baseline", "no_extra_losses", "uniform",
                    "no_channel_embed"):
        out[variant] = round(measure(variant, n_draws), 1)
        print(json.dumps({variant: out[variant]}), flush=True)
    base = out["baseline"]
    out["loss_fusion_bound_pct"] = round(
        100.0 * (out["no_extra_losses"] - base) / base, 2)
    # embed bound vs the SAME (uniform) sampler, isolating the embed add
    out["embed_fusion_bound_pct"] = round(
        100.0 * (out["no_channel_embed"] - out["uniform"]) / out["uniform"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
