"""Model-scale throughput on the real TPU: ViT-S -> ViT-B -> ViT-L.

The reference tops out at ViT-S (``channelvit_small``, dichavit.py:775-790);
production deployments want the same channel-adaptive training loop at
larger trunks. This measures the full jitted DiChaViT train step (8-channel
JUMP-CP flagship workload: 1569 tokens, CDL/TDL diversity losses, AdamW,
bf16) across trunk scales at the MXU-native dh=128 head layout, plus the
memory levers that keep the bigger trunks on a 16 GB v5e:

    python -u scripts/bench_scale.py [--iters 10] [--geoms S64,S,B,L]

Reports one JSON line per geometry:
    {"geom", "embed_dim", "depth", "batch", "remat", "ms_per_step",
     "imgs_per_sec"}

Findings are recorded in PERFORMANCE.md ("Scaling up the trunk").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diverse_channel_vit_tpu.compile_cache import enable, honor_env_platform

N_CHANNELS, IMG, PATCH, CLASSES = 8, 224, 16, 161

# name -> (embed_dim, depth, num_heads, batch, remat)
# dh=128 everywhere (PERFORMANCE.md "MXU-native geometry"); S64 is the
# reference's own 6-head ViT-S layout as the anchor. ViT-L needs remat:
# 24 blocks of bf16 residuals at batch 64 x 1569 tokens exceed the v5e's
# HBM working set without it.
GEOMS = {
    "S64": (384, 12, 6, 64, False),
    "S": (384, 12, 3, 64, False),
    "B": (768, 12, 6, 64, False),
    "L": (1024, 24, 8, 64, True),
    "L32": (1024, 24, 8, 32, False),  # no-remat comparison point
}


def _build(embed_dim, depth, num_heads, remat, dtype):
    import jax.numpy as jnp  # noqa: F401

    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier

    backbone = ChannelVisionTransformer(
        num_total_channels=N_CHANNELS, img_size=IMG, patch_size=PATCH,
        embed_dim=embed_dim, depth=depth, num_heads=num_heads,
        proxy_loss_lambda=1e-3, ortho_loss_v1_lambda=1e-3,
        gamma_s=1.0, gamma_d=4.0, remat=remat, scan_blocks=remat,
        dtype=dtype,
    )
    return ChannelAdaptiveClassifier(
        backbone=backbone, embed_dim=embed_dim, num_classes=CLASSES,
        with_head=True,
    )


def bench_geom(name, iters=10):
    import jax
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.schedules import make_lr_schedule
    from diverse_channel_vit_tpu.training.steps import make_train_step

    embed_dim, depth, num_heads, batch, remat = GEOMS[name]
    model = _build(embed_dim, depth, num_heads, remat, jnp.bfloat16)
    lr = make_lr_schedule("cosine", 4e-4,
                          dict(t_initial=100, warmup_t=10, warmup_lr_init=1e-5),
                          num_epochs=100, steps_per_epoch=100)
    tx = make_optimizer("adamw", dict(weight_decay=0.04), lr_schedule=lr,
                        total_steps=10000)
    state = create_train_state(
        model, tx, rng=jax.random.key(0),
        sample_input=jnp.zeros((2, N_CHANNELS, IMG, IMG), jnp.float32),
        sample_channel_ids=jnp.arange(N_CHANNELS),
    )
    data = {"image": jax.random.normal(jax.random.key(2),
                                       (batch, N_CHANNELS, IMG, IMG), jnp.float32),
            "label": jnp.arange(batch) % CLASSES}
    step = make_train_step(model, channel_ids=range(N_CHANNELS), k=None,
                           patch_size=PATCH, loss_type="ce",
                           extra_loss_lambda=1.0, donate=True)
    key = jax.random.key(1)
    for i in range(3):  # compile + warm
        state, metrics = step(state, data, jax.random.fold_in(key, i))
    float(jnp.sum(metrics["loss"]))  # host readback = reliable axon barrier
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, data, jax.random.fold_in(key, 100 + i))
    float(jnp.sum(metrics["loss"]))
    dt = (time.perf_counter() - t0) / iters
    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(state.params))
    rec = {"geom": name, "embed_dim": embed_dim, "depth": depth,
           "num_heads": num_heads, "params_m": round(n_params / 1e6, 1),
           "batch": batch, "remat": remat,
           "ms_per_step": round(dt * 1e3, 1),
           "imgs_per_sec": round(batch / dt, 1)}
    print(json.dumps(rec), flush=True)
    del state, data, step
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--geoms", default="S64,S,B,L")
    args = ap.parse_args()
    enable()
    honor_env_platform()
    for name in args.geoms.split(","):
        bench_geom(name.strip(), iters=args.iters)


if __name__ == "__main__":
    main()
