"""Headline benchmark: DiChaViT-S training throughput at JUMP-CP geometry.

Measures steady-state images/sec of the full jitted training step —
per-channel patch embed + 8*196+1 = 1569-token flash attention x12 blocks +
CDL/TDL diversity losses + AdamW update — in bfloat16 on the available
device(s). This is the driver's north-star metric ("DiChaViT-S images/sec/chip
on JUMP-CP (8-ch)", BASELINE.json).

``vs_baseline`` compares against an *estimated* A100 PyTorch reference of
500 imgs/s: the repo publishes no numbers (BASELINE.md), so the estimate is
analytic — ~82 GFLOPs forward/img at 1569 tokens (ViT-S linear terms ~37GF +
quadratic attention ~45GF), ~3x for training, at 40% A100 bf16 MFU
(312 TF peak) => ~500 imgs/s. Revise when a measured baseline exists.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

A100_ESTIMATE_IMGS_PER_SEC = 500.0


def main():
    import jax
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.compile_cache import enable as _enable_cache

    _enable_cache()

    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.schedules import make_lr_schedule
    from diverse_channel_vit_tpu.training.steps import make_train_step
    from __graft_entry__ import _build_flagship

    n_devices = len(jax.devices())
    batch = 64 * n_devices
    n_channels, img = 8, 224

    model = _build_flagship(img, 16, 12, 384, 6, n_channels, 161, jnp.bfloat16)
    lr = make_lr_schedule("cosine", 4e-4, dict(t_initial=100, warmup_t=10, warmup_lr_init=1e-5),
                          num_epochs=100, steps_per_epoch=100)
    tx = make_optimizer("adamw", dict(weight_decay=0.04), lr_schedule=lr, total_steps=10000)
    x0 = jnp.zeros((2, n_channels, img, img), jnp.float32)
    state = create_train_state(model, tx, rng=jax.random.key(0),
                               sample_input=x0, sample_channel_ids=jnp.arange(n_channels))

    if n_devices > 1:
        from diverse_channel_vit_tpu.parallel import make_mesh, shard_batch, shard_params

        mesh = make_mesh({"data": -1, "model": 1})
        state = state.replace(params=shard_params(state.params, mesh),
                              opt_state=shard_params(state.opt_state, mesh))

    step = make_train_step(
        model, channel_ids=range(n_channels), loss_type="ce",
        extra_loss_lambda=1.0, donate=True,
    )
    key = jax.random.key(1)
    data = {"image": jax.random.normal(jax.random.key(2), (batch, n_channels, img, img), jnp.float32),
            "label": jnp.arange(batch) % 161}
    if n_devices > 1:
        data = shard_batch(data, mesh)

    # warmup / compile
    for i in range(3):
        state, metrics = step(state, data, jax.random.fold_in(key, i))
    jax.block_until_ready(metrics["loss"])

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, data, jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    per_chip = imgs_per_sec / n_devices
    print(json.dumps({
        "metric": "dichavit_s_jumpcp_train_images_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / A100_ESTIMATE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
