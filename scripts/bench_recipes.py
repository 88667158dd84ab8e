"""Train-step throughput for the reference's OTHER two recipes on the TPU.

bench.py's headline metrics cover the JUMP-CP recipe (train_scripts.sh:5).
This script measures the remaining two canonical recipes at their exact
device-step geometry (synthetic resident data — the step math, channel
mixes, losses and HCS draws are the recipe's; host-side IO/TPS is excluded
and measured separately in PERFORMANCE.md "Input pipeline"):

- **CHAMMI** (train_scripts.sh:2): DiChaViT-S 224/p16, the mixed-chunk
  morphem path — per-chunk grad microbatches (Allen 3ch / HPA 4ch / CP 5ch
  under the 12-channel disjoint mapper) + one accumulated update, proxy
  main loss + CDL(0.1)/TDL(1, gamma_s .5, gamma_d 2, reverse_pos_pairs),
  HCS k_c ~ U[1, C_c] per chunk per step (DCS lowest_cosine_prob).
  Per-chunk quotas approximate the reference's random 64-image mixture as
  the fixed thirds the MixedChunkLoader would build from equal chunk sizes.
- **So2Sat** (train_scripts.sh:8): DiChaViT-S 32/p8, 18 channels, batch
  128, CE loss + CDL(1e-3)/TDL(0.1, gamma_s .5, gamma_d 4), HCS
  k ~ U[1,18] at hcs_sampling_temp=0.01.

Run WITHOUT JAX_PLATFORMS (needs the real chip). Prints one JSON line per
metric, same shape as bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHAMMI_CLASSES = 14  # global mixed-loader label space (data/morphem70k.py)
SO2SAT_CLASSES = 17


def _chammi_setup(img: int = 224, depth: int = 12):
    import jax
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.models import registry as model_zoo
    from diverse_channel_vit_tpu.trainer import build_mapper
    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.schedules import make_lr_schedule

    cfg = load_config(
        "chammi_cfg",
        [
            "model=dichavit", "dataset=morphem70k_v2_12channels",
            "++model.enable_sample=True", "++model.pretrained_model_name=small",
            "++model.temperature=0.07", "++train.batch_size=64",
            "++train.extra_loss_lambda=1", "++model.proxy_loss_lambda=0.1",
            "++model.ortho_loss_v1_lambda=1", "++model.gamma_s=0.5",
            "++model.gamma_d=2", "++model.reverse_pos_pairs=True",
            "++model.orthogonal_channel_emb_init=True",
            "++model.hcs_sampling=lowest_cosine_prob",
            f"++model.img_size=[{img}]", f"++model.depth={depth}",
        ],
    )
    # the Trainer fills model.in_channel_names from the dataset at runtime
    # (trainer.py:205-214); bypassing it here must do the same, else the
    # channel tables size to the model yaml's 10 non-disjoint names while
    # the 12-channel mapper hands out ids up to 11 (jnp.take NaN-fill).
    cfg.model.in_channel_names = cfg.dataset.in_channel_names
    mapper = build_mapper(cfg)
    model = model_zoo.build_model(
        cfg.model.name, cfg.model, mapper, CHAMMI_CLASSES, dtype=jnp.bfloat16
    )
    lr = make_lr_schedule("cosine", 4e-5, dict(t_initial=60, warmup_t=0),
                          num_epochs=60, steps_per_epoch=100)
    tx = make_optimizer("adamw", dict(weight_decay=0.0), lr_schedule=lr,
                        total_steps=6000)
    cids0 = jnp.asarray(mapper["Allen"])
    state = create_train_state(
        model, tx, rng=jax.random.key(0),
        sample_input=jnp.zeros((2, len(mapper["Allen"]), img, img), jnp.float32),
        sample_channel_ids=cids0,
    )
    return cfg, mapper, model, state, img


def chammi_imgs_per_sec(iters: int = 16, img: int = 224, depth: int = 12) -> float:
    """Composite mixed-chunk step: 3 grad microbatches + 1 update."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.models.wrappers import bind_chunk
    from diverse_channel_vit_tpu.training.steps import (
        make_apply_step,
        make_grad_step,
        tree_add,
    )

    cfg, mapper, model, state, img = _chammi_setup(img, depth)
    quotas = {"Allen": 21, "HPA": 21, "CP": 22}  # fixed-quota mixture of 64
    data = {
        chunk: {
            "image": jax.random.normal(
                jax.random.fold_in(jax.random.key(2), i),
                (quotas[chunk], len(mapper[chunk]), img, img), jnp.float32),
            "label": jnp.arange(quotas[chunk]) % CHAMMI_CLASSES,
        }
        for i, chunk in enumerate(("Allen", "HPA", "CP"))
    }
    common = dict(
        hcs_method="lowest_cosine_prob", hcs_temp=0.1, patch_size=16,
        loss_type="proxy", extra_loss_lambda=1.0, temperature=0.07,
    )
    gsteps = {}
    for chunk in data:
        cids = mapper[chunk]
        for k in range(1, len(cids) + 1):
            gsteps[(chunk, k)] = make_grad_step(
                bind_chunk(model, chunk), channel_ids=cids, k=k, **common
            )
    apply_step = make_apply_step(donate=True)
    rng_k = np.random.default_rng(0)

    def composite(state, batch, rng):
        grads, loss = None, None
        for ci, (chunk, sub) in enumerate(batch.items()):
            k = int(rng_k.integers(1, len(mapper[chunk]) + 1))
            g, m = gsteps[(chunk, k)](state.params, sub, jax.random.fold_in(rng, ci))
            grads = g if grads is None else tree_add(grads, g)
            loss = m["loss"] if loss is None else loss + m["loss"]
        state, _ = apply_step(state, grads)
        return state, {"loss": loss}

    # warm every (chunk, k) specialization + the apply step
    for (chunk, k), gs in sorted(gsteps.items()):
        g, m = gs(state.params, data[chunk], jax.random.key(9))
        print(f"[warm] {chunk} k={k} loss={float(m['loss']):.3f}", flush=True)
    state, _ = apply_step(state, g)
    float(jnp.sum(m["loss"]))  # drain the queue (host readback, CLAUDE.md)

    t0 = time.perf_counter()
    metrics = None
    for i in range(iters):
        state, metrics = composite(state, data, jax.random.fold_in(jax.random.key(7), i))
    loss = float(jnp.sum(metrics["loss"]))
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    return 64 * iters / dt


def so2sat_imgs_per_sec(iters: int = 48, depth: int = 12, batch: int = 128) -> float:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier
    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.schedules import make_lr_schedule
    from diverse_channel_vit_tpu.training.steps import make_train_step

    c, img, patch = 18, 32, 8
    backbone = ChannelVisionTransformer(
        num_total_channels=c, img_size=img, patch_size=patch, embed_dim=384,
        depth=depth, num_heads=6,
        proxy_loss_lambda=1e-3,  # train_scripts.sh:8 So2Sat DiChaViT recipe
        ortho_loss_v1_lambda=0.1, gamma_s=0.5, gamma_d=4.0,
        reverse_pos_pairs=True, dtype=jnp.bfloat16,
    )
    model = ChannelAdaptiveClassifier(backbone=backbone, embed_dim=384,
                                      num_classes=SO2SAT_CLASSES, with_head=True)
    lr = make_lr_schedule("cosine", 4e-4, dict(t_initial=100, warmup_t=10,
                                               warmup_lr_init=1e-5),
                          num_epochs=100, steps_per_epoch=100)
    tx = make_optimizer("adamw", dict(weight_decay=0.05), lr_schedule=lr,
                        total_steps=10000)
    state = create_train_state(
        model, tx, rng=jax.random.key(0),
        sample_input=jnp.zeros((2, c, img, img), jnp.float32),
        sample_channel_ids=jnp.arange(c),
    )
    data = {
        "image": jax.random.normal(jax.random.key(2), (batch, c, img, img),
                                   jnp.float32),
        "label": jnp.arange(batch) % SO2SAT_CLASSES,
    }
    rng_k = np.random.default_rng(0)
    ks = [int(rng_k.integers(1, c + 1)) for _ in range(iters)]
    steps = {}
    metrics = None
    for k in sorted(set(ks)):
        steps[k] = make_train_step(
            model, channel_ids=range(c), k=k,
            hcs_method="lowest_cosine_prob", hcs_temp=0.01, patch_size=patch,
            loss_type="ce", extra_loss_lambda=1.0, donate=True,
        )
        state, metrics = steps[k](state, data, jax.random.key(9))
        print(f"[warm] so2sat k={k} loss={float(metrics['loss']):.3f}", flush=True)
    float(jnp.sum(metrics["loss"]))

    t0 = time.perf_counter()
    for i, k in enumerate(ks):
        state, metrics = steps[k](state, data, jax.random.fold_in(jax.random.key(7), i))
    loss = float(jnp.sum(metrics["loss"]))
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    return batch * len(ks) / dt


def main():
    from diverse_channel_vit_tpu.compile_cache import enable, honor_env_platform

    honor_env_platform()  # JAX_PLATFORMS=cpu smoke runs stay off the TPU
    enable()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "smoke":  # tiny-geometry plumbing check (CPU-friendly)
        print("chammi smoke ips:", round(chammi_imgs_per_sec(2, img=32, depth=2), 2))
        print("so2sat smoke ips:", round(so2sat_imgs_per_sec(2, depth=2, batch=8), 2))
        return
    if which in ("all", "chammi"):
        v = chammi_imgs_per_sec()
        print(json.dumps({"metric": "chammi_recipe_train_imgs_per_sec_per_chip",
                          "value": round(v, 1), "unit": "imgs/sec/chip"}))
    if which in ("all", "so2sat"):
        v = so2sat_imgs_per_sec()
        print(json.dumps({"metric": "so2sat_recipe_train_imgs_per_sec_per_chip",
                          "value": round(v, 1), "unit": "imgs/sec/chip"}))


if __name__ == "__main__":
    main()
