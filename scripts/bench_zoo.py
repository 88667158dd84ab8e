"""Hardware sweep of the full 12-model zoo: every registered factory's
trainer-built train step compiled and timed on the real TPU.

Purpose: (a) robustness — prove each zoo member Mosaic/XLA-compiles and
executes a real fused train step on hardware (the CPU test suite runs
Pallas in interpret mode and XLA attention, so hardware lowering of the
non-flagship factories is otherwise unproven); (b) a breadth-throughput
table for PERFORMANCE.md.

Geometry: the reference's training geometries — ViT family at ViT-S/16
224^2 with the synthetic 8-channel mapper (1569 tokens, JUMP-CP-like,
bs 32); ConvNeXt family on the convnext_tiny trunk at 224^2 8ch (CHAMMI
baseline role, bs 32). Steps are the Trainer's own (`_get_train_step`,
identical to production: bind_chunk, donation, bf16) on resident device
data, so the numbers are model+optimizer throughput, not loader-bound.

Run:  python scripts/bench_zoo.py            (all 12)
      python scripts/bench_zoo.py dichavit   (one)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diverse_channel_vit_tpu.compile_cache import enable

enable()

from diverse_channel_vit_tpu.config import load_config
from diverse_channel_vit_tpu.trainer import Trainer

VITS = ["dichavit", "channelvit_adapt", "vit_adapt", "depthwisevit_adapt",
        "hypervit_adapt", "templatemixingvit"]
# keys = CONFIG GROUP names (mirror the reference yaml tree); two differ
# from the registry names (sliceparam.yaml -> sliceparamconvnext, ...)
CONVS = ["convnext_base", "shared_convnext", "sliceparam",
         "template_mixing_conv", "hyperconvnext", "depthwiseconvnext"]

IMG, BATCH = 224, 32


def bench_one(name: str) -> float:
    is_vit = name in VITS
    overrides = [
        f"model={name}",
        "train.num_epochs=1",
        f"train.batch_size={BATCH}",
        f"dataset.img_size={IMG}",
        f"model.img_size=[{IMG}]",
        "dataset.num_train_samples=32",
        "dataset.num_eval_samples=32",
        "hardware.num_workers=0",
        "train.checkpoints=/tmp/bench_zoo_ckpt",
        "train.save_model=none",
    ]
    if is_vit:
        # the synthetic_cfg preset shrinks the trunk to the test geometry;
        # restore the reference's ViT-S/16
        overrides += ["++model.pretrained_model_name=small",
                      "model.patch_size=16"]
    trainer = Trainer(load_config("synthetic_cfg", overrides))
    cids = trainer._chunk_channel_ids("train")
    step = trainer._get_train_step(cids, None, chunk=trainer._default_chunk)
    data = trainer._to_device({
        "image": jax.random.normal(jax.random.key(1),
                                   (BATCH, len(cids), IMG, IMG), jnp.float32),
        "label": jnp.arange(BATCH) % trainer.num_classes,
    })
    state, key = trainer.state, jax.random.key(2)
    t_c0 = time.perf_counter()
    state, m = step(state, data, key)
    loss0 = float(m["loss"])  # host readback = reliable sync on axon
    compile_s = time.perf_counter() - t_c0
    for i in range(2):  # warmup
        state, m = step(state, data, jax.random.fold_in(key, i))
    float(m["loss"])
    iters = 8
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, data, jax.random.fold_in(key, 10 + i))
    loss1 = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    import math

    assert math.isfinite(loss0) and math.isfinite(loss1), name
    ips = BATCH / dt
    print(f"{name:24s} {dt * 1e3:8.1f} ms/step {ips:8.1f} imgs/s "
          f"(loss {loss0:.3f} -> {loss1:.3f}, compile {compile_s:.0f}s)",
          flush=True)
    return ips


if __name__ == "__main__":
    names = sys.argv[1:] or (VITS + CONVS)
    for n in names:
        bench_one(n)
