"""EViT token-pruning throughput on the real TPU.

The reference wires EViT top-k CLS-attention token keeping as a research
knob (``models/vit.py:291-343``, Attention_EVIT) but never publishes a
throughput number for it. This measures the trainer's own flagship train
step (DiChaViT-S, JUMP-CP geometry: bs 64, 8ch, 224^2, 1569 tokens) at
keep_rate in {1.0 (off), 0.9, 0.7, 0.5} — pruning fires at layers
{depth/4, depth/2, 3*depth/4} exactly like the EViT paper schedule the
reference copies.

Run: python scripts/bench_evit.py [keep_rate ...]
     python scripts/bench_evit.py quality [steps]   # overfit-trajectory
     # comparison keep_rate 1.0 vs 0.7 on one fixed batch, same init/draws
     python scripts/bench_evit.py ppt               # block_v2 PPT pruning
     # (per-block token_pruning, kc/c tail fraction) vs the plain block
"""

import math
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

IMG, BATCH = 224, 64


def _make(keep_rate: float, extra: list | None = None):
    overrides = [
        "model=dichavit",
        "train.num_epochs=1",
        f"train.batch_size={BATCH}",
        f"dataset.img_size={IMG}",
        f"model.img_size=[{IMG}]",
        "dataset.num_train_samples=64",
        "dataset.num_eval_samples=32",
        "hardware.num_workers=0",
        "train.checkpoints=/tmp/bench_evit_ckpt",
        "train.save_model=none",
        "++model.pretrained_model_name=small",
        "model.patch_size=16",
    ]
    if keep_rate < 1.0:
        overrides.append(f"++model.keep_rate={keep_rate}")
    overrides += extra or []
    trainer = Trainer(load_config("synthetic_cfg", overrides))
    cids = trainer._chunk_channel_ids("train")
    step = trainer._get_train_step(cids, None, chunk=trainer._default_chunk)
    data = trainer._to_device({
        "image": jax.random.normal(jax.random.key(1),
                                   (BATCH, len(cids), IMG, IMG), jnp.float32),
        "label": jnp.arange(BATCH) % trainer.num_classes,
    })
    return trainer, step, data


def bench_one(keep_rate: float, extra: list | None = None,
              tag: str = "keep_rate") -> float:
    trainer, step, data = _make(keep_rate, extra)
    state, key = trainer.state, jax.random.key(2)
    t_c0 = time.perf_counter()
    state, m = step(state, data, key)
    loss0 = float(m["loss"])
    compile_s = time.perf_counter() - t_c0
    for i in range(2):
        state, m = step(state, data, jax.random.fold_in(key, i))
    float(m["loss"])
    iters = 8
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, data, jax.random.fold_in(key, 10 + i))
    loss1 = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    assert math.isfinite(loss0) and math.isfinite(loss1), keep_rate
    ips = BATCH / dt
    print(f"{tag} {keep_rate:4.2f} {dt * 1e3:8.1f} ms/step {ips:8.1f} imgs/s "
          f"(loss {loss0:.3f} -> {loss1:.3f}, compile {compile_s:.0f}s)",
          flush=True)
    return ips


def quality(steps: int):
    """Overfit one fixed batch at keep 1.0 vs 0.7 from the same init (the
    param tree is identical — pruning is score-based, parameter-free) and
    print both loss trajectories."""
    curves = {}
    for r in (1.0, 0.7):
        trainer, step, data = _make(r)
        state, key = trainer.state, jax.random.key(2)
        pts = []
        for i in range(steps):
            state, m = step(state, data, jax.random.fold_in(key, i))
            if i % 10 == 0 or i == steps - 1:
                pts.append((i, float(m["loss"])))
                print(f"  keep {r:3.1f} step {i:4d}: loss {pts[-1][1]:.4f}",
                      flush=True)
        curves[r] = pts
    print("\nstep  keep1.0  keep0.7")
    for (i, a), (_, b) in zip(curves[1.0], curves[0.7]):
        print(f"{i:4d}  {a:7.4f}  {b:7.4f}")


def ppt():
    """block_v2 PPT per-block token pruning (AttentionWithScores, flash +
    CLS-row significance) vs the plain block, at kc in {4 (=C/2 default), 6}.
    Reference role: ``vit.py:402-492`` BlockV2 consumed by channel_vit."""
    bench_one(1.0, tag="ppt off  ")
    for kc in (6, 4):
        bench_one(1.0, extra=["++model.block_type=block_v2",
                              "++model.dropout_tokens_hcs=token_pruning",
                              f"++model.token_keep_channels={kc}"],
                  tag=f"ppt kc={kc}")


if __name__ == "__main__":
    if sys.argv[1:2] == ["quality"]:
        quality(int(sys.argv[2]) if len(sys.argv) > 2 else 120)
    elif sys.argv[1:2] == ["ppt"]:
        ppt()
    else:
        rates = [float(r) for r in sys.argv[1:]] or [1.0, 0.9, 0.7, 0.5]
        for r in rates:
            bench_one(r)
