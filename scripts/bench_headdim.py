"""Train-step throughput vs head_dim (num_heads 6/3/12 at D=384).

The dh=64 reference geometry caps every attention matmul at 50% MXU width;
dh=128 (3 heads) uses the full 128-wide array with the same parameter count
and FLOPs. Measures the full flagship train step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diverse_channel_vit_tpu.compile_cache import enable

enable()

from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
from diverse_channel_vit_tpu.training.schedules import make_lr_schedule
from diverse_channel_vit_tpu.training.steps import make_train_step
from __graft_entry__ import _build_flagship


def run(num_heads):
    n_channels, img = 8, 224
    model = _build_flagship(img, 16, 12, 384, num_heads, n_channels, 161, jnp.bfloat16)
    lr = make_lr_schedule("cosine", 4e-4, dict(t_initial=100, warmup_t=10, warmup_lr_init=1e-5),
                          num_epochs=100, steps_per_epoch=100)
    tx = make_optimizer("adamw", dict(weight_decay=0.04), lr_schedule=lr, total_steps=10000)
    x0 = jnp.zeros((2, n_channels, img, img), jnp.float32)
    state = create_train_state(model, tx, rng=jax.random.key(0),
                               sample_input=x0, sample_channel_ids=jnp.arange(n_channels))
    step = make_train_step(model, channel_ids=range(n_channels), loss_type="ce",
                           extra_loss_lambda=1.0, donate=True)
    data = {"image": jax.random.normal(jax.random.key(2), (64, n_channels, img, img), jnp.float32),
            "label": jnp.arange(64) % 161}
    key = jax.random.key(1)
    for i in range(3):
        state, m = step(state, data, jax.random.fold_in(key, i))
    _ = float(m["loss"])
    t0 = time.perf_counter()
    iters = 12
    for i in range(iters):
        state, m = step(state, data, jax.random.fold_in(key, 100 + i))
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"num_heads={num_heads} (dh={384//num_heads}): {dt*1e3:.1f} ms/step, "
          f"{64/dt:.1f} imgs/s", flush=True)


if __name__ == "__main__":
    for h in (6, 3, 12):
        run(h)
