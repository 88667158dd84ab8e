"""Capture a device trace of the flagship train step and print top ops.

Uses jax.profiler + the tensorboard profile plugin's xplane converter to get
per-op device times (the roofline evidence VERDICT r1 asked for).
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diverse_channel_vit_tpu.compile_cache import enable

enable()

from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
from diverse_channel_vit_tpu.training.schedules import make_lr_schedule
from diverse_channel_vit_tpu.training.steps import make_train_step
from __graft_entry__ import _build_flagship

TRACE_DIR = "/tmp/jax_trace"


def build(num_heads=6):
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
    return step, state, data


def main():
    heads = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    print('num_heads =', heads, flush=True)
    step, state, data = build(heads)
    key = jax.random.key(1)
    for i in range(3):
        state, metrics = step(state, data, jax.random.fold_in(key, i))
    jax.block_until_ready(metrics["loss"])

    with jax.profiler.trace(TRACE_DIR):
        for i in range(3):
            state, metrics = step(state, data, jax.random.fold_in(key, 100 + i))
        jax.block_until_ready(metrics["loss"])

    xplanes = sorted(glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"), recursive=True))
    print("xplane files:", xplanes, flush=True)
    if not xplanes:
        return
    path = xplanes[-1]
    from tensorflow.python.profiler.internal import _pywrap_profiler  # noqa: E402

    for tool in ("framework_op_stats", "tf_stats", "op_profile"):
        try:
            data_out = _pywrap_profiler.xspace_to_tools_data([path], tool)
            out, ok = data_out if isinstance(data_out, tuple) else (data_out, True)
            fn = f"/tmp/{tool}.out"
            mode = "wb" if isinstance(out, bytes) else "w"
            with open(fn, mode) as f:
                f.write(out)
            print(f"{tool}: wrote {fn} ({ok})", flush=True)
        except Exception as e:
            print(f"{tool} failed: {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
