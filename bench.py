"""Headline benchmark: DiChaViT-S training throughput at JUMP-CP geometry.

Measurements of the full jitted training step (per-channel patch embed +
flash attention x12 + CDL/TDL diversity losses + AdamW, bfloat16):

1. **flagship** — HCS off: all 8 channels, 8*196+1 = 1569 tokens, the
   reference's exact 6-head ViT-S. The hardware-stress parity number.
2. **recipe** — HCS on, the reference's actual JUMP-CP DiChaViT recipe
   (``train_scripts.sh:5``): every step draws k ~ U[1,8] channels on the
   host and runs that k's compiled specialization (E[k]=4.5 -> ~2.8x fewer
   attention FLOPs than flagship).
3. **mxu_native (dh=128)** — the same model re-headed ``num_heads=3``
   (IDENTICAL parameter count and FLOPs; every attention matmul then uses
   the full 128-wide systolic array instead of half of it at the
   reference's dh=64) — the TPU-native geometry, reported for both the
   flagship and recipe workloads (``small_tpu`` preset).
4. **int8_dh128** — dh=128 with ``model.quantization=int8`` (opt-in
   in-VMEM AQT GEMMs in the fused MLP; int8 is 2x the MXU's bf16 peak).
   Changes training numerics, hence a separate metric.
5. **evit_k07** — flash-native EViT token pruning at ``keep_rate=0.7``
   (prunes at layers 3/6/9), reference 6-head geometry, flagship workload;
   and the same knob on the dh=128 recipe workload
   (``mxu_native_evit_recipe_value``). A documented quality trade (~1%
   loss-trajectory drift, PERFORMANCE.md) — the param tree is identical to
   the dense model, so it is a pure runtime knob.

``vs_baseline`` compares against an *estimated* A100 PyTorch reference
(the repo publishes no numbers, BASELINE.md): ~82 GFLOPs forward/img at
1569 tokens, 3x for training, 40% A100 bf16 MFU (312 TF peak) => ~500
imgs/s flagship; the same arithmetic at E[k]=4.5 (~35 GF/img) => ~1170
imgs/s for the recipe.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import time

A100_FLAGSHIP_IMGS_PER_SEC = 500.0
A100_RECIPE_IMGS_PER_SEC = 1170.0

N_CHANNELS, IMG, CLASSES = 8, 224, 161


def _setup(num_heads: int, batch: int):
    """Model + state + resident data for one geometry; one-time per config."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.schedules import make_lr_schedule

    model = _build_flagship(IMG, 16, 12, 384, num_heads, N_CHANNELS, CLASSES,
                            jnp.bfloat16)
    lr = make_lr_schedule("cosine", 4e-4,
                          dict(t_initial=100, warmup_t=10, warmup_lr_init=1e-5),
                          num_epochs=100, steps_per_epoch=100)
    tx = make_optimizer("adamw", dict(weight_decay=0.04), lr_schedule=lr,
                        total_steps=10000)
    x0 = jnp.zeros((2, N_CHANNELS, IMG, IMG), jnp.float32)
    state = create_train_state(model, tx, rng=jax.random.key(0),
                               sample_input=x0,
                               sample_channel_ids=jnp.arange(N_CHANNELS))
    n_devices = len(jax.devices())
    mesh = None
    if n_devices > 1:
        from diverse_channel_vit_tpu.parallel import make_mesh, shard_params

        mesh = make_mesh({"data": -1, "model": 1})
        state = state.replace(params=shard_params(state.params, mesh),
                              opt_state=shard_params(state.opt_state, mesh))
    data = {"image": jax.random.normal(jax.random.key(2),
                                       (batch, N_CHANNELS, IMG, IMG), jnp.float32),
            "label": jnp.arange(batch) % CLASSES}
    if mesh is not None:
        from diverse_channel_vit_tpu.parallel import shard_batch

        data = shard_batch(data, mesh)
    return model, state, data, mesh


def _mk_step(model, k, mesh):
    from diverse_channel_vit_tpu.training.steps import make_train_step

    return make_train_step(
        model, channel_ids=range(N_CHANNELS), k=k,
        hcs_method="lowest_cosine_prob" if k else "none",
        hcs_temp=1000.0,  # train_scripts.sh:5 hcs_sampling_temp
        patch_size=16, loss_type="ce", extra_loss_lambda=1.0, donate=True,
        mesh=mesh,
    )


def _sync(metrics):
    """Drain the device queue. On axon, ``jax.block_until_ready`` can return
    before queued work (e.g. warm-up compiles) finishes; a host readback is
    the only reliable barrier (CLAUDE.md), else compile time bleeds into the
    timed region."""
    import jax.numpy as jnp

    return float(jnp.sum(metrics["loss"]))


def _measure(state, data, steps, batch, iters, warmup=3):
    import jax

    key = jax.random.key(1)
    metrics = None
    for i in range(warmup):
        state, metrics = steps[i % len(steps)](state, data, jax.random.fold_in(key, i))
    if warmup:
        _sync(metrics)
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = steps[i % len(steps)](state, data, jax.random.fold_in(key, 100 + i))
    _sync(metrics)
    return batch * iters / (time.perf_counter() - t0), state


def flagship_imgs_per_sec(num_heads: int = 6, batch: int = 64, iters: int = 20):
    """Reusable single-config measurement (scripts/bench_attn.py step exp)."""
    import jax

    from diverse_channel_vit_tpu.compile_cache import enable

    enable()
    n_devices = len(jax.devices())
    model, state, data, mesh = _setup(num_heads, batch * n_devices)
    step = _mk_step(model, None, mesh)
    ips, _ = _measure(state, data, [step], batch * n_devices, iters)
    return ips / n_devices


def _recipe_ks(n_draws: int = 48):
    import numpy as np

    rng = np.random.default_rng(0)
    return [int(rng.integers(1, N_CHANNELS + 1)) for _ in range(n_draws)]


def recipe_imgs_per_sec(num_heads: int = 6, batch: int = 64):
    import jax

    from diverse_channel_vit_tpu.compile_cache import enable

    enable()
    n_devices = len(jax.devices())
    model, state, data, mesh = _setup(num_heads, batch * n_devices)
    ks = _recipe_ks()
    steps_by_k = {k: _mk_step(model, k, mesh) for k in sorted(set(ks))}
    # warm every specialization once (compile), then measure the mixture
    for s in steps_by_k.values():
        state, metrics = s(state, data, jax.random.key(9))
    _sync(metrics)
    ips, _ = _measure(state, data, [steps_by_k[k] for k in ks],
                      batch * n_devices, iters=len(ks), warmup=0)
    return ips / n_devices


def _wait_for_device(attempts: int = 5, probe_timeout: int = 180,
                     backoff_s: int = 120) -> None:
    """Bounded pre-flight for a flaky TPU tunnel: the axon backend can be
    transiently UNAVAILABLE (or hang during init), and a failed backend
    init is cached for the whole process — so probe from a SUBPROCESS and
    only import-and-run in this process once a probe succeeds. Proceeds
    after the last attempt regardless (the real error then surfaces)."""
    import subprocess
    import sys

    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
                timeout=probe_timeout, capture_output=True, text=True,
            )
            if r.returncode == 0 and r.stdout.strip().isdigit():
                return
        except subprocess.TimeoutExpired:
            pass
        if i < attempts - 1:
            print(f"[bench] device probe {i + 1}/{attempts} failed; "
                  f"retrying in {backoff_s}s", flush=True)
            time.sleep(backoff_s)


def main():
    _wait_for_device()

    import jax

    from diverse_channel_vit_tpu.compile_cache import enable as _enable_cache

    _enable_cache()
    n_devices = len(jax.devices())
    b = 64 * n_devices

    # 1/2: reference-parity 6-head geometry, flagship + recipe
    model, state, data, mesh = _setup(6, b)
    flagship, state = _measure(state, data, [_mk_step(model, None, mesh)], b, iters=20)
    flagship /= n_devices
    ks = _recipe_ks()
    steps_by_k = {k: _mk_step(model, k, mesh) for k in sorted(set(ks))}
    for s in steps_by_k.values():
        state, metrics = s(state, data, jax.random.key(9))
    _sync(metrics)
    recipe, _ = _measure(state, data, [steps_by_k[k] for k in ks], b,
                         iters=len(ks), warmup=0)
    recipe /= n_devices

    # 3/4: the MXU-native dh=128 geometry (small_tpu preset), both workloads
    model128, state128, data, mesh = _setup(3, b)
    dh128, state128 = _measure(state128, data, [_mk_step(model128, None, mesh)],
                               b, iters=20)
    dh128 /= n_devices
    steps128 = {k: _mk_step(model128, k, mesh) for k in sorted(set(ks))}
    for s in steps128.values():
        state128, metrics = s(state128, data, jax.random.key(9))
    _sync(metrics)
    dh128_recipe, _ = _measure(state128, data, [steps128[k] for k in ks], b,
                               iters=len(ks), warmup=0)
    dh128_recipe /= n_devices

    # 5: opt-in int8 quantised MLP GEMMs (model.quantization=int8) on the
    # TPU-native geometry — changes training numerics (~1e-2 rel per GEMM,
    # loss-curve evidence in PERFORMANCE.md), so reported separately
    from diverse_channel_vit_tpu.ops.fused_block import set_quantization

    set_quantization("int8")
    model_q, state_q, data, mesh = _setup(3, b)
    dh128_int8, _ = _measure(state_q, data, [_mk_step(model_q, None, mesh)],
                             b, iters=20)
    dh128_int8 /= n_devices
    set_quantization("none")

    # 6/7: flash-native EViT keep_rate=0.7 — identical param tree (runtime
    # knob); reference geometry flagship + dh=128 recipe workloads
    model, state, data, mesh = _setup(6, b)
    model_e = model.clone(backbone=model.backbone.clone(keep_rate=0.7))
    evit, _ = _measure(state, data, [_mk_step(model_e, None, mesh)], b, iters=20)
    evit /= n_devices
    model128, state128, data, mesh = _setup(3, b)
    model128_e = model128.clone(backbone=model128.backbone.clone(keep_rate=0.7))
    steps_e = {k: _mk_step(model128_e, k, mesh) for k in sorted(set(ks))}
    for s in steps_e.values():
        state128, metrics = s(state128, data, jax.random.key(9))
    _sync(metrics)
    evit_recipe, _ = _measure(state128, data, [steps_e[k] for k in ks], b,
                              iters=len(ks), warmup=0)
    evit_recipe /= n_devices

    print(json.dumps({
        "metric": "dichavit_s_jumpcp_train_images_per_sec_per_chip",
        "value": round(flagship, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(flagship / A100_FLAGSHIP_IMGS_PER_SEC, 3),
        "recipe_hcs_on_value": round(recipe, 2),
        "recipe_vs_baseline": round(recipe / A100_RECIPE_IMGS_PER_SEC, 3),
        "mxu_native_dh128_value": round(dh128, 2),
        "mxu_native_dh128_vs_baseline": round(dh128 / A100_FLAGSHIP_IMGS_PER_SEC, 3),
        "mxu_native_recipe_value": round(dh128_recipe, 2),
        "mxu_native_recipe_vs_baseline": round(dh128_recipe / A100_RECIPE_IMGS_PER_SEC, 3),
        "int8_dh128_value": round(dh128_int8, 2),
        "int8_dh128_vs_baseline": round(dh128_int8 / A100_FLAGSHIP_IMGS_PER_SEC, 3),
        "evit_k07_value": round(evit, 2),
        "evit_k07_vs_baseline": round(evit / A100_FLAGSHIP_IMGS_PER_SEC, 3),
        "mxu_native_evit_recipe_value": round(evit_recipe, 2),
        "mxu_native_evit_recipe_vs_baseline": round(
            evit_recipe / A100_RECIPE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
