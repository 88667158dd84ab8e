"""Serving-path latency/throughput on the real TPU (do NOT set JAX_PLATFORMS).

Measures the flagship DiChaViT-S geometry through serving.ServingEngine:
- batched path: imgs/s at each compiled bucket;
- dynamic micro-batcher: end-to-end p50/p95/p99 request latency under a
  Poisson-ish open load.

Usage: python -u scripts/bench_serving.py [heads]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

from diverse_channel_vit_tpu.compile_cache import enable

enable()

import jax
import jax.numpy as jnp

from __graft_entry__ import _build_flagship
from diverse_channel_vit_tpu.serving import ServingEngine

HEADS = int(sys.argv[1]) if len(sys.argv) > 1 else 6
C, IMG, CLASSES = 8, 224, 161

model = _build_flagship(IMG, 16, 12, 384, HEADS, C, CLASSES, jnp.bfloat16)
x0 = jnp.zeros((2, C, IMG, IMG), jnp.float32)
params = jax.jit(
    lambda r: model.init({"params": r}, x0, jnp.arange(C), train=False)["params"]
)(jax.random.key(0))

eng = ServingEngine(model, params, buckets=(1, 8, 32, 64), max_wait_ms=2.0)
t0 = time.perf_counter()
eng.warmup(range(C), (IMG, IMG))
print(f"warmup (4 buckets AOT): {time.perf_counter()-t0:.1f}s", flush=True)

rng = np.random.default_rng(0)
for b in (1, 8, 32, 64):
    imgs = rng.normal(size=(b, C, IMG, IMG)).astype(np.float32)
    out = eng.predict(imgs, range(C))  # warm bucket path
    t0 = time.perf_counter()
    iters = max(3, 64 // b)
    for _ in range(iters):
        out = eng.predict(imgs, range(C))
    float(np.sum(out))  # host sync
    dt = (time.perf_counter() - t0) / iters
    print(f"bucket {b:3d}: {dt*1e3:7.2f} ms/batch  {b/dt:8.1f} imgs/s  "
          f"({dt*1e3/b:.2f} ms/img)", flush=True)

# device-resident probe: the compiled program alone (no host->device input
# transfer). On this dev host the TPU sits behind the axon tunnel, so
# predict() above is transfer-bound (each bs-64 batch ships 51 MB); a real
# deployment co-locates the host, making THIS the serving capability.
cids_arr = jnp.arange(C, dtype=jnp.int32)
for b in (1, 8, 32, 64):
    exe = eng._executable(b, np.arange(C, dtype=np.int32), (IMG, IMG))
    xdev = jnp.asarray(rng.normal(size=(b, C, IMG, IMG)).astype(np.float32))
    out = exe(params, xdev, cids_arr)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    iters = max(5, 256 // b)
    for _ in range(iters):
        out = exe(params, xdev, cids_arr)
    float(jnp.sum(out))  # host sync
    dt = (time.perf_counter() - t0) / iters
    print(f"resident bucket {b:3d}: {dt*1e3:7.2f} ms/batch  {b/dt:8.1f} imgs/s",
          flush=True)

# serve-pruned: EViT keep_rate is a pure runtime knob (BlockEViT shares the
# plain Block's parameter tree, models/vit.py) — the SAME trained params run
# through a pruned model clone. Device-resident, bucket 64.
for kr in (0.9, 0.7, 0.5):
    pruned = model.clone(backbone=model.backbone.clone(keep_rate=kr))
    peng = ServingEngine(pruned, params, buckets=(64,), max_wait_ms=2.0)
    exe = peng._executable(64, np.arange(C, dtype=np.int32), (IMG, IMG))
    xdev = jnp.asarray(rng.normal(size=(64, C, IMG, IMG)).astype(np.float32))
    out = exe(params, xdev, cids_arr)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(5):
        out = exe(params, xdev, cids_arr)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / 5
    print(f"resident bucket  64 keep_rate {kr}: {dt*1e3:7.2f} ms/batch  "
          f"{64/dt:8.1f} imgs/s", flush=True)

# int8 serving: forward-only, so the fused-MLP AQT GEMMs pay no gradient
# cost; engine-scoped flag (process default untouched). Same trained params.
for kr in (None, 0.7):
    m = model if kr is None else model.clone(
        backbone=model.backbone.clone(keep_rate=kr))
    qeng = ServingEngine(m, params, buckets=(64,), quantization="int8")
    exe = qeng._executable(64, np.arange(C, dtype=np.int32), (IMG, IMG))
    xdev = jnp.asarray(rng.normal(size=(64, C, IMG, IMG)).astype(np.float32))
    out = exe(params, xdev, cids_arr)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(5):
        out = exe(params, xdev, cids_arr)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / 5
    tag = "dense" if kr is None else f"keep_rate {kr}"
    print(f"resident bucket  64 int8 {tag}: {dt*1e3:7.2f} ms/batch  "
          f"{64/dt:8.1f} imgs/s", flush=True)

# open-loop micro-batcher: 256 single-image requests as fast as we can feed
eng.start()
try:
    imgs = rng.normal(size=(256, C, IMG, IMG)).astype(np.float32)
    futs = [eng.submit(im, range(C)) for im in imgs]
    rows = [f.result(timeout=300) for f in futs]
finally:
    eng.stop()
s = eng.stats.summary()
print(f"micro-batcher: p50={s['p50_ms']:.1f}ms p95={s['p95_ms']:.1f}ms "
      f"p99={s['p99_ms']:.1f}ms  {s['imgs_per_sec']:.1f} imgs/s "
      f"({s['n_flushes']} flushes for {s['n_images']} imgs)", flush=True)
