"""Isolate the soak run's host-RSS growth: transfers only, no model.

The round-4 soak shows host RSS growing linearly (~1.2 GB/min) while
training at ~19 MB/s of host->device batch traffic through the axon
tunnel; device-resident benchmarks (bench.py) are flat. This probe ships
the SAME batch volume with jax.device_put in a bare loop — no model, no
optimizer, no loader — and prints the RSS slope. A matching slope pins
the growth on the transfer path (tunnel client staging retention), not on
framework state.

Run WITHOUT JAX_PLATFORMS: python scripts/probe_transfer_rss.py [seconds]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diverse_channel_vit_tpu.compile_cache import enable

enable()

import jax
import jax.numpy as jnp
import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024
    return 0.0


def main():
    seconds = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    batch = np.random.default_rng(0).normal(
        size=(64, 8, 128, 128)).astype(np.bfloat16 if hasattr(np, "bfloat16")
                                       else np.float16)
    # ship as bf16 like the trainer does
    host = jnp.asarray(np.asarray(batch, np.float32), jnp.bfloat16)
    host = np.asarray(host)  # host-side bf16 ndarray
    t0, r0 = time.perf_counter(), rss_mb()
    sent = 0
    last = None
    while time.perf_counter() - t0 < seconds:
        dev = jax.device_put(host)
        dev.block_until_ready()
        sent += host.nbytes
        last = dev
    dt = time.perf_counter() - t0
    r1 = rss_mb()
    print(json.dumps({
        "seconds": round(dt, 1),
        "transferred_mb": round(sent / 2**20, 1),
        "transfer_mb_per_s": round(sent / 2**20 / dt, 1),
        "rss_start_mb": round(r0, 1), "rss_end_mb": round(r1, 1),
        "rss_growth_mb_per_min": round((r1 - r0) / (dt / 60), 1),
    }))
    del last


if __name__ == "__main__":
    main()
