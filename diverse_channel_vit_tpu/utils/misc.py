"""Small runtime helpers: seeds, meters, timers.

TPU-native counterpart of the reference's ``utils.py`` support code
(``set_seeds`` at ``utils.py:394-401``, AverageMeter/timers at
``utils.py:239-333``). JAX randomness is threaded explicitly through PRNG
keys, so ``set_seeds`` only has to pin host-side RNGs used by the data
pipeline and channel-count draws.
"""

from __future__ import annotations

import random
import time

import numpy as np


def set_seeds(seed: int) -> np.random.Generator:
    """Seed host-side RNGs; returns a dedicated numpy Generator for the run."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return np.random.default_rng(seed)


class AverageMeter:
    """Tracks mean of a streaming metric."""

    def __init__(self, name: str = ""):
        self.name = name
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0
        self.val = 0.0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class Timer:
    """Wall-clock timer with ETA support."""

    def __init__(self):
        self.start_time = time.time()
        self.laps: list[float] = []

    def lap(self) -> float:
        now = time.time()
        elapsed = now - (self.start_time + sum(self.laps))
        self.laps.append(elapsed)
        return elapsed

    def elapsed(self) -> float:
        return time.time() - self.start_time

    def eta(self, done: int, total: int) -> float:
        if done == 0:
            return float("inf")
        return self.elapsed() / done * (total - done)


def device_memory_stats() -> dict:
    """Per-device HBM usage (the reference's GPU memory introspection,
    ``utils.py:47-110``). Returns {device: {bytes_in_use, bytes_limit}}."""
    import jax

    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
