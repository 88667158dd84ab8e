"""Production inference serving for the channel-adaptive model zoo.

The reference repo stops at offline feature extraction
(``/root/reference/morphem/feature_extraction.py``); this module adds the
deployment story a production TPU service needs, designed around XLA's
compilation model:

- **Bucketed AOT compilation**: TPU programs are shape-specialized, so the
  engine compiles the forward once per (batch bucket) at startup via
  ``jit(...).lower(...).compile()`` — no first-request compile stall, no
  tracing in the serving path. Requests pad up to the smallest bucket
  (static shapes keep the MXU tiling intact) and trim on the way out.
- **Dynamic micro-batching**: ``submit()`` enqueues single images and
  returns a ``Future``; a collector thread coalesces the queue up to
  ``max_batch`` (or ``max_wait_ms``) and runs ONE device program per
  flush — the classic latency/throughput trade, tunable per deployment.
- **Channel adaptivity at serve time**: the channel subset is part of the
  request; one engine serves any subset of its channel vocabulary (the
  per-channel tables are indexed by global channel id, so a k-channel
  request is a gather, never a weight edit). Each distinct k gets its own
  bucket family.
- bf16 activations by default (params stay as trained); donation-free —
  weights are shared across in-flight requests.
- Optional int8 serving (``quantization="int8"``): the engine's programs
  compile with the in-VMEM AQT GEMMs of ``ops.fused_block`` (per-row
  dynamic activation absmax, per-column weight absmax, int32 accumulate).
  Inference is forward-only, so the quality cost is the per-GEMM ~1e-2
  relative error alone — no gradient amplification. Scoped per engine: the
  process-wide training default is untouched.

Latency accounting: per-request wall time (submit -> result ready) feeds a
reservoir; ``stats()`` reports p50/p95/p99 and throughput.
"""

from __future__ import annotations

import bisect
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ServingEngine", "ServingStats"]

# Engine compiles that override the process-wide quantization default do so
# by set/restore around the trace — every engine compile in the process must
# therefore serialize through ONE lock, or a concurrent engine's trace could
# read the overridden value (a per-engine lock guards the wrong scope).
_COMPILE_LOCK = threading.Lock()


@dataclass
class ServingStats:
    # bounded window: a long-lived server must not grow per-request state
    latencies_s: "deque" = field(default_factory=lambda: deque(maxlen=4096))
    n_images: int = 0
    n_flushes: int = 0
    started: float = field(default_factory=time.perf_counter)

    def record(self, lat_s: float, n: int):
        self.latencies_s.append(lat_s)
        self.n_images += n

    def summary(self) -> dict:
        lats = np.sort(np.asarray(self.latencies_s or [0.0]))
        q = lambda p: float(lats[min(len(lats) - 1, int(p * len(lats)))])
        dt = time.perf_counter() - self.started
        return {
            "p50_ms": q(0.50) * 1e3,
            "p95_ms": q(0.95) * 1e3,
            "p99_ms": q(0.99) * 1e3,
            "imgs_per_sec": self.n_images / dt if dt > 0 else 0.0,
            "n_images": self.n_images,
            "n_flushes": self.n_flushes,
        }


class ServingEngine:
    """AOT-compiled, dynamically-batched inference over one parameter set.

    ``model`` follows the zoo's shared call signature
    ``(x, channel_ids, *, train, channel_embed_override)``; ``params`` is
    its trained tree (loaded from an orbax checkpoint or straight from a
    ``TrainState``).
    """

    def __init__(
        self,
        model,
        params,
        *,
        buckets: Sequence[int] = (1, 4, 16, 64),
        max_batch: Optional[int] = None,
        max_wait_ms: float = 2.0,
        dtype=jnp.bfloat16,
        quantization: Optional[str] = None,
        mesh=None,
    ):
        if quantization not in (None, "none", "int8"):
            raise ValueError(f"unknown quantization mode: {quantization!r}")
        self.model = model
        self.params = params
        # multi-chip (data-parallel) serving: batch shards over the mesh's
        # "data" axis, params replicate, the forward runs per shard under
        # shard_map (Mosaic kernels cannot be GSPMD-partitioned — the same
        # contract as training/steps.py). Buckets round up to data-axis
        # multiples so every shard gets equal rows.
        self.mesh = mesh
        self._dp = dict(mesh.shape).get("data", 1) if mesh is not None else 1
        # None inherits the process default (training config); a string pins
        # this engine's programs regardless of it
        self.quantization = quantization
        self.buckets = sorted(set(int(b) for b in buckets))
        self.max_batch = int(max_batch or self.buckets[-1])
        if self.max_batch not in self.buckets:
            self.buckets.append(self.max_batch)
            self.buckets.sort()
        if self._dp > 1:
            rnd = lambda b: -(-int(b) // self._dp) * self._dp
            self.buckets = sorted({rnd(b) for b in self.buckets})
            self.max_batch = rnd(self.max_batch)
            from .parallel import shard_params

            self.params = shard_params(self.params, mesh)
        self.max_wait_s = max_wait_ms / 1e3
        self.dtype = dtype
        self._compiled = {}  # (bucket, cids_key) -> compiled executable
        self._queue: "queue.Queue" = queue.Queue()
        self._collector = None
        self._stop = threading.Event()
        self.stats = ServingStats()

    # ---- compilation ---------------------------------------------------

    def _fwd(self, params, x, cids):
        def apply(p, xx, cc):
            out, _ = self.model.apply(
                {"params": p}, xx.astype(self.dtype), cc, train=False
            )
            return out

        if self._dp > 1:
            from jax.sharding import PartitionSpec as P

            from .training.steps import _manual_axes

            return jax.shard_map(
                apply,
                mesh=self.mesh,
                in_specs=(P(), P("data"), P()),
                out_specs=P("data"),
                axis_names=_manual_axes(self.mesh),
                check_vma=False,
            )(params, x, cids)
        return apply(params, x, cids)

    def _executable(self, bucket: int, cids: np.ndarray, img_shape):
        key = (bucket, tuple(int(c) for c in cids), tuple(img_shape))
        exe = self._compiled.get(key)
        if exe is None:
            # process-wide lock: quantization overrides mutate a global read
            # at trace time, so no other engine may trace concurrently
            with _COMPILE_LOCK:
                exe = self._compiled.get(key)
                if exe is None:
                    x = jax.ShapeDtypeStruct(
                        (bucket, len(cids), *img_shape), jnp.float32
                    )
                    p = jax.tree_util.tree_map(
                        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                        self.params,
                    )
                    c = jax.ShapeDtypeStruct((len(cids),), jnp.int32)
                    # the quantization flag is read at TRACE time — scope it
                    # to this compile so the process-wide (training) default
                    # is untouched
                    from .ops import fused_block as _fb

                    prev = _fb.QUANTIZATION_DEFAULT
                    if self.quantization is not None:
                        _fb.set_quantization(self.quantization)
                    try:
                        if self._dp > 1:
                            from jax.sharding import (
                                NamedSharding,
                                PartitionSpec as P,
                            )

                            repl = NamedSharding(self.mesh, P())
                            dsh = NamedSharding(self.mesh, P("data"))
                            fn = jax.jit(
                                self._fwd,
                                in_shardings=(
                                    jax.tree_util.tree_map(lambda _: repl, self.params),
                                    dsh, repl,
                                ),
                                out_shardings=dsh,
                            )
                        else:
                            fn = jax.jit(self._fwd)
                        exe = fn.lower(p, x, c).compile()
                    finally:
                        _fb.set_quantization(prev)
                    self._compiled[key] = exe
        return exe

    def warmup(self, cids: Sequence[int], img_shape: Sequence[int]):
        """AOT-compile every bucket for one channel subset (startup cost,
        amortized by the persistent compile cache across restarts)."""
        cids = np.asarray(cids, np.int32)
        for b in self.buckets:
            self._executable(b, cids, tuple(img_shape))

    # ---- synchronous batched path --------------------------------------

    def predict(self, images: np.ndarray, cids: Sequence[int]) -> np.ndarray:
        """Run a whole request batch: pad to the bucket, run, trim.

        ``images``: (B, k, H, W) float array whose channel axis matches
        ``cids`` (global channel ids).
        """
        images = np.asarray(images, np.float32)
        cids_arr = jnp.asarray(np.asarray(cids, np.int32))
        n = images.shape[0]
        outs = []
        i = 0
        while i < n:
            take = min(n - i, self.max_batch)
            b = self.buckets[bisect.bisect_left(self.buckets, take)]
            chunk = images[i : i + take]
            if take < b:
                chunk = np.concatenate(
                    [chunk, np.zeros((b - take, *images.shape[1:]), np.float32)]
                )
            exe = self._executable(b, np.asarray(cids, np.int32), images.shape[2:])
            chunk_dev = jnp.asarray(chunk)
            cids_dev = cids_arr
            if self._dp > 1:
                from jax.sharding import NamedSharding, PartitionSpec as P

                chunk_dev = jax.device_put(chunk_dev, NamedSharding(self.mesh, P("data")))
                cids_dev = jax.device_put(cids_dev, NamedSharding(self.mesh, P()))
            out = exe(self.params, chunk_dev, cids_dev)
            outs.append(np.asarray(out)[:take])
            i += take
        return np.concatenate(outs) if len(outs) > 1 else outs[0]

    # ---- dynamic micro-batching ----------------------------------------

    def start(self):
        if self._collector is None:
            self._stop.clear()
            self._collector = threading.Thread(target=self._run, daemon=True)
            self._collector.start()
        return self

    def stop(self):
        self._stop.set()
        if self._collector is not None:
            self._collector.join()
            self._collector = None
        # fail any requests still queued — a stranded Future blocks its
        # client forever
        while True:
            try:
                *_, fut = self._queue.get_nowait()
            except queue.Empty:
                break
            fut.set_exception(RuntimeError("serving engine stopped"))

    def submit(self, image: np.ndarray, cids: Sequence[int]) -> Future:
        """Enqueue one (k, H, W) image; the collector coalesces the queue
        into one device program per flush."""
        fut: Future = Future()
        self._queue.put((np.asarray(image, np.float32),
                         tuple(int(c) for c in cids), time.perf_counter(), fut))
        return fut

    def _run(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.max_wait_s
            while len(batch) < self.max_batch:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=left))
                except queue.Empty:
                    break
            # group by channel subset — one program per distinct subset
            by_cids: dict = {}
            for img, cids, t0, fut in batch:
                by_cids.setdefault(cids, []).append((img, t0, fut))
            for cids, items in by_cids.items():
                imgs = np.stack([im for im, _, _ in items])
                try:
                    out = self.predict(imgs, cids)
                    now = time.perf_counter()
                    for (_, t0, fut), row in zip(items, out):
                        self.stats.record(now - t0, 1)
                        fut.set_result(row)
                except Exception as e:  # pragma: no cover - surfaced to caller
                    for _, _, fut in items:
                        fut.set_exception(e)
            self.stats.n_flushes += 1
