"""Exact k-nearest-neighbors on device.

Replaces ``FaissKNeighbors`` (``morphem/utils.py:8-46``): k=1, L2
(``IndexFlatL2``) or cosine (normalize + ``IndexFlatIP``). Exact search is a
single (Q_block x D) @ (D x N) matmul + ``jax.lax.top_k`` — the MXU does in
one fused pass what FAISS does with a scan kernel. Queries stream in
fixed-size blocks (one compiled specialization regardless of query count);
the reference bank (~70k x 384 for CHAMMI) lives in HBM once.

Multi-device: banks larger than one chip shard over the data axis and the
per-shard top-k merges with one small all-gather; at CHAMMI scale a single
chip holds everything, so the sharded path is optional.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_QUERY_BLOCK = 1024


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def _topk_block(queries: jax.Array, bank: jax.Array, *, k: int, metric: str):
    """queries (Qb, D) x bank (N, D) -> (dists/sims (Qb, k), idx (Qb, k))."""
    q = queries.astype(jnp.float32)
    b = bank.astype(jnp.float32)
    if metric == "cosine":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        b = b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-12)
        scores = q @ b.T  # higher = closer
    elif metric == "l2":
        # -||q - b||^2 = 2 q.b - ||b||^2 (+ const ||q||^2, rank-preserving)
        scores = 2.0 * (q @ b.T) - jnp.sum(b * b, axis=1)[None, :]
    else:
        raise ValueError(f"metric must be l2|cosine, got {metric!r}")
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx


def _sharded_topk(queries: jax.Array, bank: jax.Array, *, k: int, metric: str, mesh):
    """Bank sharded over the data axis; per-shard top-k merged with one
    small all-gather (the multi-chip FAISS-GPU replacement)."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    n_dev = mesh.shape["data"]
    n_bank = bank.shape[0]
    pad = (-n_bank) % n_dev
    if pad:
        # pad with -inf-scoring sentinels (zeros score low under both metrics
        # after masking below via index validity)
        bank = jnp.pad(bank, ((0, pad), (0, 0)))
    shard_len = bank.shape[0] // n_dev
    bank = jax.device_put(bank, NamedSharding(mesh, P("data", None)))

    def local(q, b):
        shard_id = jax.lax.axis_index("data")
        qf = q.astype(jnp.float32)
        bf = b.astype(jnp.float32)
        if metric == "cosine":
            qf = qf / jnp.maximum(jnp.linalg.norm(qf, axis=1, keepdims=True), 1e-12)
            bf = bf / jnp.maximum(jnp.linalg.norm(bf, axis=1, keepdims=True), 1e-12)
            scores = qf @ bf.T
        else:
            scores = 2.0 * (qf @ bf.T) - jnp.sum(bf * bf, axis=1)[None, :]
        # mask padded sentinel rows (global id >= n_bank) before the local
        # top-k, or zeros-rows could displace real candidates
        gids = shard_id * shard_len + jnp.arange(shard_len)
        scores = jnp.where(gids[None, :] < n_bank, scores, -jnp.inf)
        vals, idx = jax.lax.top_k(scores, k)
        return vals, idx + shard_id * shard_len

    vals, idx = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P("data", None)),
        out_specs=(P(None, "data"), P(None, "data")),
        check_vma=False,
    )(queries, bank)
    # (Q, n_dev*k) candidates -> global top-k
    best, pos = jax.lax.top_k(vals, k)
    return best, jnp.take_along_axis(idx, pos, axis=1)


class KNeighbors:
    """FAISS-parity exact kNN classifier (k=1 by default).

    Single-device: one matmul + top-k per query block. Multi-device
    (``shard_bank=True`` or banks too big for one chip): the bank shards
    over the ``data`` mesh axis, each shard computes a local top-k and the
    (Q, devices*k) candidate set merges with one tiny gather.
    """

    def __init__(self, k: int = 1, metric: str = "l2", use_gpu: bool = True,
                 shard_bank: Optional[bool] = None):
        del use_gpu  # parity arg; always on-device
        self.k = k
        self.metric = metric
        self.shard_bank = shard_bank
        self._bank: Optional[jax.Array] = None
        self._y: Optional[np.ndarray] = None
        self._mesh = None

    def fit(self, X: np.ndarray, y: np.ndarray):
        self._bank = jnp.asarray(np.ascontiguousarray(X, np.float32))
        self._y = np.asarray(y)
        want_shard = self.shard_bank
        if want_shard is None:
            # auto: shard when the bank is large and several devices exist
            want_shard = len(jax.devices()) > 1 and X.size * 4 > 256 * 1024 * 1024
        if want_shard and len(jax.devices()) > 1:
            from ..parallel import make_mesh

            self._mesh = make_mesh({"data": -1, "model": 1})
        return self

    def kneighbors(self, X: np.ndarray):
        n = X.shape[0]
        pad = (-n) % _QUERY_BLOCK
        Xp = np.pad(np.asarray(X, np.float32), ((0, pad), (0, 0)))
        all_idx, all_val = [], []
        for s in range(0, Xp.shape[0], _QUERY_BLOCK):
            q = jnp.asarray(Xp[s : s + _QUERY_BLOCK])
            if self._mesh is not None:
                vals, idx = _sharded_topk(q, self._bank, k=self.k, metric=self.metric,
                                          mesh=self._mesh)
            else:
                vals, idx = _topk_block(q, self._bank, k=self.k, metric=self.metric)
            all_idx.append(np.asarray(idx))
            all_val.append(np.asarray(vals))
        return np.concatenate(all_val)[:n], np.concatenate(all_idx)[:n]

    def predict(self, X: np.ndarray) -> np.ndarray:
        _, idx = self.kneighbors(X)
        votes = self._y[idx]  # (n, k)
        if self.k == 1:
            return votes[:, 0]
        # majority vote (ties -> smallest label, np.bincount argmax order)
        out = np.empty(votes.shape[0], dtype=self._y.dtype)
        for i, row in enumerate(votes):
            out[i] = np.bincount(row).argmax()
        return out
