"""Device mesh + sharding helpers.

Replaces the reference's three hardware modes (`~` single-GPU,
``DataParallel``, ``ddp`` — ``configs/hardware/*.yaml``,
``trainer.py:1172-1185``) with one mechanism: an N-D ``jax.sharding.Mesh``.
Data parallelism = batch sharded over the ``data`` axis; the gradient
all-reduce the reference got from DDP's backward hook
(``trainer.py:1185``) is inferred by XLA as a ``psum`` over ICI when the
loss is jitted with replicated parameter shardings.

The ``model`` axis is reserved for tensor parallelism (unused by the
reference's 22M-param models but first-class here so larger variants shard
without redesign).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_cfg: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh from a {axis: size} config; -1 = all remaining devices.

    Default is a 1-D data mesh over every visible device — the TPU
    equivalent of DDP over all local GPUs (``main.py:17-20``).

    A ``dcn`` axis (``++hardware.mesh.dcn=N``) marks the slow inter-slice
    network: data parallelism then spans ``("dcn", "data")`` jointly while
    ZeRO-1 moment sharding stays confined to the intra-slice ``data`` axis
    (parallel/zero.py), so the parameter-delta gather rides ICI and only
    the gradient all-reduce crosses DCN. ``dcn`` is forced to be the
    OUTERMOST (slowest-varying) mesh dim: ``jax.devices()`` orders devices
    process-major, so outermost splits land on process/slice boundaries;
    on real multi-slice hardware devices are additionally sorted by
    ``slice_index`` first.
    """
    devices = list(devices if devices is not None else jax.devices())
    mesh_cfg = dict(mesh_cfg or {"data": -1, "model": 1})
    if "dcn" in mesh_cfg:
        if any(getattr(d, "slice_index", None) is not None for d in devices):
            devices.sort(key=lambda d: (getattr(d, "slice_index", 0) or 0, d.id))
        mesh_cfg = {"dcn": mesh_cfg["dcn"], **{k: v for k, v in mesh_cfg.items() if k != "dcn"}}
    n = len(devices)
    fixed = 1
    wildcard_axis = None
    for axis, size in mesh_cfg.items():
        if size == -1:
            if wildcard_axis is not None:
                raise ValueError("Only one mesh axis may be -1")
            wildcard_axis = axis
        else:
            fixed *= size
    if wildcard_axis is not None:
        if n % fixed != 0:
            raise ValueError(f"{n} devices not divisible by fixed axes {fixed}")
        mesh_cfg[wildcard_axis] = n // fixed
    shape = tuple(mesh_cfg.values())
    total = int(np.prod(shape))
    if total > n:
        raise ValueError(f"Mesh {mesh_cfg} needs {total} devices, have {n}")
    # an explicit mesh smaller than the host's device count uses a prefix
    # subset (e.g. pinning a debug run to one chip of a multi-chip host)
    dev_array = np.asarray(devices[:total]).reshape(shape)
    return Mesh(dev_array, tuple(mesh_cfg.keys()))


def dp_axes(mesh: Optional[Mesh]):
    """The data-parallel axis name(s): ``("dcn", "data")`` when a >1 DCN
    axis exists (multi-slice), else ``"data"``. Every shard_map/pmean that
    implements data parallelism takes its axis argument from here."""
    if mesh is not None and dict(mesh.shape).get("dcn", 1) > 1:
        return ("dcn", "data")
    return "data"


def dp_size(mesh: Optional[Mesh]) -> int:
    """Total data-parallel shard count (dcn × data)."""
    if mesh is None:
        return 1
    shape = dict(mesh.shape)
    return int(shape.get("dcn", 1)) * int(shape.get("data", 1))


def batch_sharding(mesh: Mesh, *, axis=None) -> NamedSharding:
    """Leading-dim (batch) sharding over the data-parallel axes."""
    return NamedSharding(mesh, P(axis if axis is not None else dp_axes(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, *, axis=None) -> Any:
    """Place a host batch pytree on the mesh, sharded along dim 0.

    Scalars / rank-0 leaves are replicated (e.g. per-batch PRNG keys).

    Multi-host: each process passes its HOST-LOCAL batch (the loaders stride
    the dataset per host, ``data/loaders.py``) and the global array is the
    concatenation over processes — the reference's DDP semantics, where
    ``train.batch_size`` is the per-rank size (``dataset_utils.py:502-598``).
    """
    data_sh = batch_sharding(mesh, axis=axis)
    repl = replicated_sharding(mesh)
    multihost = jax.process_count() > 1

    def place(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        if getattr(x, "ndim", 0) == 0:
            return jax.device_put(x, repl)
        if multihost:
            return jax.make_array_from_process_local_data(data_sh, np.asarray(x))
        return jax.device_put(x, data_sh)

    return jax.tree_util.tree_map(place, batch)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Replicate a parameter pytree across the mesh (pure data parallelism)."""
    repl = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), params)
