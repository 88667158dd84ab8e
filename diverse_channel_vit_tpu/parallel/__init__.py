"""Parallelism: device meshes, shardings, collectives.

The reference's distributed layer is NCCL DDP / DataParallel
(``main.py:17-20``, ``trainer.py:1172-1185``). The TPU-native equivalent is
a `jax.sharding.Mesh` with jit-inferred XLA collectives: batch sharded over
the ``data`` axis, parameters replicated (with an optional ``model`` axis
reserved for tensor parallelism of larger variants).
"""

from .mesh import (
    batch_sharding,
    dp_axes,
    dp_size,
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_params,
)
from .pipeline import pipeline_apply
from .sequence import seq_parallel_apply
from .shardings import apply_param_shardings, param_shardings
from .zero import (
    apply_zero1,
    apply_zero3,
    constrain_zero1,
    constrain_zero3,
    zero1_opt_shardings,
    zero3_param_shardings,
)

__all__ = [
    "apply_zero1",
    "apply_zero3",
    "constrain_zero1",
    "constrain_zero3",
    "zero1_opt_shardings",
    "zero3_param_shardings",
    "make_mesh",
    "batch_sharding",
    "dp_axes",
    "dp_size",
    "replicated_sharding",
    "shard_batch",
    "shard_params",
    "param_shardings",
    "apply_param_shardings",
    "seq_parallel_apply",
    "pipeline_apply",
]
