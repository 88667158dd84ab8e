"""ZeRO-1 optimizer-state sharding over the ``data`` mesh axis.

The reference is plain DDP: every rank holds a full copy of the Adam
moments (``trainer.py:1185``; SURVEY §2.6 lists FSDP/ZeRO as absent). On a
TPU mesh the same redundancy costs 2×P float32 per chip — for ZeRO-1 each
data shard owns 1/N of every moment tensor instead, the TPU-native way:

- optimizer-state leaves are *placed* with a ``NamedSharding`` that splits
  their first ``data``-divisible dimension (rank-0 counts and odd-shaped
  leaves stay replicated);
- the jitted train step pins the updated state to the same shardings with
  ``with_sharding_constraint``, so the compiled step RETURNS the moments
  sharded (asserted from ``compiled.output_shardings`` in the tests).
  Numerics are bit-identical to the replicated update — elementwise math
  doesn't care where it runs, and the gathers are exact.

The hard guarantee is *persistent memory*: optimizer state drops from 2P
to 2P/N per chip — the enabler for training much larger variants than the
reference's 22M on the same HBM. Communication stays bounded at classic
ZeRO-1 volume (grads all-reduce + ≤1 parameter-sized gather for the
update; how the partitioner lowers that gather is backend-specific — the
CPU SPMD backend emits dynamic-slice + all-reduce rather than a literal
all-gather). The Pallas-kernel grad path of ``training/steps.py`` is
untouched: the constraint sits outside the shard_map.

Composes with tensor/expert parallelism: leaves the TP/EP rules of
``parallel/shardings.py`` already split keep their sharding; ZeRO-1 only
claims leaves that would otherwise replicate. Opt-in:
``++hardware.zero1=True`` (requires a >1 ``data`` axis).

ZeRO-3 (``++hardware.zero3=True``) extends the same mechanism to the
*parameters*: persistent HBM drops from P + 2P to (P + 2P)/N per chip
(zero3 implies the zero1 moment sharding). The train step's shard_map
takes params with ``in_specs=P()`` (replicated per shard —
``training/steps.py:_shard_map_grads``), so XLA materialises exactly one
parameter all-gather at step entry; the optimizer update itself stays
shard-local (sharded moments × sliced grads → sharded delta → sharded
params), which is precisely the ZeRO-3 communication schedule
(gather-for-forward, no gather-for-update). On a multi-slice ``dcn`` mesh
both stages shard over the intra-slice ``data`` axis only, so the
parameter gather rides ICI and only the gradient all-reduce crosses DCN.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _leaf_spec(shape, n: int, axis: str) -> P:
    """Shard the first dim divisible by the data-axis size; else replicate."""
    for d, s in enumerate(shape):
        if s >= n and s % n == 0:
            return P(*([None] * d + [axis]))
    return P()


def zero1_opt_shardings(
    opt_state: Any,
    mesh: Mesh,
    *,
    axis: str = "data",
    base: Optional[Any] = None,
) -> Any:
    """NamedSharding tree for an optax state under ZeRO-1.

    ``base``: an optional tree of NamedShardings (e.g. the TP/EP rules
    applied to the moment leaves) — leaves it already shards are kept;
    ZeRO-1 claims only the replicated remainder. Works on concrete arrays
    and on tracers/avals (only ``.shape`` is read), so the jitted step can
    compute the constraint specs at trace time.
    """
    n = int(mesh.shape.get(axis, 1))
    if base is None and any(
        int(mesh.shape.get(ax, 1)) > 1 for ax in ("model", "expert")
    ):
        # TP/EP meshes: their moment shardings take precedence (the regexes
        # of parallel/shardings.py match mu/nu paths too)
        from .shardings import param_shardings

        base = param_shardings(opt_state, mesh)

    def spec_for(leaf, base_sh=None):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        if base_sh is not None and getattr(base_sh, "spec", P()) != P():
            return base_sh
        if n <= 1 or not shape:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _leaf_spec(shape, n, axis))

    if base is not None:
        return jax.tree_util.tree_map(spec_for, opt_state, base)
    return jax.tree_util.tree_map(spec_for, opt_state)


def apply_zero1(opt_state: Any, mesh: Mesh, *, axis: str = "data",
                base: Optional[Any] = None) -> Any:
    """Place an optimizer-state pytree with its ZeRO-1 shardings."""
    shardings = zero1_opt_shardings(opt_state, mesh, axis=axis, base=base)
    return jax.tree_util.tree_map(jax.device_put, opt_state, shardings)


def constrain_zero1(opt_state: Any, mesh: Mesh, *, axis: str = "data") -> Any:
    """``with_sharding_constraint`` pinning a traced opt state to its ZeRO-1
    layout — called inside the jitted train/apply step so the updated
    moments stay sharded instead of being re-replicated by propagation."""
    shardings = zero1_opt_shardings(opt_state, mesh, axis=axis)
    return jax.tree_util.tree_map(
        jax.lax.with_sharding_constraint, opt_state, shardings
    )


# -- ZeRO-3: the same spec machinery applied to the parameter tree --------
# (params and Adam moments share leaf shapes and the TP/EP path regexes, so
# the sharding rules are literally identical — only the placement targets
# and the step-level constraint sites differ)


def zero3_param_shardings(
    params: Any, mesh: Mesh, *, axis: str = "data", base: Optional[Any] = None
) -> Any:
    """NamedSharding tree for the *parameters* under ZeRO-3."""
    return zero1_opt_shardings(params, mesh, axis=axis, base=base)


def apply_zero3(params: Any, mesh: Mesh, *, axis: str = "data",
                base: Optional[Any] = None) -> Any:
    """Place a parameter pytree with its ZeRO-3 shardings (1/N per chip)."""
    shardings = zero3_param_shardings(params, mesh, axis=axis, base=base)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def constrain_zero3(params: Any, mesh: Mesh, *, axis: str = "data") -> Any:
    """Pin traced updated params to their ZeRO-3 layout inside the jitted
    step, so the post-update parameters leave the step sharded and the only
    full-parameter materialisation is the forward gather."""
    shardings = zero3_param_shardings(params, mesh, axis=axis)
    return jax.tree_util.tree_map(
        jax.lax.with_sharding_constraint, params, shardings
    )
