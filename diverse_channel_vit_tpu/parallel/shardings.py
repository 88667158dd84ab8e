"""Tensor-parallel parameter shardings (Megatron pattern).

The reference is data-parallel only (SURVEY §2.6), but this framework is
built for scale: when the mesh has a non-trivial ``model`` axis, attention
QKV / MLP-up kernels shard their *output* features and proj / MLP-down
kernels their *input* features, so each block computes a column-parallel ->
row-parallel pair and XLA's GSPMD inserts exactly one all-reduce per pair
over ICI. Everything else (embeddings, norms, proxies) replicates.

With ``model=1`` (the default and every reference recipe) this is a no-op.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# column-parallel: shard output features (last dim)
_COL_PATTERNS = (r"/qkv/kernel$", r"/w[qkv]/kernel$", r"/fc1/kernel$", r"/wq1/kernel$", r"/to_qkv/kernel$")
# row-parallel: shard input features (first dim)
_ROW_PATTERNS = (r"/proj/kernel$", r"/fc2/kernel$", r"/wq2/kernel$", r"/to_out/kernel$")
# biases of column-parallel layers shard with the outputs
_COL_BIAS_PATTERNS = (r"/qkv/bias$", r"/w[qkv]/bias$", r"/fc1/bias$")
# expert-parallel: the per-GLOBAL-channel parameter tables are this model
# family's "experts" (channel embeddings, proxies, depthwise kernel banks,
# hypernet z embeddings, template coefficients — all indexed by global
# channel id, CLAUDE invariant: lookups are gathers, never weight surgery).
# Their leading C_total dim shards over an "expert" axis so a large channel
# vocabulary (e.g. hyperspectral) scales memory across chips; the per-step
# gather of the k sampled rows is the only collective this adds.
_EXPERT_PATTERNS = (
    r"/channel_embed$",
    r"/channel_emb_proxies$",
    r"/depthwise_bank$",
    r"/channel_weights$",
    r"/conv1_emb$",
    r"/conv1_coefs$",
)


def _path_str(path) -> str:
    return "/" + "/".join(str(getattr(p, "key", p)) for p in path)


def param_shardings(params: Any, mesh: Mesh, *, axis: str = "model",
                    expert_axis: str = "expert") -> Any:
    """NamedSharding tree for the params: TP/EP split where profitable."""
    tp = mesh.shape.get(axis, 1)
    ep = mesh.shape.get(expert_axis, 1)

    def spec_for(path, leaf) -> NamedSharding:
        if (tp <= 1 and ep <= 1) or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        p = _path_str(path)
        if ep > 1 and any(re.search(pat, p) for pat in _EXPERT_PATTERNS):
            if leaf.shape[0] % ep == 0:
                return NamedSharding(
                    mesh, P(*([expert_axis] + [None] * (leaf.ndim - 1))))
        if tp > 1 and leaf.ndim >= 2:
            if any(re.search(pat, p) for pat in _COL_PATTERNS) and leaf.shape[-1] % tp == 0:
                return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1) + [axis])))
            if any(re.search(pat, p) for pat in _ROW_PATTERNS) and leaf.shape[0] % tp == 0:
                return NamedSharding(mesh, P(*([axis] + [None] * (leaf.ndim - 1))))
        if tp > 1 and leaf.ndim == 1 and any(re.search(pat, p) for pat in _COL_BIAS_PATTERNS):
            if leaf.shape[0] % tp == 0:
                return NamedSharding(mesh, P(axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def apply_param_shardings(params: Any, mesh: Mesh, *, axis: str = "model",
                          expert_axis: str = "expert") -> Any:
    shardings = param_shardings(params, mesh, axis=axis, expert_axis=expert_axis)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
