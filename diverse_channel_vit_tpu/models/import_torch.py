"""Import the reference's torch checkpoints into this framework.

The exact inverse of :mod:`.export` (flax -> reference ``state_dict``),
completing the migration loop for the ChannelVisionTransformer family
(``dichavit`` / ``channelvit_adapt``): a user who already trained the
PyTorch reference can bring those weights here and serve or fine-tune
them on TPU.

Accepted inputs (all producing the same flax tree):

- the reference trainer's checkpoint dict — ``{"model_params": state_dict,
  "epoch", "accuracy", ...}`` as written by ``torch.save`` at
  ``/root/reference/trainer.py:1292-1306``;
- a bare ``model.state_dict()``;
- either of the above with ``module.``-prefixed keys (DataParallel/DDP
  training — the reference remaps these too, ``trainer.py:1313-1317``).

Per-tensor mapping (see :mod:`.export` for the forward direction):

- ``patch_embed.proj.weight (D,1,1,p,p)`` -> ``proj_kernel (p*p, D)``
- fused ``attn.qkv.weight`` rows ``[q | k | v]`` -> three Dense kernels
  ``wq/wk/wv`` (transposed) — the lane-packed Pallas attention consumes
  each GEMM's natural layout;
- LayerNorm ``weight/bias`` -> ``scale/bias``; every Linear ``weight`` ->
  transposed ``kernel``;
- wrapper extras (``proxies``, ``logit_scale``, the reference's misspelled
  ``classifer_head``) -> the :class:`..models.wrappers
  .ChannelAdaptiveClassifier` tree.

Both block layouts are produced: unrolled ``block_{i}`` modules (default)
and the ``scan_blocks`` stacked layout (leaves stacked on a leading depth
axis under ``blocks/block``).
"""

from __future__ import annotations

import types
from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = [
    "strip_module_prefix",
    "channelvit_params_from_state_dict",
    "load_reference_checkpoint",
    "merge_into_template",
    "validate_against_template",
]


def strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Drop the ``module.`` prefix DataParallel/DDP wrappers add
    (reference ``trainer.py:1313-1317`` does the same on load)."""
    if sd and all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch here
        x = x.detach().cpu().numpy()
    # copy=True: never return a view of live torch parameter storage (a
    # later in-place torch update would mutate the imported tree through
    # the CPU backend's zero-copy device_put)
    return np.array(x, dtype=np.float32, copy=True)


def _block_params(sd: Dict[str, Any], r: str, d_model: int) -> Dict[str, Any]:
    w_qkv = _np(sd[r + "attn.qkv.weight"])  # (3D, D), rows [q | k | v]
    attn: Dict[str, Any] = {
        "wq": {"kernel": w_qkv[:d_model].T},
        "wk": {"kernel": w_qkv[d_model:2 * d_model].T},
        "wv": {"kernel": w_qkv[2 * d_model:].T},
        "proj": {"kernel": _np(sd[r + "attn.proj.weight"]).T,
                 "bias": _np(sd[r + "attn.proj.bias"])},
    }
    if r + "attn.qkv.bias" in sd:  # qkv_bias=True in every reference factory
        b_qkv = _np(sd[r + "attn.qkv.bias"])
        attn["wq"]["bias"] = b_qkv[:d_model]
        attn["wk"]["bias"] = b_qkv[d_model:2 * d_model]
        attn["wv"]["bias"] = b_qkv[2 * d_model:]
    return {
        "norm1": {"scale": _np(sd[r + "norm1.weight"]), "bias": _np(sd[r + "norm1.bias"])},
        "norm2": {"scale": _np(sd[r + "norm2.weight"]), "bias": _np(sd[r + "norm2.bias"])},
        "attn": attn,
        "mlp": {
            "fc1": {"kernel": _np(sd[r + "mlp.fc1.weight"]).T,
                    "bias": _np(sd[r + "mlp.fc1.bias"])},
            "fc2": {"kernel": _np(sd[r + "mlp.fc2.weight"]).T,
                    "bias": _np(sd[r + "mlp.fc2.bias"])},
        },
    }


def channelvit_params_from_state_dict(
    sd: Dict[str, Any],
    *,
    prefix: str = "feature_extractor.",
    scan_layout: bool = False,
) -> Dict[str, Any]:
    """Reference ``state_dict`` -> flax param tree (numpy leaves, f32).

    Returns the trainer-level wrapper tree (``{"backbone": ..., "proxies",
    ["logit_scale"], ["classifier_head"]}``) when the state dict carries the
    DiChaViT wrapper extras, else the bare ChannelVisionTransformer tree.
    ``prefix`` is the attribute the torch wrapper mounts the backbone on
    (auto-dropped when the state dict is a bare backbone).
    """
    sd = strip_module_prefix(sd)
    if prefix and not any(k.startswith(prefix) for k in sd):
        prefix = ""

    pw = _np(sd[prefix + "patch_embed.proj.weight"])  # (D, 1, 1, p, p)
    d_model = pw.shape[0]
    bb: Dict[str, Any] = {
        "proj_kernel": pw.reshape(d_model, -1).T,  # (p*p, D), row-major pixels
        "proj_bias": _np(sd[prefix + "patch_embed.proj.bias"]),
        "channel_embed": _np(sd[prefix + "patch_embed.channel_embed.weight"]),
        "cls_token": _np(sd[prefix + "cls_token"]),
        "pos_embed": _np(sd[prefix + "pos_embed"]),
        "norm": {"scale": _np(sd[prefix + "norm.weight"]),
                 "bias": _np(sd[prefix + "norm.bias"])},
    }
    if prefix + "patch_embed.channel_emb_proxies" in sd:  # CDL table (dichavit.py:62)
        bb["channel_emb_proxies"] = _np(sd[prefix + "patch_embed.channel_emb_proxies"])

    depths = [int(k[len(prefix) + len("blocks."):].split(".")[0])
              for k in sd if k.startswith(prefix + "blocks.")]
    if not depths:
        raise ValueError(f"no '{prefix}blocks.*' entries — not a "
                         "ChannelVisionTransformer-family state dict")
    depth = 1 + max(depths)
    blocks = [_block_params(sd, f"{prefix}blocks.{i}.", d_model) for i in range(depth)]
    if scan_layout:
        import jax

        bb["blocks"] = {"block": jax.tree_util.tree_map(
            lambda *leaves: np.stack(leaves, axis=0), *blocks)}
    else:
        for i, blk in enumerate(blocks):
            bb[f"block_{i}"] = blk

    wrapper_keys = {"proxies", "logit_scale", "classifer_head.weight"}
    if not (wrapper_keys & set(sd)):
        return bb
    params: Dict[str, Any] = {"backbone": bb}
    if "proxies" in sd:
        params["proxies"] = _np(sd["proxies"])
    if "logit_scale" in sd:
        params["logit_scale"] = _np(sd["logit_scale"])
    if "classifer_head.weight" in sd:  # the reference attribute is misspelled
        params["classifier_head"] = {
            "kernel": _np(sd["classifer_head.weight"]).T,
            "bias": _np(sd["classifer_head.bias"]),
        }
    return params


class _Opaque:
    """Stand-in for unimportable pickled classes (the reference checkpoint
    embeds its omegaconf config — metadata we only read opportunistically)."""

    def __init__(self, *a, **k):
        pass

    def __setstate__(self, state):
        pass


def _torch_load_tolerant(path: str):
    """``torch.load`` that survives the reference checkpoint's pickled
    omegaconf config when the lib is absent: unimportable globals resolve
    to an opaque placeholder; the tensors are plain torch objects."""
    import pickle

    import torch

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            try:
                return super().find_class(module, name)
            except (ModuleNotFoundError, AttributeError):
                return type(name, (_Opaque,), {})

    shim = types.ModuleType("_import_torch_pickle_shim")
    shim.Unpickler = _Unpickler
    shim.load = pickle.load
    shim.loads = pickle.loads
    return torch.load(path, map_location="cpu", pickle_module=shim,
                      weights_only=False)


def load_reference_checkpoint(
    path_or_dict,
    *,
    prefix: str = "feature_extractor.",
    scan_layout: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference checkpoint (path or already-loaded dict) -> (flax params,
    meta). ``meta`` carries whatever bookkeeping the checkpoint had
    ({epoch, accuracy} when present; {} for a bare state dict)."""
    obj = path_or_dict
    if isinstance(obj, str):
        obj = _torch_load_tolerant(obj)
    meta: Dict[str, Any] = {}
    sd = obj
    if isinstance(obj, dict) and "model_params" in obj:  # trainer.py:1292-1306 dict
        sd = obj["model_params"]
        for k in ("epoch", "accuracy"):
            if obj.get(k) is not None:
                try:
                    meta[k] = float(obj[k]) if k == "accuracy" else int(obj[k])
                except (TypeError, ValueError):
                    pass
    params = channelvit_params_from_state_dict(sd, prefix=prefix, scan_layout=scan_layout)
    return params, meta


def merge_into_template(template, imported):
    """Overlay imported leaves onto the model's own init tree.

    Leaves present in both trees with matching shapes are taken from the
    checkpoint (cast to the template leaf's dtype); everything else keeps
    its fresh initialization — the warm-start semantics for fine-tuning a
    reference checkpoint on a task with a different head/proxy width.

    Returns ``(merged, imported_paths, kept_paths)`` so callers can report
    exactly what was loaded.
    """
    imported_paths: list = []
    kept_paths: list = []

    def shape_of(x):
        return tuple(getattr(x, "shape", None) or np.shape(x))

    def rec(t, i, path):
        if isinstance(t, dict):
            sub = i if isinstance(i, dict) else {}
            return {k: rec(v, sub.get(k), path + (k,)) for k, v in t.items()}
        name = "/".join(path)
        if i is None or shape_of(i) != shape_of(t):
            kept_paths.append(name)
            return t
        imported_paths.append(name)
        dtype = getattr(t, "dtype", np.float32)
        return np.asarray(i, dtype=dtype)

    merged = rec(template, imported, ())
    return merged, imported_paths, kept_paths


def validate_against_template(template, imported) -> None:
    """Raise with a readable diff when the imported tree does not match the
    model's own init structure/shapes (catches config/checkpoint mismatches
    — wrong depth, width, channel vocabulary — before any compile)."""
    import jax

    t_leaves = {"/".join(str(getattr(k, "key", k)) for k in p): l.shape
                for p, l in jax.tree_util.tree_flatten_with_path(template)[0]}
    i_leaves = {"/".join(str(getattr(k, "key", k)) for k in p): np.shape(l)
                for p, l in jax.tree_util.tree_flatten_with_path(imported)[0]}
    problems = []
    for k in sorted(set(t_leaves) | set(i_leaves)):
        if k not in i_leaves:
            problems.append(f"missing from checkpoint: {k} {t_leaves[k]}")
        elif k not in t_leaves:
            problems.append(f"unexpected in checkpoint: {k} {i_leaves[k]}")
        elif tuple(t_leaves[k]) != tuple(i_leaves[k]):
            problems.append(f"shape mismatch {k}: model {t_leaves[k]} vs "
                            f"checkpoint {i_leaves[k]}")
    if problems:
        raise ValueError("imported checkpoint does not fit the configured model:\n  "
                         + "\n  ".join(problems))
