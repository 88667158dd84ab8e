"""Export trained flax params to the reference's torch checkpoint format.

Completes the weight-interchange story: ``models/convnext.py`` imports
timm-layout torch weights into this framework; this module goes the other
way, so a user of the PyTorch reference can evaluate or fine-tune weights
trained here. Targets the ChannelVisionTransformer family — the trainer
trees of ``dichavit`` / ``channelvit_adapt`` (backbone + class proxies +
optional classifier head + optional learnable temperature), matching the
reference module layout of ``DiChaViT`` (``dichavit.py:748-812``:
``feature_extractor`` + ``proxies`` + ``classifer_head`` [sic] +
``logit_scale``) and the checkpoint dict written by
``trainer.py:1292-1306`` (``model_params`` / ``epoch`` / ``accuracy`` /
``config`` / ``datetime``; optimizer/scheduler/scaler slots left ``None``
— torch cannot consume an optax state).

The per-tensor mapping is the exact inverse of the transplant used by the
golden parity tests (tests/test_reference_parity.py), which pin this
layout against the reference forward:

- ``proj_kernel (p*p, D)``      -> ``patch_embed.proj.weight (D, 1, 1, p, p)``
- ``attn.{wq,wk,wv}.kernel.T``  -> rows ``[q | k | v]`` of ``attn.qkv.weight``
  (the reference fuses qkv in one Linear; we keep three projections so the
  lane-packed Pallas kernel sees each GEMM's natural layout)
- LayerNorm ``scale``/``bias``  -> ``weight``/``bias``
- every Dense ``kernel``        -> transposed ``weight``

Both block layouts export identically: the unrolled ``block_{i}`` modules
and the ``scan_blocks`` stacked layout (``blocks/block`` leaves with a
leading depth axis, de-stacked here).
"""

from __future__ import annotations

import datetime
import math
from collections import OrderedDict
from typing import Any, Dict, Optional

import numpy as np

__all__ = [
    "channelvit_model_params",
    "save_reference_checkpoint",
]


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _block_state(out: "OrderedDict[str, np.ndarray]", prefix: str, blk: Dict[str, Any]):
    """One transformer block -> reference ``blocks.{i}.*`` entries."""
    attn = blk["attn"]
    w_qkv = np.concatenate(
        [_np(attn["wq"]["kernel"]).T, _np(attn["wk"]["kernel"]).T, _np(attn["wv"]["kernel"]).T],
        axis=0,
    )
    out[prefix + "norm1.weight"] = _np(blk["norm1"]["scale"])
    out[prefix + "norm1.bias"] = _np(blk["norm1"]["bias"])
    out[prefix + "attn.qkv.weight"] = w_qkv
    if "bias" in attn["wq"]:
        out[prefix + "attn.qkv.bias"] = np.concatenate(
            [_np(attn["wq"]["bias"]), _np(attn["wk"]["bias"]), _np(attn["wv"]["bias"])]
        )
    out[prefix + "attn.proj.weight"] = _np(attn["proj"]["kernel"]).T
    out[prefix + "attn.proj.bias"] = _np(attn["proj"]["bias"])
    out[prefix + "norm2.weight"] = _np(blk["norm2"]["scale"])
    out[prefix + "norm2.bias"] = _np(blk["norm2"]["bias"])
    out[prefix + "mlp.fc1.weight"] = _np(blk["mlp"]["fc1"]["kernel"]).T
    out[prefix + "mlp.fc1.bias"] = _np(blk["mlp"]["fc1"]["bias"])
    out[prefix + "mlp.fc2.weight"] = _np(blk["mlp"]["fc2"]["kernel"]).T
    out[prefix + "mlp.fc2.bias"] = _np(blk["mlp"]["fc2"]["bias"])


def channelvit_model_params(
    params: Dict[str, Any], *, prefix: str = "feature_extractor."
) -> "OrderedDict[str, np.ndarray]":
    """Flax param tree -> reference ``model.state_dict()`` (numpy values).

    Accepts either the trainer's full tree (``{"backbone": ..., "proxies",
    ["logit_scale"], ["classifier_head"]}``) or a bare
    ChannelVisionTransformer tree. ``prefix`` is the attribute the torch
    wrapper mounts the backbone on (``feature_extractor.`` for DiChaViT /
    ChannelViTAdapt).
    """
    bb = params.get("backbone", params)
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()

    pk = _np(bb["proj_kernel"])  # (p*p, D)
    p = int(math.isqrt(pk.shape[0]))
    if p * p != pk.shape[0]:
        raise ValueError(f"proj_kernel rows {pk.shape[0]} is not a square patch")
    d_model = pk.shape[1]
    out[prefix + "patch_embed.proj.weight"] = pk.T.reshape(d_model, 1, 1, p, p)
    out[prefix + "patch_embed.proj.bias"] = _np(bb["proj_bias"])
    out[prefix + "patch_embed.channel_embed.weight"] = _np(bb["channel_embed"])
    if "channel_emb_proxies" in bb:  # CDL table lives on the patch embed (dichavit.py:62)
        out[prefix + "patch_embed.channel_emb_proxies"] = _np(bb["channel_emb_proxies"])
    out[prefix + "cls_token"] = _np(bb["cls_token"])
    out[prefix + "pos_embed"] = _np(bb["pos_embed"])

    if "blocks" in bb:  # scan_blocks stacked layout: blocks/block, leading depth axis
        import jax

        stacked = bb["blocks"]["block"]
        depth = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        for i in range(depth):
            blk = jax.tree_util.tree_map(lambda leaf: np.asarray(leaf)[i], stacked)
            _block_state(out, f"{prefix}blocks.{i}.", blk)
    else:
        depth = 1 + max(
            int(k.split("_")[1]) for k in bb if k.startswith("block_")
        )
        for i in range(depth):
            _block_state(out, f"{prefix}blocks.{i}.", bb[f"block_{i}"])

    out[prefix + "norm.weight"] = _np(bb["norm"]["scale"])
    out[prefix + "norm.bias"] = _np(bb["norm"]["bias"])

    if "backbone" in params:  # trainer-level wrapper extras
        if "proxies" in params:
            out["proxies"] = _np(params["proxies"])
            # the reference registers the proxies a second time through
            # adaptive_interface = nn.ParameterList([proxies]) (dichavit.py:812)
            out["adaptive_interface.0"] = out["proxies"]
        if "logit_scale" in params:
            out["logit_scale"] = _np(params["logit_scale"])
        if "classifier_head" in params:
            head = params["classifier_head"]
            # the reference attribute is misspelled "classifer_head"
            out["classifer_head.weight"] = _np(head["kernel"]).T
            out["classifer_head.bias"] = _np(head["bias"])
    return out


def save_reference_checkpoint(
    path: str,
    params: Dict[str, Any],
    *,
    epoch: int = 0,
    accuracy: Optional[float] = None,
    config: Optional[dict] = None,
    prefix: str = "feature_extractor.",
) -> str:
    """Write a torch checkpoint the reference's ``_load_model``
    (``trainer.py:1308-1328``) accepts for its model weights."""
    import torch

    sd = channelvit_model_params(params, prefix=prefix)
    torch.save(
        {
            "epoch": int(epoch),
            "accuracy": accuracy,
            "config": config,
            "optimizer_params": None,
            "model_params": OrderedDict(
                # ascontiguousarray promotes 0-d to (1,) — reshape back so
                # scalar params (logit_scale) keep the reference's own shape
                (k, torch.from_numpy(np.ascontiguousarray(v).copy()).reshape(v.shape))
                for k, v in sd.items()
            ),
            "scheduler_params": None,
            "scaler_params": None,
            "datetime": datetime.datetime.now().isoformat(),
        },
        path,
    )
    return path
