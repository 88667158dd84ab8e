"""Orbax checkpointing.

Counterpart of the reference's ``torch.save`` dict {epoch, accuracy, config,
optimizer, model, scheduler, scaler, datetime} (``trainer.py:1292-1306``) and
``_load_model`` (:1308-1328). The TrainState pytree (params + optimizer state
+ step) is saved with Orbax; config and bookkeeping ride along as JSON
metadata. No ``module.``-prefix remapping is needed — sharding is not encoded
in parameter names.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def save_checkpoint(
    directory: str,
    state,
    *,
    epoch: int,
    accuracy: float = 0.0,
    config: Optional[dict] = None,
    name: str = "model_last",
) -> str:
    path = os.path.abspath(os.path.join(directory, name))
    os.makedirs(directory, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    # fully materialize on host before save (works for sharded arrays too)
    tree = {"params": state.params, "opt_state": state.opt_state, "step": state.step,
            "base_rng": state.base_rng}
    ckpt.save(path, tree, force=True)
    ckpt.wait_until_finished()
    meta = {"epoch": int(epoch), "accuracy": float(accuracy), "config": config or {}}
    with open(os.path.join(directory, f"{name}.meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def load_checkpoint(directory: str, state, *, name: str = "model_last") -> Tuple[Any, int]:
    """Restore into the structure of ``state``; returns (state, epoch)."""
    path = os.path.abspath(os.path.join(directory, name))
    ckpt = ocp.StandardCheckpointer()
    template = {"params": state.params, "opt_state": state.opt_state, "step": state.step,
                "base_rng": state.base_rng}
    restored = ckpt.restore(path, template)
    meta_path = os.path.join(directory, f"{name}.meta.json")
    epoch = 0
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            epoch = int(json.load(f).get("epoch", 0))
    new_state = state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        base_rng=restored["base_rng"],
    )
    return new_state, epoch
