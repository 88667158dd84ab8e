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


_ASYNC_CKPTR: dict = {}


def _async_checkpointer():
    """Process-wide AsyncCheckpointer: serializes to host synchronously,
    writes to disk on a background thread so the train loop keeps running
    through the save (``train.async_checkpoint=True``)."""
    if "c" not in _ASYNC_CKPTR:
        _ASYNC_CKPTR["c"] = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR["c"]


def wait_for_checkpoints() -> None:
    """Block until every in-flight async save has committed. Call before
    process exit and before any load of a just-saved checkpoint."""
    if "c" in _ASYNC_CKPTR:
        _ASYNC_CKPTR["c"].wait_until_finished()


def save_checkpoint(
    directory: str,
    state,
    *,
    epoch: int,
    accuracy: float = 0.0,
    config: Optional[dict] = None,
    name: str = "model_last",
    wait: bool = True,
    extra_meta: Optional[dict] = None,
) -> str:
    path = os.path.abspath(os.path.join(directory, name))
    os.makedirs(directory, exist_ok=True)
    # fully materialize on host before save (works for sharded arrays too)
    tree = {"params": state.params, "opt_state": state.opt_state, "step": state.step,
            "base_rng": state.base_rng}
    if wait:
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path, tree, force=True)
        ckpt.wait_until_finished()
    else:
        # the previous save to the same path must have committed first
        # (orbax writes to a tmp dir and renames, so `path` only ever
        # holds complete checkpoints)
        ckpt = _async_checkpointer()
        ckpt.wait_until_finished()
        ckpt.save(path, args=ocp.args.StandardSave(tree), force=True)
    meta = {"epoch": int(epoch), "accuracy": float(accuracy), "config": config or {}}
    if extra_meta:
        meta.update(extra_meta)
    with open(os.path.join(directory, f"{name}.meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def load_meta(directory: str, name: str = "model_last") -> dict:
    """The sidecar JSON written by :func:`save_checkpoint` ({} if absent)."""
    meta_path = os.path.join(directory, f"{name}.meta.json")
    if not os.path.exists(meta_path):
        return {}
    with open(meta_path) as f:
        return json.load(f)


def save_tree(directory: str, name: str, tree) -> str:
    """Save a bare pytree (e.g. the SWA running average riding along a
    preemption checkpoint) next to the main state."""
    path = os.path.abspath(os.path.join(directory, name))
    os.makedirs(directory, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, tree, force=True)
    ckpt.wait_until_finished()
    return path


def load_tree(directory: str, name: str, template):
    """Restore a pytree saved by :func:`save_tree` into ``template``'s
    structure; returns None when no such checkpoint exists."""
    path = os.path.abspath(os.path.join(directory, name))
    if not os.path.isdir(path):
        return None
    return ocp.StandardCheckpointer().restore(path, template)


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
