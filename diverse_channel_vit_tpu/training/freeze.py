"""Parameter freezing / selective training.

Counterpart of the reference's freeze helpers (``model_utils.py:21-42``) and
the config knobs consumed by the Trainer:

- ``model.freeze_other`` — train only the adaptive interface (the
  channel-specific first-layer parameters), freeze the shared trunk.
- ``model.unfreeze_last_n_layers`` (-1 = all) — train only the last n
  transformer blocks + final norm + heads/proxies (plus the interface when
  ``model.unfreeze_first_layer``).

Implemented as an optax ``multi_transform`` over a label pytree — the
frozen partition gets ``set_to_zero`` updates, so the optimizer state for
frozen params stays empty and checkpoints keep a single tree.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

# channel-specific first-layer ("adaptive interface") parameter names across
# the zoo: ChannelViT/DiChaViT/DepthwiseViT embeds + banks, HyperViT z-embs,
# template coefs, ConvNeXt stems (SURVEY §2.3/2.4)
INTERFACE_PATTERNS = (
    r"channel_embed", r"channel_emb_proxies", r"proj_kernel", r"proj_bias",
    r"proj_bank", r"depthwise_bank", r"conv1_emb", r"conv1_coefs",
    r"conv1_param_bank", r"conv1depthwise_param_bank", r"hypernet",
    r"stem_conv", r"stem_bias", r"patch_emb", r"weighted_sum_pooling",
    r"class_emb", r"attn_pooling",
)
HEAD_PATTERNS = (r"proxies", r"classifier_head", r"logit_scale", r"(^|/)norm(/|$)", r"miro_encoders")


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def build_trainable_labels(
    params: Any,
    *,
    freeze_other: bool = False,
    unfreeze_last_n_layers: int = -1,
    unfreeze_first_layer: bool = True,
    depth: Optional[int] = None,
) -> Any:
    """Label pytree: "train" / "freeze" per leaf."""

    def is_interface(p: str) -> bool:
        return any(re.search(pat, p) for pat in INTERFACE_PATTERNS)

    def is_head(p: str) -> bool:
        return any(re.search(pat, p) for pat in HEAD_PATTERNS)

    def block_index(p: str) -> Optional[int]:
        m = re.search(r"block_(\d+)", p)
        return int(m.group(1)) if m else None

    def is_scanned_block(p: str) -> bool:
        # model.scan_blocks=True stacks all blocks under blocks/block/...
        # with a leading depth axis (models/vit.py BlockStack)
        return bool(re.search(r"(^|/)blocks/block(/|$)", p))

    max_block = -1
    has_scanned = False
    for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        p = _path_str(path)
        bi = block_index(p)
        if bi is not None:
            max_block = max(max_block, bi)
        has_scanned = has_scanned or is_scanned_block(p)
    total_depth = depth if depth is not None else max_block + 1
    if (
        unfreeze_last_n_layers is not None
        and unfreeze_last_n_layers >= 0
        and not freeze_other
        and max_block < 0
        and not has_scanned
    ):
        raise ValueError(
            "unfreeze_last_n_layers >= 0 but no transformer blocks found in the "
            "param tree — freezing would silently cover every block"
        )

    def label(path, leaf):
        p = _path_str(path)
        if freeze_other:
            return "train" if is_interface(p) or is_head(p) else "freeze"
        if unfreeze_last_n_layers is not None and unfreeze_last_n_layers >= 0:
            if is_scanned_block(p):
                # stacked leaves can't be split by a per-leaf label; a
                # depth-sliced update mask handles them (masked_optimizer)
                return "train_stack" if unfreeze_last_n_layers > 0 else "freeze"
            bi = block_index(p)
            if bi is not None:
                return "train" if bi >= total_depth - unfreeze_last_n_layers else "freeze"
            if is_interface(p):
                return "train" if unfreeze_first_layer else "freeze"
            return "train" if is_head(p) else "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def _mask_stacked_depth(unfreeze_last_n: int) -> optax.GradientTransformation:
    """Zero updates for depth slices < D - n on stacked ``blocks/block``
    leaves (leading axis = depth). Params of frozen slices never move —
    the functional equivalent of requires_grad=False per block."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        def f(u):
            d = u.shape[0]
            keep = jnp.arange(d) >= d - unfreeze_last_n
            return u * keep.reshape((d,) + (1,) * (u.ndim - 1)).astype(u.dtype)

        return jax.tree_util.tree_map(f, updates), state

    return optax.GradientTransformation(init, update)


def masked_optimizer(
    tx: optax.GradientTransformation, labels: Any, *, unfreeze_last_n_layers: int = 0
) -> optax.GradientTransformation:
    """Apply ``tx`` to "train" leaves, zero updates for "freeze" leaves;
    "train_stack" leaves (scanned block stacks) get ``tx`` followed by a
    per-depth mask keeping only the last n layers' updates."""
    flat = set(jax.tree_util.tree_leaves(labels))
    if flat == {"train"}:
        return tx
    transforms = {"train": tx, "freeze": optax.set_to_zero()}
    if "train_stack" in flat:
        transforms["train_stack"] = optax.chain(
            tx, _mask_stacked_depth(max(0, int(unfreeze_last_n_layers)))
        )
    return optax.multi_transform(transforms, labels)
