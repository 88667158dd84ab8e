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
HEAD_PATTERNS = (r"proxies", r"classifier_head", r"logit_scale", r"(^|/)norm(/|$)", r"miro_var_b")


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

    max_block = -1
    for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        bi = block_index(_path_str(path))
        if bi is not None:
            max_block = max(max_block, bi)
    total_depth = depth if depth is not None else max_block + 1

    def label(path, leaf):
        p = _path_str(path)
        if freeze_other:
            return "train" if is_interface(p) or is_head(p) else "freeze"
        if unfreeze_last_n_layers is not None and unfreeze_last_n_layers >= 0:
            bi = block_index(p)
            if bi is not None:
                return "train" if bi >= total_depth - unfreeze_last_n_layers else "freeze"
            if is_interface(p):
                return "train" if unfreeze_first_layer else "freeze"
            return "train" if is_head(p) else "freeze"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def masked_optimizer(tx: optax.GradientTransformation, labels: Any) -> optax.GradientTransformation:
    """Apply ``tx`` to "train" leaves, zero updates for "freeze" leaves."""
    flat = set(jax.tree_util.tree_leaves(labels))
    if flat == {"train"}:
        return tx
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )
