"""MIRO: mutual-information regularization with intermediate features.

Faithful port of the reference mechanism (``models/model_utils.py:94-141``,
``trainer.py:170-208, 885-910``):

- **Taps**: a list of intermediate features per forward. The reference's
  ``get_shapes`` expects models to return ``(out, feats)``; no model in the
  reference tree actually does (its MIRO models were never committed), so
  the natural reading is used here: every transformer block output
  (``block_i``, (B, N, D)) / ConvNeXt block output ((B, H, W, C) — flax is
  NHWC where torch is NCHW). Captured with flax ``capture_intermediates``,
  no model changes needed.
- **MeanEncoder** = identity; **VarianceEncoder** = bias-only diagonal
  covariance per tap: ``var = softplus(b) + eps`` with
  ``b0 = softplus^{-1}(0.1 - eps)`` and channelwise shape
  ((1,1,D) for 3D taps, (1,1,1,C) for 4D) — ``model_utils.py:105-127``.
- **Loss** (``trainer.py:898-910``): per tap
  ``vlb = mean((f - pre_f)^2 / var + log var) / 2`` against the frozen
  init-time pre-featurizer's taps, summed over taps, scaled by
  ``train.miro_ld``.
- Encoder biases live under ``state.params["miro_encoders"]`` (outside the
  model's own tree) and train at ``lr * train.miro_lr_mult``
  (``trainer.py:1233-1239``).
"""

from __future__ import annotations

import math
import re
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

MIRO_KEY = "miro_encoders"
_EPS = 1e-5
_TAP_RE = re.compile(r"(^|_)block_?\d+$")


def tap_filter(mdl, method_name: str) -> bool:
    """capture_intermediates filter: transformer / ConvNeXt block outputs."""
    name = getattr(mdl, "name", None) or ""
    return method_name == "__call__" and bool(_TAP_RE.search(name))


def _flatten_taps(intermediates: Dict[str, Any]) -> Dict[str, jax.Array]:
    """Intermediates collection -> {path: array}, deterministic order.
    flax stores each capture as a tuple of per-call outputs."""
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(intermediates)[0]
    for path, leaf in flat:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        out[key] = leaf
    return dict(sorted(out.items()))


def forward_with_taps(model, params, x, cids, *, train, rngs=None, channel_override=None):
    """Model forward that also returns the MIRO tap dict."""
    kwargs = dict(train=train, channel_embed_override=channel_override)
    if rngs is not None:
        kwargs["rngs"] = rngs
    (out, extra), variables = model.apply(
        {"params": params}, x, cids,
        capture_intermediates=tap_filter, mutable=["intermediates"], **kwargs,
    )
    return out, extra, _flatten_taps(variables["intermediates"])


def _b_shape(shape: Tuple[int, ...]) -> Tuple[int, ...]:
    """Channelwise bias shape (``model_utils.py:112-121``; 4D is NHWC here
    where the reference's is NCHW — same per-channel semantics)."""
    if len(shape) == 4:
        return (1, 1, 1, shape[3])
    if len(shape) == 3:
        return (1, 1, shape[2])
    if len(shape) == 2:
        return (1, shape[1])
    raise ValueError(f"MIRO tap of rank {len(shape)} not supported: {shape}")


def init_encoders(model, params, sample_x, sample_cids) -> Dict[str, jax.Array]:
    """The ``get_shapes`` equivalent: discover tap shapes via eval_shape
    (zero compute) and build one VarianceEncoder bias per tap."""

    def fwd(p, x):
        return model.apply(
            {"params": p}, x, sample_cids, train=False,
            capture_intermediates=tap_filter, mutable=["intermediates"],
        )

    shapes = jax.eval_shape(fwd, params, sample_x)[1]["intermediates"]
    taps = _flatten_taps(shapes)
    if not taps:
        raise ValueError(
            "train.miro=True but no intermediate taps found — the model has "
            "no block_i modules (miro requires model.scan_blocks=False)"
        )
    b0 = math.log(math.exp(0.1 - _EPS) - 1.0)  # softplus^-1(init - eps)
    return {name: jnp.full(_b_shape(s.shape), b0, jnp.float32) for name, s in taps.items()}


def miro_vlb(encoders: Dict[str, jax.Array], feats: Dict[str, jax.Array],
             pre_feats: Dict[str, jax.Array]) -> jax.Array:
    """reg_loss = sum_taps mean((f - pre_f)^2/var + log var)/2
    (``trainer.py:898-908``)."""
    reg = jnp.float32(0.0)
    for name in feats:
        var = jax.nn.softplus(encoders[name]) + _EPS
        f = feats[name].astype(jnp.float32)
        pre = jax.lax.stop_gradient(pre_feats[name].astype(jnp.float32))
        vlb = (f - pre) ** 2 / var + jnp.log(var)
        reg = reg + jnp.mean(vlb) / 2.0
    return reg
