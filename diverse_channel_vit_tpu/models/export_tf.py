"""TF SavedModel export via jax2tf (beyond reference — deployment story).

The reference stops at offline feature extraction; ``models/export.py``
already round-trips weights to the reference's own torch checkpoint format.
This module completes the serving side: a trained model + params become a
self-contained TF SavedModel that TF-Serving / `tf.saved_model.load` can
run with no JAX (or this package) installed on the serving host.

Design mirrors ``serving.ServingEngine``: one signature per *batch bucket*
(static shapes — the same reason the engine AOT-compiles per bucket: XLA
programs are shape-specialized, and fixed buckets beat shape polymorphism
for both Mosaic-kernel compatibility and serving-time predictability).
``channel_ids`` stays a runtime tensor — its *length* is baked per
signature (token count is static), but the ids themselves are data, so a
single export serves any k-channel subset, matching the engine's
channel-adaptive contract.

The exported function is the zoo's shared eval forward
``model.apply(..., train=False)`` with float32 in/out at the boundary and
the model's own compute dtype inside.
"""

from __future__ import annotations

from typing import Optional, Sequence

__all__ = ["save_tf_serving_model"]


def save_tf_serving_model(
    model,
    params,
    export_dir: str,
    *,
    channel_ids: Sequence[int],
    img_shape: Sequence[int],
    buckets: Sequence[int] = (1, 64),
    compute_dtype=None,
) -> str:
    """Write a TF SavedModel with one ``serve_b{N}`` signature per bucket.

    Each signature takes ``images (N, C, H, W) float32`` and
    ``channel_ids (C,) int32`` and returns ``{"output": (N, ...) float32}``
    — logits when the model carries a classifier head, the CLS embedding
    otherwise (same contract as ``ServingEngine.predict``).

    ``compute_dtype`` defaults to the model's own dtype (bf16 on TPU
    checkpoints); pass ``jnp.float32`` for bit-parity with an fp32 forward.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import tensorflow as tf
    from jax.experimental import jax2tf

    cids = np.asarray(list(channel_ids), np.int32)
    n_ch = int(cids.shape[0])
    dtype = compute_dtype if compute_dtype is not None else getattr(model, "dtype", jnp.bfloat16)

    def fwd(p, x, c):
        out, _ = model.apply({"params": p}, x.astype(dtype), c, train=False)
        return out.astype(jnp.float32)

    conv = jax2tf.convert(fwd, with_gradient=False)

    module = tf.Module()
    flat, treedef = jax.tree_util.tree_flatten(params)
    # the SavedModel owns the weights: each leaf becomes a tf.Variable the
    # converted function closes over (checkpointed inside the export)
    module.model_params = [tf.Variable(np.asarray(v), trainable=False) for v in flat]

    def make_signature(bucket: int):
        @tf.function(
            autograph=False,
            input_signature=[
                tf.TensorSpec((bucket, n_ch, *img_shape), tf.float32, name="images"),
                tf.TensorSpec((n_ch,), tf.int32, name="channel_ids"),
            ],
        )
        def serve(images, channel_ids):
            p = jax.tree_util.tree_unflatten(treedef, list(module.model_params))
            return {"output": conv(p, images, channel_ids)}

        return serve

    signatures = {}
    for b in sorted({int(b) for b in buckets}):
        sig = make_signature(b)
        setattr(module, f"serve_b{b}", sig)
        signatures[f"serve_b{b}"] = sig
    tf.saved_model.save(module, export_dir, signatures=signatures)
    return export_dir
