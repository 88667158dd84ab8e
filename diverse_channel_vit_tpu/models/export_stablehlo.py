"""AOT StableHLO export via ``jax.export`` (beyond reference — deployment).

Third leg of the export story (``models/export.py`` round-trips the
reference's torch checkpoint, ``models/export_tf.py`` writes a TF
SavedModel): a trained model + params become serialized ``jax.export``
artifacts — versioned StableHLO with baked-in weights — that any JAX
runtime can ``deserialize(...).call(...)`` WITHOUT this package, flax, or
the model code installed. Because the artifact is lowered (not traced) at
export time, serving hosts also skip tracing/compile-cache warmup
entirely; XLA compiles the shipped StableHLO directly.

Same bucket design as ``export_tf``/``ServingEngine``: one artifact per
static batch bucket (shape-specialized programs beat symbolic shapes for
Mosaic compatibility and serving predictability), ``channel_ids`` stays a
runtime tensor so one export serves any k-channel subset of the baked
channel-table rows.

Layout written by :func:`save_stablehlo_model`::

    out_dir/
      manifest.json            # buckets, shapes, dtypes, platforms
      serve_b{N}.jaxexport     # jax.export.Exported.serialize() bytes
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

__all__ = ["save_stablehlo_model", "load_stablehlo_model"]


def save_stablehlo_model(
    model,
    params,
    out_dir: str,
    *,
    channel_ids: Sequence[int],
    img_shape: Sequence[int],
    buckets: Sequence[int] = (1, 64),
    platforms: Sequence[str] = ("tpu", "cpu"),
    compute_dtype=None,
) -> str:
    """Serialize one ``jax.export`` artifact per batch bucket.

    Each artifact takes ``images (N, C, H, W) float32`` and
    ``channel_ids (C,) int32`` and returns ``(N, ...) float32`` — logits
    when the model carries a classifier head, the CLS embedding otherwise
    (the ``ServingEngine.predict`` contract). Weights are baked into the
    StableHLO as constants, so the artifact is self-contained.

    ``platforms``: lowering targets recorded in the artifact; the default
    ships one blob runnable on both the TPU serving fleet and CPU hosts.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    cids = np.asarray(list(channel_ids), np.int32)
    n_ch = int(cids.shape[0])
    dtype = compute_dtype if compute_dtype is not None else getattr(
        model, "dtype", jnp.bfloat16)

    def fwd(x, c):
        out, _ = model.apply({"params": params}, x.astype(dtype), c,
                             train=False)
        return out.astype(jnp.float32)

    os.makedirs(out_dir, exist_ok=True)
    manifest = {
        "format": "jax.export",
        "calling_convention_version":
            jexport.maximum_supported_calling_convention_version,
        "platforms": list(platforms),
        "num_channels": n_ch,
        "img_shape": list(img_shape),
        "buckets": sorted({int(b) for b in buckets}),
        "inputs": ["images (N,C,H,W) float32", "channel_ids (C,) int32"],
        "output": "float32 logits/embedding",
    }
    # TPU-host exports lower the flash attention as a Mosaic custom call;
    # whitelist it (the artifact then runs only on TPU runtimes that ship
    # the same Mosaic version — the manifest records the platforms)
    disabled = (jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),)
    for b in manifest["buckets"]:
        exp = jexport.export(jax.jit(fwd), platforms=tuple(platforms),
                             disabled_checks=disabled)(
            jax.ShapeDtypeStruct((b, n_ch, *img_shape), jnp.float32),
            jax.ShapeDtypeStruct((n_ch,), jnp.int32),
        )
        with open(os.path.join(out_dir, f"serve_b{b}.jaxexport"), "wb") as f:
            f.write(exp.serialize())
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir


def load_stablehlo_model(out_dir: str, bucket: Optional[int] = None):
    """Load one exported bucket back as a callable ``(images, cids) -> out``.

    Needs only jax — deliberately reads the artifact the way a serving
    host without this package would.
    """
    from jax import export as jexport

    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    b = int(bucket) if bucket is not None else manifest["buckets"][0]
    with open(os.path.join(out_dir, f"serve_b{b}.jaxexport"), "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call, manifest
