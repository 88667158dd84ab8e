"""Export an orbax training checkpoint as AOT jax.export StableHLO artifacts.

    python scripts/export_stablehlo.py <run_dir> out_dir \
        --cids 0,1,2,3,4,5,6,7 --img 224 --buckets 1,64 --platforms tpu,cpu

Loads (model, params, cfg) exactly like the serving CLI (scripts/serve.py),
then writes one ``serve_b{N}.jaxexport`` per bucket plus a manifest via
models/export_stablehlo.py. A serving host needs only jax to
``load_stablehlo_model(out_dir)`` — not this package, flax, or the model
code — and skips tracing entirely (the artifact is already lowered).

Note: multi-platform artifacts (the default) need every lowering to be
platform-portable — export from a CPU host (attention auto-routes to the
XLA path) or pass ``--platforms tpu`` to keep Mosaic kernels.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from diverse_channel_vit_tpu.compile_cache import enable, honor_env_platform


def main(argv=None) -> str:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt_dir", help="checkpoint directory (holds model_last + .meta.json)")
    ap.add_argument("out", help="output directory for the .jaxexport artifacts")
    ap.add_argument("--name", default="model_last", help="checkpoint name in ckpt_dir")
    ap.add_argument("--cids", default=None,
                    help="comma-separated channel ids (default: the config's train mapper ids)")
    ap.add_argument("--img", type=int, default=None,
                    help="square image size (default: the config's dataset.img_size)")
    ap.add_argument("--buckets", default="1,64", help="comma-separated batch buckets")
    ap.add_argument("--platforms", default="tpu,cpu",
                    help="comma-separated lowering targets baked into the artifact")
    ap.add_argument("--fp32", action="store_true",
                    help="compute in float32 instead of the checkpoint's dtype")
    args = ap.parse_args(argv)

    honor_env_platform()
    enable()

    from serve import load_serving_bundle

    from diverse_channel_vit_tpu.models.export_stablehlo import save_stablehlo_model
    from diverse_channel_vit_tpu.trainer import build_mapper

    model, params, cfg = load_serving_bundle(args.ckpt_dir, args.name)

    if args.cids is not None:
        cids = [int(c) for c in args.cids.split(",")]
    else:
        mapper = build_mapper(cfg)
        first = next(iter(mapper.values()))
        cids = list(first["train"] if isinstance(first, dict) and "train" in first else first)
    img = args.img or int(cfg.dataset.get("img_size", 224) if not isinstance(
        cfg.dataset.get("img_size"), (list, tuple)) else cfg.dataset.get("img_size")[0])
    buckets = [int(b) for b in args.buckets.split(",")]

    import jax.numpy as jnp

    path = save_stablehlo_model(
        model, params, args.out, channel_ids=cids, img_shape=(img, img),
        buckets=buckets, platforms=[p for p in args.platforms.split(",") if p],
        compute_dtype=jnp.float32 if args.fp32 else None,
    )
    print(f"exported {args.ckpt_dir}/{args.name} -> {path} "
          f"(C={len(cids)}, img={img}, buckets={buckets}, "
          f"platforms={args.platforms})")
    return path


if __name__ == "__main__":
    main()
