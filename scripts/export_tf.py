"""Export an orbax training checkpoint as a TF SavedModel for TF-Serving.

    python scripts/export_tf.py <run_dir> out_dir --cids 0,1,2,3,4,5,6,7 \
        --img 224 --buckets 1,64

Loads (model, params, cfg) exactly like the serving CLI (scripts/serve.py,
same meta.json + orbax protocol, same trace-time flag parity), then writes
one ``serve_b{N}`` signature per bucket via models/export_tf.py. The
SavedModel is self-contained — the serving host needs TF only, not JAX.
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
    ap.add_argument("out", help="SavedModel output directory")
    ap.add_argument("--name", default="model_last", help="checkpoint name in ckpt_dir")
    ap.add_argument("--cids", default=None,
                    help="comma-separated channel ids (default: the config's train mapper ids)")
    ap.add_argument("--img", type=int, default=None,
                    help="square image size (default: the config's dataset.img_size)")
    ap.add_argument("--buckets", default="1,64", help="comma-separated batch buckets")
    ap.add_argument("--fp32", action="store_true",
                    help="compute in float32 instead of the checkpoint's dtype")
    args = ap.parse_args(argv)

    honor_env_platform()
    enable()

    from serve import load_serving_bundle

    from diverse_channel_vit_tpu.models.export_tf import save_tf_serving_model
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

    path = save_tf_serving_model(
        model, params, args.out, channel_ids=cids, img_shape=(img, img),
        buckets=buckets, compute_dtype=jnp.float32 if args.fp32 else None,
    )
    print(f"exported {args.ckpt_dir}/{args.name} -> {path} "
          f"(C={len(cids)}, img={img}, buckets={buckets})")
    return path


if __name__ == "__main__":
    main()
