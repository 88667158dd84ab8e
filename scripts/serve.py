"""Serve a trained checkpoint over HTTP.

Boots entirely from a checkpoint directory: ``<name>.meta.json`` (written
by ``training/checkpoint.py:save_checkpoint``) carries the full training
config; the orbax tree carries the params. No dataset files are needed —
the chunk->channel mapper comes from the config (``trainer.build_mapper``)
and ``num_classes`` is inferred from the classifier head's kernel shape.

The reference has no serving story (offline feature extraction only,
``/root/reference/morphem/feature_extraction.py``); this CLI completes the
deployment surface of ``serving.py``/``serving_http.py``:

    python scripts/serve.py CKPT_DIR [--name model_last] [--port 8000] \
        [--buckets 1,8,64] [--quantization int8] [--keep-rate 0.7]

Endpoints once up: POST /v1/predict, GET /v1/stats, GET /healthz
(see serving_http.py for the request formats).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diverse_channel_vit_tpu.compile_cache import enable, honor_env_platform


def load_serving_bundle(ckpt_dir: str, name: str = "model_last"):
    """(model, params, cfg) from a checkpoint directory's meta.json + orbax tree."""
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from diverse_channel_vit_tpu import models as model_zoo
    from diverse_channel_vit_tpu.config.loader import Config
    from diverse_channel_vit_tpu.trainer import build_mapper

    meta_path = os.path.join(ckpt_dir, f"{name}.meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    cfg = Config(meta["config"])

    # apply the trace-time process flags the Trainer sets from this config
    # (trainer.py:__init__) — a checkpoint trained with erf-GELU or int8-QAT
    # must serve the same function it trained as
    from diverse_channel_vit_tpu.ops.activations import set_gelu_exact
    from diverse_channel_vit_tpu.ops.fused_block import set_fused_block, set_quantization

    set_gelu_exact(bool(cfg.model.get("gelu_exact", False)))
    set_fused_block(bool(cfg.model.get("fused_block", True)))
    set_quantization(str(cfg.model.get("quantization", "none")))

    # restore ONLY the params subtree (the saved tree also carries AdamW
    # mu/nu — ~3x the bytes — and the train rng; see checkpoint.py:53), and
    # materialize on host: mesh-placed training states restore with their
    # NamedShardings attached, but the serving programs are single-device
    import jax
    import numpy as np

    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.PyTreeCheckpointer()
    tree_meta = ckptr.metadata(path).item_metadata
    tree_meta = tree_meta.tree if hasattr(tree_meta, "tree") else tree_meta
    restored = ckptr.restore(path, args=ocp.args.PyTreeRestore(
        item={"params": tree_meta["params"]}, partial_restore=True))
    params = jax.tree_util.tree_map(np.asarray, restored["params"])

    num_classes = _infer_num_classes(params, cfg)
    mapper = build_mapper(cfg)
    attn_pooling = cfg.get("attn_pooling")
    if attn_pooling is not None and hasattr(attn_pooling, "to_dict"):
        attn_pooling = attn_pooling.to_dict()
    # AMP-flag parity with the Trainer: use_amp forces bf16 compute
    dtype_name = cfg.train.get("dtype", "bfloat16")
    if cfg.train.get("use_amp", False):
        dtype_name = "bfloat16"
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = model_zoo.build_model(
        cfg.model.name, cfg.model, mapper, num_classes, dtype=dtype,
        attn_pooling=attn_pooling,
    )
    return model, params, cfg


def _infer_num_classes(params, cfg) -> int:
    """Classifier-head kernel width, falling back to the config."""
    import jax

    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if any("classifier_head" in str(k) or str(k) == "head" for k in keys) and (
            keys and str(keys[-1]) == "kernel"
        ):
            return int(leaf.shape[-1])
    nc = cfg.model.get("num_classes") or cfg.dataset.get("num_classes")
    if not nc:
        raise SystemExit(
            "cannot infer num_classes: no classifier head in the checkpoint "
            "and no model.num_classes/dataset.num_classes in its config"
        )
    return int(nc)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    ap.add_argument("ckpt_dir", help="checkpoint directory (holds <name> + <name>.meta.json)")
    ap.add_argument("--name", default="model_last", help="checkpoint name (default model_last)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000, help="0 = ephemeral")
    ap.add_argument("--buckets", default="1,8,64",
                    help="comma-separated batch buckets AOT-compiled at startup")
    ap.add_argument("--max-wait-ms", type=float, default=2.0,
                    help="micro-batcher window for single-image requests")
    ap.add_argument("--quantization", default=None, choices=[None, "none", "int8"],
                    help="int8: serve with the in-VMEM AQT fused-MLP GEMMs")
    ap.add_argument("--keep-rate", type=float, default=None,
                    help="EViT serve-pruned mode (dense-trained checkpoints OK)")
    args = ap.parse_args(argv)

    enable()
    honor_env_platform()

    from diverse_channel_vit_tpu.serving import ServingEngine
    from diverse_channel_vit_tpu.serving_http import ServingHTTPServer

    model, params, cfg = load_serving_bundle(args.ckpt_dir, args.name)
    if args.keep_rate is not None:
        if not hasattr(model, "backbone") or not hasattr(model.backbone, "keep_rate"):
            raise SystemExit(f"--keep-rate: model {cfg.model.name!r} has no EViT path")
        model = model.clone(backbone=model.backbone.clone(keep_rate=args.keep_rate))

    buckets = tuple(int(b) for b in args.buckets.split(","))
    import jax.numpy as jnp

    act_dtype = getattr(getattr(model, "backbone", model), "dtype", jnp.bfloat16)
    engine = ServingEngine(
        model, params, buckets=buckets, max_wait_ms=args.max_wait_ms,
        dtype=act_dtype, quantization=args.quantization,
    )
    srv = ServingHTTPServer(engine, host=args.host, port=args.port).start()
    print(f"serving {cfg.model.name} ({args.ckpt_dir}/{args.name}) "
          f"on http://{args.host}:{srv.port}  buckets={buckets} "
          f"quantization={args.quantization or 'none'} keep_rate={args.keep_rate}",
          flush=True)
    try:
        import threading

        threading.Event().wait()  # serve until interrupted
    except KeyboardInterrupt:
        pass
    finally:
        srv.stop()


if __name__ == "__main__":
    main()
