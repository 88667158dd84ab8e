"""Import a PyTorch reference checkpoint into a TPU-servable directory.

The migration entry point for users arriving from the reference repo with
trained weights: converts the checkpoint its trainer writes
(``/root/reference/trainer.py:1292-1306`` — or a bare ``state_dict``,
``module.`` prefixes OK) into this framework's checkpoint-directory layout,
which both ``scripts/serve.py`` (HTTP serving) and the export CLIs
(StableHLO / TF SavedModel / torch) consume directly:

    python scripts/import_torch.py REF_CKPT.pt OUT_DIR \
        -cn jump_cp_cfg model=dichavit [++key=val ...] [--name model_last] \
        [--partial]

The config names the model geometry the checkpoint was trained with (same
surface as main.py); the tree is validated leaf-by-leaf against the
configured model's own init before anything is written. ``--partial``
switches to warm-start semantics: matching leaves load, mismatched ones
(e.g. a different proxy/head width for a new task) keep their fresh init,
and both lists are printed.

For fine-tuning there is no CLI needed — point the trainer at the torch
file directly: ``++model.pretrained=/path/to/ref.pt`` (see trainer.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diverse_channel_vit_tpu.compile_cache import enable, honor_env_platform


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    ap.add_argument("ref_ckpt", help="reference torch checkpoint (.pt/.pth)")
    ap.add_argument("out_dir", help="output checkpoint directory")
    ap.add_argument("-cn", "--config-name", default="jump_cp_cfg")
    ap.add_argument("overrides", nargs="*", help="Hydra-style key=value overrides")
    ap.add_argument("--name", default="model_last", help="checkpoint name in OUT_DIR")
    ap.add_argument("--partial", action="store_true",
                    help="warm-start: load matching leaves, keep fresh init elsewhere")
    args = ap.parse_args(argv)

    enable()
    honor_env_platform()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from diverse_channel_vit_tpu import models as model_zoo
    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.models.import_torch import (
        load_reference_checkpoint, merge_into_template, validate_against_template)
    from diverse_channel_vit_tpu.trainer import build_mapper

    cfg = load_config(args.config_name, args.overrides)
    scan_layout = bool(cfg.model.get("scan_blocks", False))
    imported, meta = load_reference_checkpoint(args.ref_ckpt, scan_layout=scan_layout)

    # num_classes straight from the checkpoint's proxy table when present
    if isinstance(imported, dict) and "proxies" in imported:
        num_classes = int(np.shape(imported["proxies"])[0])
    else:
        num_classes = int(cfg.model.get("num_classes")
                          or cfg.dataset.get("num_classes") or 0)
        if not num_classes:
            raise SystemExit("bare-backbone checkpoint: pass "
                             "++model.num_classes=N (or ++dataset.num_classes=N)")

    # the reference fills model.in_channel_names from the dataset at runtime
    # (main.py:32-33); sync here exactly as the Trainer does (trainer.py:209)
    # so the meta.json config also serves directly
    icn = cfg.model.get("in_channel_names")
    if not icn or isinstance(icn, str):
        cfg.model.in_channel_names = cfg.dataset.in_channel_names

    mapper = build_mapper(cfg)
    attn_pooling = cfg.get("attn_pooling")
    if attn_pooling is not None and hasattr(attn_pooling, "to_dict"):
        attn_pooling = attn_pooling.to_dict()
    model = model_zoo.build_model(
        cfg.model.name, cfg.model, mapper, num_classes, dtype=jnp.float32,
        attn_pooling=attn_pooling,
    )

    # template init shapes without any compute/compile
    chunk0 = next(iter(mapper))
    cids = jnp.asarray(mapper[chunk0])
    img = int(cfg.dataset.get("img_size", 224))
    x_spec = jax.ShapeDtypeStruct((2, len(mapper[chunk0]), img, img), jnp.float32)
    rng = jax.random.key(0)
    template = jax.eval_shape(
        lambda r, x, c: model.init({"params": r, "dropout": r}, x, c, train=False)["params"],
        rng, x_spec, cids,
    )

    if args.partial:
        # warm start keeps fresh init where the checkpoint doesn't fit, so
        # the template needs real values (jitted init), not just shapes
        init_fn = jax.jit(
            lambda r, x, c: model.init({"params": r, "dropout": r}, x, c, train=False)["params"]
        )
        template = jax.tree_util.tree_map(
            np.asarray,
            init_fn(rng, jnp.zeros(x_spec.shape, x_spec.dtype), cids),
        )
        params, loaded, kept = merge_into_template(template, imported)
        for p in loaded:
            print(f"  loaded  {p}")
        for p in kept:
            print(f"  fresh   {p}")
        if not loaded:
            raise SystemExit("--partial loaded zero leaves — wrong model/config?")
    else:
        validate_against_template(template, imported)
        params, _, _ = merge_into_template(template, imported)

    path = os.path.abspath(os.path.join(args.out_dir, args.name))
    os.makedirs(args.out_dir, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, {"params": params}, force=True)
    ckpt.wait_until_finished()
    with open(os.path.join(args.out_dir, f"{args.name}.meta.json"), "w") as f:
        json.dump({"epoch": int(meta.get("epoch", 0)),
                   "accuracy": float(meta.get("accuracy", 0.0) or 0.0),
                   "config": cfg.to_dict(),
                   "imported_from": os.path.abspath(args.ref_ckpt)}, f)
    n = sum(int(np.size(l)) for l in jax.tree_util.tree_leaves(params))
    print(f"imported {args.ref_ckpt} -> {path} ({n:,} params, "
          f"model {cfg.model.name}, scan_blocks={scan_layout})")
    return path


if __name__ == "__main__":
    main()
