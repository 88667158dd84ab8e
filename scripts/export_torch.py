"""Convert an orbax training checkpoint to the reference's torch format.

    python scripts/export_torch.py <run_dir>/model_last out.pt

Reads the TrainState tree saved by ``training/checkpoint.py`` (plus its
``.meta.json`` sidecar for epoch/accuracy/config) and writes a
``torch.save`` dict whose ``model_params`` loads strictly into the
reference's DiChaViT/ChannelViT wrappers (``/root/reference/trainer.py:
1308-1328``). Covers the ChannelVisionTransformer family; optimizer state
is not translated (optax and torch optimizers share no layout).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main(argv=None) -> str:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="orbax checkpoint path (e.g. .../model_last)")
    ap.add_argument("out", help="output .pt path")
    ap.add_argument("--prefix", default="feature_extractor.",
                    help="torch attribute the backbone is mounted on")
    args = ap.parse_args(argv)

    import jax.tree_util as jtu
    import numpy as np
    import orbax.checkpoint as ocp

    from diverse_channel_vit_tpu.models.export import save_reference_checkpoint

    # restore every leaf as a host numpy array: the checkpoint may have been
    # written from a different device topology (8-device CPU mesh, TPU) than
    # this process has, and the export needs no devices at all
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(os.path.abspath(args.checkpoint)).item_metadata
    restore_args = jtu.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta
    )
    tree = ckptr.restore(os.path.abspath(args.checkpoint), restore_args=restore_args)
    meta_path = args.checkpoint.rstrip("/") + ".meta.json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    path = save_reference_checkpoint(
        args.out, tree["params"],
        epoch=int(meta.get("epoch", 0)),
        accuracy=meta.get("accuracy"),
        config=meta.get("config"),
        prefix=args.prefix,
    )
    print(f"exported {args.checkpoint} (epoch {meta.get('epoch', 0)}) -> {path}")
    return path


if __name__ == "__main__":
    main()
