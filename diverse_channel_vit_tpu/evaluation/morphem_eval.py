"""In-trainer CHAMMI / MorphEm evaluation glue.

Counterpart of ``Trainer.eval_morphem70k`` (``trainer.py:560-736``):
forward every test chunk -> per-chunk ``features.npy`` -> ``run_benchmark``
per (classifier x knn_metric) -> CHAMMI final score -> cleanup.
"""

from __future__ import annotations

import math
import os
import shutil
from typing import Dict

import jax.numpy as jnp
import numpy as np

from .benchmark import chammi_score, run_benchmark


def extract_features(trainer, chunk: str, loader, new_channel_init=None) -> np.ndarray:
    """Forward the chunk's test loader through the backbone (features =
    the model output; CHAMMI models have no classifier head).
    ``new_channel_init`` applies leave-one-out embedding synthesis when the
    run trained on a chunk subset (``trainer.py:552-560``)."""
    cids = jnp.asarray(trainer._chunk_channel_ids(chunk))
    override = trainer._synthesis_override(chunk, new_channel_init)
    eval_step = trainer._get_eval_step(chunk)
    feats = []
    max_batches = 3 if trainer.debug else math.inf
    for i, batch in enumerate(loader):
        if i >= max_batches:
            break
        out = eval_step(trainer.state.params, jnp.asarray(batch["image"]), cids, override)
        valid = batch.get("valid")
        arr = np.asarray(out, np.float32)
        if valid is not None:
            arr = arr[np.asarray(valid)]
        feats.append(arr)
    return np.concatenate(feats, axis=0)


def eval_morphem70k(trainer, epoch: int, new_channel_init=None) -> Dict[str, float]:
    """Full CHAMMI eval: per-chunk feature dump -> MorphEm Tasks 1-4 ->
    CHAMMI score (``trainer.py:560-736`` parity)."""
    cfg = trainer.cfg
    folder = f"epoch{epoch}_seed{trainer.seed}"
    feature_dir = cfg.eval.feature_dir.replace("{FOLDER_NAME}", folder)
    dest_dir = cfg.eval.dest_dir.replace("{FOLDER_NAME}", folder)
    root_dir = cfg.eval.root_dir or cfg.dataset.root_dir

    for chunk, loader in trainer.test_loaders.items():
        ld = loader if not isinstance(loader, dict) else list(loader.values())[0]
        feats = extract_features(trainer, chunk, ld, new_channel_init)
        out_dir = os.path.join(feature_dir, chunk)
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, cfg.eval.feature_file), feats)

    results: Dict[str, float] = {}
    classifiers = list(cfg.eval.get("classifiers", ["knn"]))
    knn_metrics = list(cfg.eval.get("knn_metrics", ["cosine"]))
    for classifier in classifiers:
        metrics = knn_metrics if classifier == "knn" else [""]
        for km in metrics:
            df = run_benchmark(
                root_dir=root_dir,
                dest_dir=dest_dir,
                feature_dir=feature_dir,
                feature_file=cfg.eval.feature_file,
                classifier=classifier,
                umap=bool(cfg.eval.get("umap", False)),
                use_gpu=bool(cfg.eval.get("use_gpu", True)),
                knn_metric=km or "l2",
            )
            tag = f"{classifier}_{km}" if classifier == "knn" else classifier
            for _, row in df.iterrows():
                results[f"{tag}/{row.dataset}/{row.task}/f1"] = float(row.f1_score_macro)
                results[f"{tag}/{row.dataset}/{row.task}/acc"] = float(row.accuracy)
            results[f"{tag}/chammi_score"] = chammi_score(df)

    # headline metric: cosine-kNN CHAMMI score (trainer.py:711-731)
    headline = results.get("knn_cosine/chammi_score")
    if headline is not None:
        results["accuracy"] = headline
    if cfg.eval.get("clean_up", True):
        shutil.rmtree(feature_dir, ignore_errors=True)
    return results
