"""End-to-end: config -> Trainer -> train -> eval -> checkpoint -> resume,
on the synthetic dataset with the tiny "test" model geometry."""

import os

import jax

import numpy as np
import pytest

from diverse_channel_vit_tpu.config import load_config
from diverse_channel_vit_tpu.trainer import Trainer


def _cfg(tmp_path, extra=()):
    return load_config(
        "synthetic_cfg",
        [
            "train.num_epochs=2",
            "optimizer.params.lr=0.002",
            "scheduler=none",
            "train.batch_size=16",
            "dataset.num_train_samples=64",
            "dataset.num_eval_samples=32",
            f"train.checkpoints={tmp_path}/ckpt",
            "hardware.num_workers=0",
            "model.attention_impl=xla",
            *extra,
        ],
    )


def test_synthetic_training_improves_and_checkpoints(tmp_path):
    cfg = _cfg(tmp_path)
    trainer = Trainer(cfg)
    best = trainer.train()
    assert best > 0.3  # separable synthetic data: well above 1/10 chance
    # checkpoint written at the last epoch
    found = []
    for root, _, files in os.walk(str(tmp_path / "ckpt")):
        found += [f for f in files if f.endswith("meta.json")]
    assert found, "no checkpoint written"


def test_resume_from_checkpoint(tmp_path):
    cfg = _cfg(tmp_path)
    t1 = Trainer(cfg)
    t1.train()
    ckpt_dir = t1.checkpoints
    cfg2 = _cfg(
        tmp_path,
        extra=[
            "train.resume_train=True",
            f"train.resume_model={ckpt_dir}/model_last",
            "train.num_epochs=2",
        ],
    )
    t2 = Trainer(cfg2)
    assert t2.start_epoch == 3
    p1 = np.asarray(
        t1.state.params["backbone"]["channel_embed"]
    )
    p2 = np.asarray(t2.state.params["backbone"]["channel_embed"])
    np.testing.assert_array_equal(p1, p2)


def test_hcs_training_path(tmp_path):
    cfg = _cfg(tmp_path, extra=[
        "model.enable_sample=True",
        "model.hcs_sampling=lowest_cosine_prob",
        "++model.proxy_loss_lambda=0.1",
        "++model.ortho_loss_v1_lambda=1.0",
        "train.extra_loss_lambda=1.0",
        "train.num_epochs=1",
        "train.debug=True",
    ])
    trainer = Trainer(cfg)
    metrics = trainer.train_one_epoch(1)
    assert np.isfinite(metrics["loss"])
    assert metrics["extra_loss"] != 0.0


def test_bitwise_determinism_same_seed(tmp_path):
    """Two runs with the same seed produce identical parameters — the
    determinism the reference's DDP HCS sampling lacked (SURVEY §2.6)."""
    def run(tag):
        cfg = _cfg(tmp_path / tag, extra=["train.seed=777", "train.num_epochs=1",
                                          "model.enable_sample=True",
                                          "model.hcs_sampling=lowest_cosine_prob"])
        t = Trainer(cfg)
        t.train_one_epoch(1)
        return t.state.params

    p1 = run("a")
    p2 = run("b")
    for l1, l2 in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_convnext_through_trainer(tmp_path):
    """Chunk-bound ConvNeXt variants train through the Trainer (bind_chunk
    clones over one param tree)."""
    cfg = _cfg(tmp_path, extra=[
        "model=depthwiseconvnext", "train.num_epochs=1", "train.debug=True",
        "++model.kernels_per_channel=8", "++model.patch_size=4",
        "++model.pooling_channel_type=weighted_sum_random",
    ])
    trainer = Trainer(cfg)
    metrics = trainer.train_one_epoch(1)
    assert np.isfinite(metrics["loss"])
    res = trainer.eval_regular(1)
    assert "valid/accuracy" in res


def test_chunk_stem_convnext_on_single_chunk_dataset(tmp_path):
    """Chunk-IDENTITY models (SharedConvNeXt per-chunk stems) on a
    single-chunk dataset: the trainer must not bind the dataset's chunk
    label ('synthetic') as the model's chunk identity — chunk names are a
    CHAMMI mapper concept (regression: trainer._default_chunk)."""
    cfg = _cfg(tmp_path, extra=[
        "model=shared_convnext", "train.num_epochs=1", "train.debug=True",
    ])
    trainer = Trainer(cfg)
    assert trainer._default_chunk is None
    metrics = trainer.train_one_epoch(1)
    assert np.isfinite(metrics["loss"])
    res = trainer.eval_regular(1)
    assert "valid/accuracy" in res


def test_async_checkpointing(tmp_path):
    """``train.async_checkpoint=True`` commits every epoch save on the
    background thread; train() waits before finishing, so the checkpoints
    are durable and identical to the live state."""
    cfg = _cfg(tmp_path, extra=[
        "++train.async_checkpoint=True", "train.num_epochs=2",
        "train.save_model=every-1",
    ])
    t = Trainer(cfg)
    t.train()
    from diverse_channel_vit_tpu.training.checkpoint import load_checkpoint

    st, ep = load_checkpoint(t.checkpoints, t.state, name="model_epoch2")
    assert ep == 2
    np.testing.assert_array_equal(
        np.asarray(st.params["backbone"]["channel_embed"]),
        np.asarray(t.state.params["backbone"]["channel_embed"]),
    )
    # the mid-run save committed too
    st1, ep1 = load_checkpoint(t.checkpoints, t.state, name="model_epoch1")
    assert ep1 == 1


def test_scan_blocks_checkpoint_roundtrip(tmp_path):
    """Checkpoint save/restore with the stacked (scan) parameter layout."""
    cfg = _cfg(tmp_path, extra=["++model.scan_blocks=True", "train.num_epochs=1"])
    t1 = Trainer(cfg)
    t1.train()
    cfg2 = _cfg(tmp_path, extra=[
        "++model.scan_blocks=True", "train.num_epochs=1",
        "train.resume_train=True", f"train.resume_model={t1.checkpoints}/model_last",
    ])
    t2 = Trainer(cfg2)
    p1 = np.asarray(jax.tree_util.tree_leaves(t1.state.params)[0])
    p2 = np.asarray(jax.tree_util.tree_leaves(t2.state.params)[0])
    np.testing.assert_array_equal(p1, p2)
