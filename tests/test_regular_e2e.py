"""JUMP-CP and So2Sat end-to-end through the Trainer: fixture trees ->
train (HCS + device augment) -> eval_regular -> channel-subset sweep."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def jumpcp_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("jumpcp")
    (root / "jumpcp" / "platemap_and_metadata").mkdir(parents=True)
    (root / "imgs").mkdir()
    rng = np.random.default_rng(0)
    n = 40
    wells = [f"A{j:02d}" for j in range(1, 9)]
    protos = rng.normal(0, 1, size=(3, 8, 1, 1))
    paths, locs = [], []
    for i in range(n):
        img = protos[i % 3] + rng.normal(0, 0.3, (8, 64, 64))
        np.save(root / f"imgs/c{i}.npy", img.astype(np.float32))
        paths.append(f"s3://insitro-research-2023-context-vit/imgs/c{i}.npy")
        locs.append(wells[i % 3])  # 3 labeled wells -> 3 classes
    pd.DataFrame({"path": paths, "ID": range(n), "well_loc": locs}).to_parquet(
        root / "jumpcp" / "BR00116991.pq")
    pm = root / "jumpcp" / "platemap_and_metadata"
    for pert, col in [("compound", "target"), ("crispr", "gene"), ("orf", "gene")]:
        pd.DataFrame({"broad_sample": [f"s{k}" for k in range(3)],
                      "well_position": wells[:3]}).to_parquet(
            pm / f"JUMP-Target-1_{pert}_platemap.tsv")
        pd.DataFrame({"broad_sample": [f"s{k}" for k in range(3)],
                      col: [f"t{k}" for k in range(3)]}).to_parquet(
            pm / f"JUMP-Target-1_{pert}_metadata.tsv")
    return str(root) + "/"


def test_jumpcp_trainer_e2e(jumpcp_root, tmp_path):
    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.trainer import Trainer

    cfg = load_config("jump_cp_cfg", [
        f"++dataset.root_dir={jumpcp_root}", "++dataset.img_size=32",
        "++model.img_size=[32]", "++model.patch_size=8",
        "++model.pretrained_model_name=test", "++model.enable_sample=True",
        "++model.hcs_sampling=lowest_cosine_prob",
        "++train.num_epochs=1", "++train.batch_size=8", "++eval.batch_size=8",
        "++hardware.num_workers=0", "++hardware.mesh.data=1",
        "++model.attention_impl=xla", f"++train.checkpoints={tmp_path}",
        "++eval.eval_subset_channels=True", "++train.device_augment=True",
    ])
    trainer = Trainer(cfg)
    assert trainer.num_classes == 161  # jump_cp class vocabulary
    # device-augment active: loader ships raw 8-channel crops
    assert trainer.train_loaders["jump_cp"].dataset.device_augment
    metrics = trainer.train_one_epoch(1)
    assert np.isfinite(metrics["loss"])
    results = trainer.evaluate_model(1)
    assert "valid/accuracy" in results and "test/accuracy" in results
    assert "subset_8/mean" in results and "subset_7/mean" in results


@pytest.fixture(scope="module")
def so2sat_root(tmp_path_factory):
    import h5py

    root = tmp_path_factory.mktemp("so2sat")
    rng = np.random.default_rng(0)
    for split, n in [("training.h5", 48), ("validation.h5", 16), ("testing.h5", 16)]:
        with h5py.File(root / split, "w") as f:
            labels = rng.integers(0, 17, n)
            protos = rng.normal(0, 0.5, size=(17, 1, 1, 18))
            full = protos[labels] + rng.normal(0, 0.2, (n, 32, 32, 18))
            f["sen1"] = full[..., :8].astype(np.float32)
            f["sen2"] = full[..., 8:].astype(np.float32)
            onehot = np.zeros((n, 17), np.uint8)
            onehot[np.arange(n), labels] = 1
            f["label"] = onehot
    return str(root)


def test_so2sat_trainer_e2e(so2sat_root, tmp_path):
    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.trainer import Trainer

    cfg = load_config("so2sat_city_cfg", [
        f"++dataset.root_dir={so2sat_root}",
        "++model.img_size=[32]", "++model.patch_size=8",
        "++model.pretrained_model_name=test", "++model.enable_sample=True",
        "++train.num_epochs=1", "++train.batch_size=8", "++eval.batch_size=8",
        "++hardware.num_workers=0", "++hardware.mesh.data=1",
        "++model.attention_impl=xla", f"++train.checkpoints={tmp_path}",
    ])
    trainer = Trainer(cfg)
    assert trainer.num_classes == 17
    metrics = trainer.train_one_epoch(1)
    assert np.isfinite(metrics["loss"])
    results = trainer.evaluate_model(1)
    # so2sat declares test_1 / test_2 / test_full channel-subset splits
    assert "test_1/accuracy" in results
    assert "test_2/accuracy" in results
    assert "test_full/accuracy" in results


def test_plot_attn_and_eval_batch_autotune(tmp_path):
    import os

    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.trainer import Trainer

    cfg = load_config("synthetic_cfg", [
        "train.num_epochs=1", "train.batch_size=8", "train.debug=True",
        "dataset.num_train_samples=16", "dataset.num_eval_samples=8",
        "hardware.num_workers=0", "model.attention_impl=xla",
        "++train.plot_attn=True", f"train.checkpoints={tmp_path}",
        "eval.batch_size=null",
    ])
    t = Trainer(cfg)
    # reference trainer.py:93-105: unset eval bs -> power of 2 (128 for
    # depthwise, memory-scaled otherwise)
    assert t.cfg.eval.batch_size and (t.cfg.eval.batch_size & (t.cfg.eval.batch_size - 1)) == 0
    path = t.plot_attention(0)
    attn_dir = os.path.join(t.checkpoints, "attn")
    assert os.path.exists(os.path.join(attn_dir, "cls_attn_epoch0.npy"))
    assert path is None or path.endswith(".png")
