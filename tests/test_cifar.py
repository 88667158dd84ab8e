"""CIFAR-10/100 local-pickle datasets + channel recomposition + Trainer e2e
(reference ``dataset_utils.py:316-390``; its mixed-chunk cifar loader calls
an undefined ``CifarRandomInstance`` and cannot run — documented in
data/cifar.py; the working single-chunk path is rebuilt and tested here)."""

import json
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cifar_root(tmp_path_factory):
    """Standard cifar-10-batches-py pickle layout, 20 images per batch."""
    root = tmp_path_factory.mktemp("cifar")
    base = root / "cifar-10-batches-py"
    base.mkdir()
    rng = np.random.default_rng(3)
    protos = rng.integers(0, 255, size=(10, 3072))
    for fname, n in [("data_batch_1", 20), ("data_batch_2", 20),
                     ("data_batch_3", 20), ("data_batch_4", 20),
                     ("data_batch_5", 20), ("test_batch", 30)]:
        labels = [int(i % 10) for i in range(n)]
        data = np.stack([
            np.clip(protos[y] + rng.integers(-20, 20, 3072), 0, 255) for y in labels
        ]).astype(np.uint8)
        with open(base / fname, "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
    with open(base / "batches.meta", "wb") as f:
        pickle.dump({b"label_names": [f"class_{i}".encode() for i in range(10)]}, f)
    return str(root)


def test_cifar_dataset_loads_and_normalizes(cifar_root):
    from diverse_channel_vit_tpu.data.cifar import Cifar10Dataset
    from diverse_channel_vit_tpu.data.normalization import MEAN_STD

    ds = Cifar10Dataset(cifar_root, split="train", is_train=True)
    assert len(ds) == 100  # 5 batches x 20
    ex = ds.get_example(0, rng=np.random.default_rng(0))
    assert ex["image"].shape == (3, 32, 32)
    mean, std = MEAN_STD["cifar10"]
    raw = ds.data[0].astype(np.float32) / 255.0
    want = (raw - np.asarray(mean, np.float32)[:, None, None]) / np.asarray(
        std, np.float32)[:, None, None]
    got = ds.get_example(0, rng=None)["image"]  # rng=None -> no flip
    np.testing.assert_allclose(got, want, rtol=1e-6)

    test = Cifar10Dataset(cifar_root, split="test", is_train=False)
    assert len(test) == 30


def test_cifar_channel_recomposition(cifar_root):
    """Chunk channel lists recompose per dataset_utils.py:325-360: named
    colors slice, avg_* means, zero fills."""
    from diverse_channel_vit_tpu.data.cifar import Cifar10Dataset

    full = Cifar10Dataset(cifar_root, split="train", is_train=False)
    sub = Cifar10Dataset(cifar_root, split="train", is_train=False,
                         data_channels=["green", "avg_red_blue", "zero"])
    rgb = full.get_example(3)["image"]
    out = sub.get_example(3)["image"]
    assert out.shape == (3, 32, 32)
    np.testing.assert_allclose(out[0], rgb[1], rtol=1e-6)
    np.testing.assert_allclose(out[1], (rgb[0] + rgb[2]) / 2, rtol=1e-6)
    np.testing.assert_array_equal(out[2], 0)


def test_cifar_split_json_protocol(cifar_root, tmp_path):
    """Per-chunk index subsets via <root>/split/cifar10_train.json
    (dataset_utils.py:369-378)."""
    import os
    import shutil

    root = tmp_path / "root"
    shutil.copytree(cifar_root, root)
    os.makedirs(root / "split", exist_ok=True)
    with open(root / "split" / "cifar10_train.json", "w") as f:
        json.dump({"red_idx": [0, 2, 4, 6]}, f)
    from diverse_channel_vit_tpu.data.cifar import Cifar10Dataset

    ds = Cifar10Dataset(str(root), chunk_name="red", data_channels=["red"],
                        split="train", is_train=True)
    assert len(ds) == 4
    assert ds.get_example(0)["image"].shape == (1, 32, 32)
    # chunks not named in the json see the full split
    ds_full = Cifar10Dataset(str(root), chunk_name="other", split="train",
                             is_train=True)
    assert len(ds_full) == 100


def test_cifar_classes(cifar_root):
    from diverse_channel_vit_tpu.data import get_classes

    classes, _ = get_classes("cifar10", root_dir=cifar_root)
    assert classes == [f"class_{i}" for i in range(10)]
    # canonical fallback without a meta file
    classes2, _ = get_classes("cifar10", root_dir="/nonexistent")
    assert classes2[0] == "airplane" and len(classes2) == 10


def test_cifar_trainer_e2e(cifar_root, tmp_path):
    """Full Trainer pass on the cifar10 config: train epoch + eval."""
    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.trainer import Trainer

    cfg = load_config("cifar10_cfg", [
        f"++dataset.root_dir={cifar_root}",
        "++model.pretrained_model_name=test", "++model.patch_size=8",
        "++model.attention_impl=xla",
        "++train.num_epochs=1", "++train.batch_size=10", "++eval.batch_size=10",
        "++train.debug=True", "++hardware.num_workers=0",
        "++hardware.mesh.data=1", f"++train.checkpoints={tmp_path}",
    ])
    trainer = Trainer(cfg)
    assert trainer.num_classes == 10
    metrics = trainer.train_one_epoch(1)
    assert np.isfinite(metrics["loss"])
    results = trainer.evaluate_model(1)
    assert "test/accuracy" in results
