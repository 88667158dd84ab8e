"""Data-layer tests: loader shape/determinism contracts, mixed-chunk quotas,
transform invariants."""

import numpy as np
import pytest

from diverse_channel_vit_tpu.data import BatchLoader, MixedChunkLoader, get_mean_std_dataset
from diverse_channel_vit_tpu.data.synthetic import SyntheticDataset
from diverse_channel_vit_tpu.data.transforms import (
    _bilinear_resize,
    center_crop,
    coarse_dropout,
    defocus,
    random_pad_crop,
    random_resized_crop,
    random_rot90_flips,
    resize,
)


def test_synthetic_dataset_deterministic():
    ds = SyntheticDataset(split="train", num_samples=16, num_classes=4, num_channels=3, img_size=8, seed=7)
    a = ds.get_example(3)
    b = ds.get_example(3)
    np.testing.assert_array_equal(a["image"], b["image"])
    assert a["label"] == b["label"]
    assert a["image"].shape == (3, 8, 8)


def test_batch_loader_static_shapes_and_padding():
    ds = SyntheticDataset(split="test", num_samples=10, num_classes=3, num_channels=2, img_size=4)
    loader = BatchLoader(ds, batch_size=4, shuffle=False, pad_last=True)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["image"].shape == (4, 2, 4, 4)
    assert b["valid"].sum() == 2  # 10 = 4+4+2


def test_batch_loader_drop_last_and_epoch_shuffle():
    ds = SyntheticDataset(split="train", num_samples=10, num_classes=3, num_channels=2, img_size=4)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=3)
    loader.set_epoch(0)
    e0 = [b["label"].tolist() for b in loader]
    loader.set_epoch(0)
    e0b = [b["label"].tolist() for b in loader]
    loader.set_epoch(1)
    e1 = [b["label"].tolist() for b in loader]
    assert e0 == e0b  # same epoch -> same order
    assert len(e0) == 2  # drop_last
    assert e0 != e1 or True  # different epoch usually differs (not guaranteed)


def test_batch_loader_host_sharding_partitions():
    ds = SyntheticDataset(split="train", num_samples=32, num_classes=3, num_channels=2, img_size=4)
    seen = []
    for host in range(4):
        ld = BatchLoader(ds, batch_size=4, shuffle=False, num_hosts=4, host_id=host)
        for b in ld:
            seen.extend(b["label"][b["valid"]].tolist())
    all_labels = [ds.get_example(i)["label"] for i in range(32)]
    assert sorted(seen) == sorted(all_labels)


def test_mixed_chunk_loader_fixed_quotas():
    datasets = {
        "A": SyntheticDataset(split="train", num_samples=60, num_classes=3, num_channels=3, img_size=4),
        "B": SyntheticDataset(split="train", num_samples=40, num_classes=3, num_channels=4, img_size=4),
    }
    ml = MixedChunkLoader(datasets, batch_size=10, seed=0)
    assert ml.quotas == {"A": 6, "B": 4}
    for batch in ml:
        assert batch["A"]["image"].shape == (6, 3, 4, 4)
        assert batch["B"]["image"].shape == (4, 4, 4, 4)
        break


def test_mean_std_tables_match_reference_values():
    mean, std = get_mean_std_dataset("jump_cp")
    assert len(mean) == len(std) == 8
    assert np.isclose(mean[0], 4.031743599139058)
    tables = get_mean_std_dataset("morphem70k")
    assert set(tables) == {"CP", "Allen", "HPA"}
    assert len(tables["CP"][0]) == 5 and len(tables["HPA"][0]) == 4 and len(tables["Allen"][0]) == 3


# ----------------------------------------------------------------------
# transforms
# ----------------------------------------------------------------------


def test_bilinear_resize_matches_torch():
    # oracle: torch interpolate(align_corners=False) — the exact semantics of
    # torchvision Resize/RandomResizedCrop used by the reference pipelines
    import torch

    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, 14, 10)).astype(np.float32)
    mine = _bilinear_resize(img, 7, 5)
    ref = (
        torch.nn.functional.interpolate(
            torch.from_numpy(img)[None], size=(7, 5), mode="bilinear", align_corners=False
        )[0]
        .numpy()
    )
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_resize_short_side_and_center_crop():
    img = np.zeros((2, 20, 30), np.float32)
    out = resize(img, 10)
    assert out.shape == (2, 10, 15)
    assert center_crop(out, 8).shape == (2, 8, 8)


def test_random_resized_crop_shape_and_determinism():
    rng1 = np.random.default_rng(5)
    rng2 = np.random.default_rng(5)
    img = np.random.default_rng(1).normal(size=(3, 32, 32)).astype(np.float32)
    a = random_resized_crop(rng1, img, 16)
    b = random_resized_crop(rng2, img, 16)
    assert a.shape == (3, 16, 16)
    np.testing.assert_array_equal(a, b)


def test_rot90_flips_preserve_values():
    rng = np.random.default_rng(2)
    img = np.random.default_rng(3).normal(size=(4, 8, 8)).astype(np.float32)
    out = random_rot90_flips(rng, img)
    assert out.shape == img.shape
    np.testing.assert_allclose(np.sort(out.ravel()), np.sort(img.ravel()))


def test_pad_crop_defocus_dropout():
    rng = np.random.default_rng(4)
    img = np.ones((2, 100, 100), np.float32)
    out = random_pad_crop(rng, img, pad_to=128, crop=96)
    assert out.shape == (2, 96, 96)
    blurred = defocus(rng, img, (2, 2))
    np.testing.assert_allclose(blurred, img, atol=1e-5)  # blur of constant = constant
    dropped = coarse_dropout(rng, img, max_holes=5, hole_h=10, hole_w=10)
    assert (dropped == 0).any() and dropped.shape == img.shape
