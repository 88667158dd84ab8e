"""On-device JUMP-CP augmentation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from diverse_channel_vit_tpu.ops.augment import (
    coarse_dropout,
    defocus_batch,
    flip_rotate_one_of,
    jumpcp_train_augment,
    pad_random,
    random_crop,
)


def test_pad_and_crop_shapes():
    img = jnp.ones((8, 224, 224))
    padded = pad_random(jax.random.key(0), img, 256)
    assert padded.shape == (8, 256, 256)
    assert float(jnp.sum(padded)) == float(jnp.sum(img))  # zero border
    cropped = random_crop(jax.random.key(1), padded, 224)
    assert cropped.shape == (8, 224, 224)


def test_flip_rotate_preserves_values():
    img = jax.random.normal(jax.random.key(0), (3, 8, 8))
    out = flip_rotate_one_of(jax.random.key(5), img, p=1.0)
    np.testing.assert_allclose(np.sort(np.asarray(out).ravel()),
                               np.sort(np.asarray(img).ravel()), rtol=1e-6)


def test_defocus_batch_constant_invariant():
    imgs = jnp.full((4, 2, 32, 32), 2.5)
    out = defocus_batch(jax.random.key(0), imgs)
    np.testing.assert_allclose(np.asarray(out), 2.5, atol=1e-5)


def test_coarse_dropout_zeros_holes():
    img = jnp.ones((2, 64, 64))
    out = coarse_dropout(jax.random.key(0), img, 10, 10, 10, p=1.0)
    arr = np.asarray(out)
    assert (arr == 0).any()
    # holes zero all channels at the same spatial location
    assert np.array_equal(arr[0] == 0, arr[1] == 0)


def test_coarse_dropout_and_defocus_p_gating():
    # albumentations defaults apply Defocus/CoarseDropout with p=0.5 —
    # over many keys, roughly half of samples must pass through untouched
    img = jnp.ones((2, 64, 64))
    untouched = sum(
        bool(np.all(np.asarray(coarse_dropout(jax.random.key(s), img, 10, 10, 10)) == 1))
        for s in range(40)
    )
    assert 8 <= untouched <= 32

    imgs = jax.random.uniform(jax.random.key(0), (64, 2, 16, 16))
    out = defocus_batch(jax.random.key(1), imgs)
    same = np.isclose(np.asarray(out), np.asarray(imgs)).all(axis=(1, 2, 3))
    assert 16 <= int(same.sum()) <= 48


def test_full_pipeline_shapes_and_normalization():
    from diverse_channel_vit_tpu.data.normalization import get_mean_std_dataset

    mean, std = get_mean_std_dataset("jump_cp")
    imgs = jax.random.uniform(jax.random.key(0), (4, 8, 224, 224)) * 50
    out = jumpcp_train_augment(
        jax.random.key(1), imgs, jnp.asarray(mean), jnp.asarray(std)
    )
    assert out.shape == (4, 8, 224, 224)
    assert np.all(np.isfinite(np.asarray(out)))
    # two different keys give different augmentations
    out2 = jumpcp_train_augment(
        jax.random.key(2), imgs, jnp.asarray(mean), jnp.asarray(std)
    )
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_jumpcp_dataset_device_augment_flag(tmp_path):
    import pandas as pd

    root = tmp_path / "r"
    (root / "jumpcp" / "platemap_and_metadata").mkdir(parents=True)
    (root / "imgs").mkdir()
    paths, wells = [], []
    for i in range(5):
        np.save(root / f"imgs/c{i}.npy", np.zeros((8, 224, 224), np.float32))
        paths.append(f"s3://insitro-research-2023-context-vit/imgs/c{i}.npy")
        wells.append("A01")
    pd.DataFrame({"path": paths, "ID": range(5), "well_loc": wells}).to_parquet(
        root / "jumpcp" / "BR00116991.pq")
    pm = root / "jumpcp" / "platemap_and_metadata"
    for pert, col in [("compound", "target"), ("crispr", "gene"), ("orf", "gene")]:
        pd.DataFrame({"broad_sample": ["s0"], "well_position": ["A01"]}).to_parquet(
            pm / f"JUMP-Target-1_{pert}_platemap.tsv")
        pd.DataFrame({"broad_sample": ["s0"], col: ["t0"]}).to_parquet(
            pm / f"JUMP-Target-1_{pert}_metadata.tsv")

    from diverse_channel_vit_tpu.data.jump_cp import JUMPCP

    ds = JUMPCP(str(root) + "/", split="train", channels=range(8), is_train=True,
                device_augment=True)
    assert ds.device_augment
    ex = ds.get_example(0, np.random.default_rng(0))
    assert ex["image"].shape == (8, 224, 224)
    np.testing.assert_allclose(ex["image"], 0.0)  # raw, unnormalized
    # subset channels -> falls back to host pipeline
    ds2 = JUMPCP(str(root) + "/", split="train", channels=[0, 1], is_train=True,
                 device_augment=True)
    assert not ds2.device_augment
