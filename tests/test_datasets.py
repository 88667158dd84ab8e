"""Dataset tests: JUMP-CP (fixture parquet + npy crops), CHAMMI morphem70k
(tape-format TIFFs), So2Sat (fixture HDF5), and the TPS warp invariants."""

import os

import numpy as np
import pandas as pd
import pytest

from diverse_channel_vit_tpu.data.jump_cp import JUMPCP, split_indices
from diverse_channel_vit_tpu.data.morphem70k import SingleCellDataset, fold_channels
from diverse_channel_vit_tpu.data.so2sat import So2Sat
from diverse_channel_vit_tpu.data.tps import tps_warp_chw


# ---------------------------------------------------------------------------
# TPS
# ---------------------------------------------------------------------------


def test_tps_warp_invariants():
    rng = np.random.default_rng(0)
    img = np.random.default_rng(1).random((3, 64, 64)).astype(np.float32)
    out = tps_warp_chw(rng, img)
    assert out.shape == img.shape
    assert not np.allclose(out, img)  # actually warped
    # same rng state -> same warp
    out2 = tps_warp_chw(np.random.default_rng(0), img)
    np.testing.assert_array_equal(out, out2)
    # constant image is invariant under any resampling
    const = np.full((2, 32, 32), 3.5, np.float32)
    np.testing.assert_allclose(tps_warp_chw(np.random.default_rng(2), const), const, atol=1e-4)


# ---------------------------------------------------------------------------
# JUMP-CP
# ---------------------------------------------------------------------------


def test_split_indices_are_deterministic_and_disjoint():
    tr = split_indices(100, "train")
    va = split_indices(100, "valid")
    te = split_indices(100, "test")
    assert len(tr) == 60 and len(va) == 20 and len(te) == 20
    assert not (set(tr) & set(va)) and not (set(va) & set(te)) and not (set(tr) & set(te))
    np.testing.assert_array_equal(tr, split_indices(100, "train"))


@pytest.fixture
def jumpcp_root(tmp_path):
    root = tmp_path / "jumpcp_root"
    (root / "jumpcp" / "platemap_and_metadata").mkdir(parents=True)
    (root / "imgs").mkdir()
    n = 20
    rng = np.random.default_rng(0)
    paths, wells = [], []
    well_names = [f"A{j:02d}" for j in range(1, 11)]
    for i in range(n):
        p = f"imgs/cell_{i}.npy"
        np.save(root / p, rng.normal(size=(8, 224, 224)).astype(np.float32))
        paths.append(f"s3://insitro-research-2023-context-vit/{p}")
        wells.append(well_names[i % len(well_names)])
    pd.DataFrame({"path": paths, "ID": range(n), "well_loc": wells}).to_parquet(
        root / "jumpcp" / "BR00116991.pq"
    )
    # platemap + metadata (parquet stored under .tsv names, jump_cp.py:36)
    pm_dir = root / "jumpcp" / "platemap_and_metadata"
    for pert, target_col in [("compound", "target"), ("crispr", "gene"), ("orf", "gene")]:
        pd.DataFrame({
            "broad_sample": [f"s{k}" for k in range(8)],
            "well_position": well_names[:8],
        }).to_parquet(pm_dir / f"JUMP-Target-1_{pert}_platemap.tsv")
        pd.DataFrame({
            "broad_sample": [f"s{k}" for k in range(8)],
            target_col: [f"t{k % 3}" for k in range(8)],
        }).to_parquet(pm_dir / f"JUMP-Target-1_{pert}_metadata.tsv")
    return str(root) + "/"


def test_jumpcp_dataset(jumpcp_root):
    ds = JUMPCP(jumpcp_root, split="train", channels=range(8), is_train=True)
    assert len(ds) > 0
    ex = ds.get_example(0, np.random.default_rng(0))
    assert ex["image"].shape == (8, 224, 224)
    assert ex["label"] >= 0
    # unlabeled wells (A09, A10 not in platemap) are filtered out
    full = pd.read_parquet(os.path.join(jumpcp_root, "jumpcp/BR00116991.pq"))
    assert len(ds) <= int(0.6 * len(full))


def test_jumpcp_channel_subset_and_mask(jumpcp_root):
    sub = JUMPCP(jumpcp_root, split="valid", channels=[1, 5, 7], is_train=False)
    assert sub.get_example(0)["image"].shape == (3, 224, 224)
    masked = JUMPCP(jumpcp_root, split="valid", channels=[1, 5, 7], is_train=False,
                    channel_mask=True, scale=None)
    ex = masked.get_example(0)
    assert ex["image"].shape == (8, 224, 224)
    assert np.all(ex["image"][0] == 0) and not np.all(ex["image"][1] == 0)
    assert np.isclose(masked.scale, 8 / 3)


# ---------------------------------------------------------------------------
# morphem70k
# ---------------------------------------------------------------------------


def test_fold_channels_f_order():
    h, w, c = 4, 5, 3
    chw_orig = np.arange(h * w * c, dtype=np.uint8).reshape(c, h, w)
    # build the tape the same way the data was produced: (h, w*c) F-stacking
    tape = np.concatenate([chw_orig[i] for i in range(c)], axis=1)  # (h, w*c)
    out = fold_channels(tape, channel_width=w)
    np.testing.assert_allclose(out, chw_orig.astype(np.float32) / 255.0)


@pytest.fixture
def chammi_root(tmp_path):
    from PIL import Image

    root = tmp_path / "chammi"
    (root / "allen").mkdir(parents=True)
    rows = []
    rng = np.random.default_rng(0)
    classes = ["M0", "M1M2", "M3"]
    for i in range(12):
        tape = (rng.random((32, 32 * 3)) * 255).astype(np.uint8)
        rel = f"allen/img_{i}.tif"
        Image.fromarray(tape).save(root / rel)
        rows.append({
            "file_path": rel, "channel_width": 32, "chunk": "Allen",
            "label": classes[i % 3],
            "train_test_split": "Train" if i < 8 else "Task_one",
        })
    pd.DataFrame(rows).to_csv(root / "meta.csv", index=False)
    return str(root)


def test_morphem70k_dataset(chammi_root):
    ds = SingleCellDataset(chammi_root, file_name="meta.csv", chunk_name="Allen",
                           is_train=True, img_size=16, tps_prob=0.5)
    assert len(ds) == 8  # train rows only
    ex = ds.get_example(0, np.random.default_rng(0))
    assert ex["image"].shape == (3, 16, 16)
    assert ex["label"] in (0, 1, 2)
    ev = SingleCellDataset(chammi_root, file_name="meta.csv", chunk_name="Allen",
                           is_train=False, img_size=16)
    assert len(ev) == 12  # eval keeps all rows (morphem70k.py:66-67)
    assert ev.get_example(3)["image"].shape == (3, 16, 16)


# ---------------------------------------------------------------------------
# So2Sat
# ---------------------------------------------------------------------------


def test_so2sat_dataset(tmp_path):
    import h5py

    n = 10
    rng = np.random.default_rng(0)
    with h5py.File(tmp_path / "validation.h5", "w") as f:
        f["sen1"] = rng.normal(size=(n, 32, 32, 8)).astype(np.float32)
        f["sen2"] = rng.normal(size=(n, 32, 32, 10)).astype(np.float32)
        lab = np.zeros((n, 17), np.uint8)
        lab[np.arange(n), rng.integers(0, 17, n)] = 1
        f["label"] = lab
    ds = So2Sat(str(tmp_path), split="valid", channels=range(18), is_train=True)
    ex = ds.get_example(0, np.random.default_rng(1))
    assert ex["image"].shape == (18, 32, 32)
    assert 0 <= ex["label"] < 17
    sub = So2Sat(str(tmp_path), split="valid", channels=[0, 9, 17], is_train=False)
    assert sub.get_example(0)["image"].shape == (3, 32, 32)


def test_jumpcp_packed_crops_parity(jumpcp_root):
    """scripts/pack_jumpcp.py: the packed-memmap fast path must be picked up
    automatically and return bit-identical examples to per-file .npy IO."""
    from scripts.pack_jumpcp import main as pack

    plain = JUMPCP(jumpcp_root, split="train", channels=range(8), is_train=True)
    assert plain._packed is None

    pack(jumpcp_root)
    packed = JUMPCP(jumpcp_root, split="train", channels=range(8), is_train=True)
    assert packed._packed is not None
    for i in (0, len(plain) - 1):
        a = plain.get_example(i, np.random.default_rng(5))
        b = packed.get_example(i, np.random.default_rng(5))
        np.testing.assert_array_equal(a["image"], b["image"])
        assert a["label"] == b["label"]

    # eval path too (no rng; both dataset objects see the packed file, so
    # force the second one onto per-file IO to compare)
    pe = JUMPCP(jumpcp_root, split="valid", channels=[1, 5, 7], is_train=False)
    assert pe._packed is not None
    pf = JUMPCP(jumpcp_root, split="valid", channels=[1, 5, 7], is_train=False)
    pf._packed = None
    np.testing.assert_array_equal(
        pe.get_example(0)["image"], pf.get_example(0)["image"])


def test_chammi_packed_blob_parity(tmp_path):
    """scripts/pack_chammi.py: the packed-blob fast path returns
    bit-identical examples to per-file TIFF decode, train and eval."""
    from scripts.make_chammi_fixture import main as make_fixture
    from scripts.pack_chammi import main as pack
    from diverse_channel_vit_tpu.data.morphem70k import SingleCellDataset

    root = str(tmp_path / "chammi")
    make_fixture(root, 8)

    plain = SingleCellDataset(root, file_name="morphem70k_v2.csv",
                              chunk_name="HPA", is_train=True, img_size=32)
    assert plain._pack is None

    pack(root)
    packed = SingleCellDataset(root, file_name="morphem70k_v2.csv",
                               chunk_name="HPA", is_train=True, img_size=32)
    assert packed._pack is not None
    for i in (0, len(plain) - 1):
        a = plain.get_example(i, np.random.default_rng(3))
        b = packed.get_example(i, np.random.default_rng(3))
        np.testing.assert_array_equal(a["image"], b["image"])
        assert a["label"] == b["label"]

    pe = SingleCellDataset(root, file_name="morphem70k_v2.csv",
                           chunk_name="CP", is_train=False, img_size=32)
    pf = SingleCellDataset(root, file_name="morphem70k_v2.csv",
                           chunk_name="CP", is_train=False, img_size=32)
    assert pe._pack is not None
    pf._pack = None
    np.testing.assert_array_equal(
        pe.get_example(1)["image"], pf.get_example(1)["image"])


def test_jumpcp_packed_float16_dtype(jumpcp_root):
    """--dtype float16 halves the pack; values round-trip within f16 eps."""
    from scripts.pack_jumpcp import main as pack

    pack(jumpcp_root, dtype="float16")
    ds = JUMPCP(jumpcp_root, split="valid", channels=range(8), is_train=False)
    assert ds._packed is not None and ds._packed.dtype == np.float16
    plain = JUMPCP(jumpcp_root, split="valid", channels=range(8), is_train=False)
    plain._packed = None
    a, b = ds.get_example(0)["image"], plain.get_example(0)["image"]
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
