"""Native C++ preprocessing kernel: exact agreement with the numpy pipeline."""

import numpy as np
import pytest

from diverse_channel_vit_tpu.data.morphem70k import fold_channels
from diverse_channel_vit_tpu.data.transforms import _bilinear_resize
from diverse_channel_vit_tpu.native import fold_crop_resize_normalize, get_lib

pytestmark = pytest.mark.skipif(get_lib() is None, reason="no C++ toolchain")


@pytest.mark.parametrize("dtype,scale", [(np.uint8, 255.0), (np.uint16, 65535.0)])
def test_fused_matches_numpy(dtype, scale):
    rng = np.random.default_rng(0)
    h, w, c = 37, 29, 3
    tape = rng.integers(0, np.iinfo(dtype).max, size=(h, w * c)).astype(dtype)
    mean = rng.random(c).astype(np.float32)
    std = (rng.random(c) + 0.5).astype(np.float32)
    crop = (5, 3, 25, 21)
    out_hw = 16

    fused = fold_crop_resize_normalize(tape, w, crop, out_hw, mean, std)
    assert fused is not None and fused.shape == (c, out_hw, out_hw)

    chw = fold_channels(tape, w)  # scales by dtype max
    top, left, ch_, cw = crop
    ref = _bilinear_resize(chw[:, top : top + ch_, left : left + cw], out_hw, out_hw)
    ref = (ref - mean[:, None, None]) / std[:, None, None]
    np.testing.assert_allclose(fused, ref, atol=2e-5)


def test_dataset_uses_native_path(tmp_path):
    import pandas as pd
    from PIL import Image

    from diverse_channel_vit_tpu.data.morphem70k import SingleCellDataset

    (tmp_path / "a").mkdir()
    rng = np.random.default_rng(1)
    tape = (rng.random((32, 32 * 3)) * 255).astype(np.uint8)
    Image.fromarray(tape).save(tmp_path / "a/img.tif")
    pd.DataFrame([{"file_path": "a/img.tif", "channel_width": 32, "chunk": "Allen",
                   "label": "M0", "train_test_split": "Train"}]).to_csv(
        tmp_path / "meta.csv", index=False)
    ds = SingleCellDataset(str(tmp_path), file_name="meta.csv", chunk_name="Allen",
                           is_train=True, img_size=16)
    ex = ds.get_example(0, np.random.default_rng(2))
    assert ex["image"].shape == (3, 16, 16)
    assert np.all(np.isfinite(ex["image"]))
