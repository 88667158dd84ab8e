"""CHAMMI / morphem70k dataset (mixed 3/4/5-channel microscopy chunks).

Reference: ``datasets/morphem70k.py`` — one CSV drives all three chunks
(Allen/WTC-11 3ch, HPA 4ch, CP 5ch); images are stored in "tape" format
``(h, w*c)`` TIFFs unfolded to ``(c, h, w)`` via a Fortran-order reshape
(``_fold_channels`` :163-186); train rows filter on
``train_test_split == "Train"``; per-chunk class dicts (:77-156).

Train pipeline (``dataset_utils.py:233-280``): TPS(p) -> RandomResizedCrop
(0.8-1.0, ratio 0.9-1.1) -> HFlip -> per-chunk Normalize. Eval: Resize ->
CenterCrop -> Normalize.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .normalization import get_mean_std_dataset, normalize_chw
from .registry import register_dataset
from .tps import tps_warp_chw
from .transforms import center_crop, hflip, random_resized_crop, resize, sample_rrc_params

TRAIN_CLASS_DICTS = {
    "Allen": {"M0": 0, "M1M2": 1, "M3": 2, "M4M5": 3, "M6M7_complete": 4, "M6M7_single": 5},
    "HPA": {"golgi apparatus": 0, "microtubules": 1, "mitochondria": 2, "nuclear speckles": 3},
    "CP": {"BRD-A29260609": 0, "BRD-K04185004": 1, "BRD-K21680192": 2, "DMSO": 3},
    "morphem70k": {
        "BRD-A29260609": 0, "BRD-K04185004": 1, "BRD-K21680192": 2, "DMSO": 3,
        "M0": 4, "M1M2": 5, "M3": 6, "M4M5": 7, "M6M7_complete": 8, "M6M7_single": 9,
        "golgi apparatus": 10, "microtubules": 11, "mitochondria": 12, "nuclear speckles": 13,
    },
}


def fold_channels(image: np.ndarray, channel_width: int) -> np.ndarray:
    """Tape (h, w*c) -> (c, h, w) float in [0, 1] (``morphem70k.py:163-186``)."""
    hwc = np.reshape(image, (image.shape[0], channel_width, -1), order="F")
    chw = np.transpose(hwc, (2, 0, 1)).astype(np.float32)
    if image.dtype == np.uint8:
        chw /= 255.0
    elif image.dtype == np.uint16:
        chw /= 65535.0
    return chw


PACKED_BIN = "chammi_packed.bin"


def _read_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im)


def _open_pack(root_dir: str, file_paths) -> "tuple | None":
    """(memmap, index) when a packed blob (scripts/pack_chammi.py) exists
    and covers EVERY requested row, else None."""
    bin_path = os.path.join(root_dir, PACKED_BIN)
    if not (os.path.exists(bin_path) and os.path.exists(bin_path + ".index.json")):
        return None
    import json

    with open(bin_path + ".index.json") as f:
        index = json.load(f)
    if any(p not in index for p in file_paths):
        return None
    return np.memmap(bin_path, dtype=np.uint8, mode="r"), index


@register_dataset("morphem70k")
class SingleCellDataset:
    """One CHAMMI chunk (or a '_'-joined combination)."""

    def __init__(
        self,
        root_dir: str,
        *,
        file_name: str,
        chunk_name: str,
        is_train: bool,
        img_size: int = 224,
        target_labels: str = "label",
        tps_prob: float = 0.0,
        ssl_flag: bool = False,
    ):
        import pandas as pd

        self.chunk = chunk_name
        self.is_train = is_train
        self.img_size = img_size
        self.tps_prob = tps_prob
        self.root_dir = root_dir
        # SSL two-view generator (``ContrastiveLearningViewGenerator``,
        # ``dataset_utils.py:79-87``): two independent augmentations stacked
        # on a new leading axis. NOTE: the reference wires the flag through
        # the data layer but its trainer never consumes ``ssl_lambda`` — the
        # SSL loss is dead config there; we reproduce the data surface.
        self.ssl_flag = ssl_flag

        meta = pd.read_csv(os.path.join(root_dir, file_name))
        if chunk_name in ("Allen", "HPA", "CP"):
            meta = meta[meta["chunk"] == chunk_name]
        elif chunk_name not in ("morphem70k", "Allen_HPA_CP"):
            parts = chunk_name.split("_")
            meta = meta[meta["chunk"].isin(parts)]
        if is_train:
            meta = meta[meta["train_test_split"] == "Train"]
        meta = meta.reset_index(drop=True)
        self.file_paths = list(meta["file_path"])
        self.channel_widths = list(meta["channel_width"])
        self.chunks_col = list(meta["chunk"]) if "chunk" in meta else [chunk_name] * len(meta)
        self.raw_labels = list(meta[target_labels]) if target_labels in meta else [None] * len(meta)

        if chunk_name in TRAIN_CLASS_DICTS:
            self.train_classes_dict = TRAIN_CLASS_DICTS[chunk_name]
        else:  # '_'-joined combination: concatenated per-chunk vocabularies
            d, off = {}, 0
            for part in ("Allen", "HPA", "CP"):
                if part in chunk_name:
                    for k, v in TRAIN_CLASS_DICTS[part].items():
                        d[k] = off + v
                    off += len(TRAIN_CLASS_DICTS[part])
            self.train_classes_dict = d

        self.mean_stds = get_mean_std_dataset("morphem70k")
        self._pack = _open_pack(root_dir, self.file_paths)

    def _read(self, index: int) -> np.ndarray:
        if self._pack is not None:
            buf, idx = self._pack
            off, h, w, dt = idx[self.file_paths[index]]
            n = h * w * np.dtype(dt).itemsize
            return buf[off:off + n].view(dt).reshape(h, w)
        return _read_image(os.path.join(self.root_dir, self.file_paths[index]))

    def __len__(self) -> int:
        return len(self.file_paths)

    def _train_view(self, rng, tape, channel_width, mean, std) -> np.ndarray:
        """One augmented train view. TPS-free draws take the native fused
        unfold+RRC+normalize path (exact RRC semantics, one pass over the
        tape); TPS draws and toolchain-free hosts use the numpy pipeline."""
        tps_fire = self.tps_prob > 0 and rng.random() <= self.tps_prob
        w = int(channel_width)
        if not tps_fire:
            from ..native import fold_crop_resize_normalize

            crop = sample_rrc_params(rng, tape.shape[0], w, scale=(0.8, 1.0), ratio=(0.9, 1.1))
            out = fold_crop_resize_normalize(tape, w, crop, self.img_size, mean, std)
            if out is not None:
                return hflip(out) if rng.random() < 0.5 else out
            # numpy fallback reusing the already-sampled crop
            chw = fold_channels(tape, w)
            top, left, ch_, cw = crop
            from .transforms import _bilinear_resize

            out = _bilinear_resize(chw[:, top : top + ch_, left : left + cw],
                                   self.img_size, self.img_size)
            out = normalize_chw(hflip(out) if rng.random() < 0.5 else out, mean, std)
            return out
        chw = tps_warp_chw(rng, fold_channels(tape, w))
        out = random_resized_crop(rng, chw, self.img_size, scale=(0.8, 1.0), ratio=(0.9, 1.1))
        if rng.random() < 0.5:
            out = hflip(out)
        return normalize_chw(out, mean, std)

    def get_example(self, index: int, rng: Optional[np.random.Generator] = None) -> dict:
        img = self._read(index)
        chunk = self.chunks_col[index]
        mean, std = self.mean_stds[chunk]
        cw = self.channel_widths[index]
        if self.is_train:
            rng = rng or np.random.default_rng()
            if self.ssl_flag:
                out = np.stack([self._train_view(rng, img, cw, mean, std) for _ in range(2)])
            else:
                out = self._train_view(rng, img, cw, mean, std)
        else:
            chw = fold_channels(img, int(cw))
            out = normalize_chw(center_crop(resize(chw, self.img_size), self.img_size), mean, std)
        label = self.raw_labels[index]
        label = self.train_classes_dict.get(label, -1) if label is not None else -1
        return {"image": out.astype(np.float32), "label": int(label)}
