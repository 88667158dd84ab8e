"""Synthetic dataset — deterministic random images with class-dependent
structure, for tests and benchmarks (the role of the reference's
``++train.debug=True`` 3-batch smoke mode, ``trainer.py:793-795``).

Learnable by design: class k tilts channel means by a fixed per-class
pattern, so a working model/trainer overfits it in a few steps.
"""

from __future__ import annotations

import numpy as np

from .registry import register_dataset


@register_dataset("synthetic")
class SyntheticDataset:
    def __init__(
        self,
        *,
        split: str,
        num_samples: int = 512,
        num_classes: int = 10,
        num_channels: int = 8,
        img_size: int = 32,
        seed: int = 0,
    ):
        self.split = split
        self.num_samples = int(num_samples)
        self.num_classes = int(num_classes)
        self.num_channels = int(num_channels)
        self.img_size = int(img_size)
        root = np.random.default_rng(seed + {"train": 0, "valid": 1, "test": 2}[split])
        self.labels = root.integers(0, self.num_classes, size=self.num_samples)
        # fixed class->channel-mean signature
        sig_rng = np.random.default_rng(1234)
        self.signatures = sig_rng.normal(0, 1, size=(self.num_classes, self.num_channels)).astype(np.float32)
        self.noise_seed = seed * 1000 + {"train": 0, "valid": 1, "test": 2}[split]

    def __len__(self) -> int:
        return self.num_samples

    def get_example(self, index: int, rng=None) -> dict:
        rng = np.random.default_rng(self.noise_seed * self.num_samples + index)
        y = int(self.labels[index])
        img = rng.normal(0, 1, size=(self.num_channels, self.img_size, self.img_size)).astype(np.float32)
        img += self.signatures[y][:, None, None]
        return {"image": img, "label": y}
