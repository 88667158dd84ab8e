"""Data layer.

TPU-native counterpart of the reference's ``datasets/`` package
(``dataset_utils.py:392`` ``get_train_val_test_loaders`` and friends).
PyTorch DataLoaders + torchvision/albumentations transforms become numpy
pipelines feeding fixed-shape host batches; normalization and the cheap
geometric augmentations run vectorized over the whole batch, and anything
per-pixel-heavy (TPS warping) has an on-device JAX path.
"""

from .loaders import BatchLoader, get_train_val_test_loaders, make_random_instance_train_loader
from .normalization import get_mean_std_dataset
from .registry import DATASET_REGISTRY, register_dataset

__all__ = [
    "BatchLoader",
    "get_train_val_test_loaders",
    "make_random_instance_train_loader",
    "get_mean_std_dataset",
    "DATASET_REGISTRY",
    "register_dataset",
]
