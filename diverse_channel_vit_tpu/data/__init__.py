"""Data layer.

TPU-native counterpart of the reference's ``datasets/`` package
(``dataset_utils.py:392`` ``get_train_val_test_loaders`` and friends).
PyTorch DataLoaders + torchvision/albumentations transforms become numpy
pipelines feeding fixed-shape host batches; normalization and the cheap
geometric augmentations run vectorized over the whole batch, and anything
per-pixel-heavy (TPS warping) has an on-device JAX path.
"""

from .loaders import (
    BatchLoader,
    MixedChunkLoader,
    get_classes,
    get_train_val_test_loaders,
    make_random_instance_train_loader,
)
from .normalization import get_mean_std_dataset
from .registry import DATASET_REGISTRY, register_dataset
from . import synthetic  # noqa: F401  (registers "synthetic")
from . import so2sat  # noqa: F401  (registers "so2sat_city")
from . import jump_cp  # noqa: F401  (registers "jump_cp")
from . import morphem70k  # noqa: F401  (registers "morphem70k")
from . import cifar  # noqa: F401  (registers "cifar10"/"cifar100")

__all__ = [
    "BatchLoader",
    "MixedChunkLoader",
    "get_classes",
    "get_train_val_test_loaders",
    "make_random_instance_train_loader",
    "get_mean_std_dataset",
    "DATASET_REGISTRY",
    "register_dataset",
]
