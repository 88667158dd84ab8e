"""On-device batched augmentation (JUMP-CP pipeline).

The reference runs albumentations per image on the host
(``jump_cp_transforms.py:105-141``); at 224^2 x 8 channels the Defocus
convolution alone costs tens of ms per image — enough to starve a TPU whose
train step is a few hundred ms per 64-image batch. This module implements
the same pipeline as one jitted batch transform executed on device, fused
into the training step:

    pad-to-256 (random position) -> random crop 224 -> one-of
    {hflip, vflip, rot90, rot180, rot270} (p=0.5) -> Defocus(r in 1..3) ->
    CoarseDropout(10 x 10x10) -> normalize

All randomness comes from an explicit PRNG key; every sample draws its own
parameters (vmap over the batch).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _disc_kernel(r: int) -> np.ndarray:
    y, x = np.mgrid[-r : r + 1, -r : r + 1]
    k = ((x * x + y * y) <= r * r).astype(np.float32)
    return k / k.sum()


def pad_random(key: jax.Array, img: jax.Array, pad_to: int) -> jax.Array:
    """Zero-pad to (pad_to, pad_to) at a random position (PadIfNeeded random)."""
    c, h, w = img.shape
    ph, pw = max(0, pad_to - h), max(0, pad_to - w)
    if ph == 0 and pw == 0:
        return img
    k1, k2 = jax.random.split(key)
    top = jax.random.randint(k1, (), 0, ph + 1)
    left = jax.random.randint(k2, (), 0, pw + 1)
    canvas = jnp.zeros((c, pad_to, pad_to), img.dtype)
    return jax.lax.dynamic_update_slice(canvas, img, (0, top, left))


def random_crop(key: jax.Array, img: jax.Array, size: int) -> jax.Array:
    c, h, w = img.shape
    k1, k2 = jax.random.split(key)
    top = jax.random.randint(k1, (), 0, h - size + 1)
    left = jax.random.randint(k2, (), 0, w - size + 1)
    return jax.lax.dynamic_slice(img, (0, top, left), (c, size, size))


def flip_rotate_one_of(key: jax.Array, img: jax.Array, p: float = 0.5) -> jax.Array:
    """A.OneOf([HFlip, VFlip, Rot90, Rot180, Rot270]) with probability p."""
    k1, k2 = jax.random.split(key)
    apply = jax.random.uniform(k1) <= p
    choice = jax.random.randint(k2, (), 0, 5)
    branches = [
        lambda x: jnp.flip(x, 2),
        lambda x: jnp.flip(x, 1),
        lambda x: jnp.rot90(x, 1, (1, 2)),
        lambda x: jnp.rot90(x, 2, (1, 2)),
        lambda x: jnp.rot90(x, 3, (1, 2)),
    ]
    out = jax.lax.switch(choice, branches, img)
    return jnp.where(apply, out, img)


def defocus_batch(
    key: jax.Array, imgs: jax.Array, radii: Sequence[int] = (1, 2, 3), p: float = 0.5
) -> jax.Array:
    """Per-sample random-radius disc blur: one grouped conv per radius, then
    a per-sample select — 3 cheap convs beat a dynamic kernel. Applied with
    per-sample probability ``p`` (albumentations' A.Defocus default 0.5,
    ``jump_cp_transforms.py:136``)."""
    b, c, h, w = imgs.shape
    outs = []
    for r in radii:
        k = jnp.asarray(_disc_kernel(r), imgs.dtype)[None, None]  # (1, 1, 2r+1, 2r+1)
        kern = jnp.broadcast_to(k, (c, 1, 2 * r + 1, 2 * r + 1))
        y = jax.lax.conv_general_dilated(
            jnp.pad(imgs, ((0, 0), (0, 0), (r, r), (r, r)), mode="reflect"),
            kern, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=c,
        )
        outs.append(y)
    stacked = jnp.stack(outs, axis=0)  # (R, B, C, H, W)
    kp, kr = jax.random.split(key)
    pick = jax.random.randint(kr, (b,), 0, len(radii))
    blurred = jnp.take_along_axis(stacked, pick[None, :, None, None, None], axis=0)[0]
    apply = jax.random.uniform(kp, (b,)) <= p
    return jnp.where(apply[:, None, None, None], blurred, imgs)


def coarse_dropout(
    key: jax.Array, img: jax.Array, holes: int, hh: int, hw: int, p: float = 0.5
) -> jax.Array:
    """A.CoarseDropout at its default per-sample p=0.5
    (``jump_cp_transforms.py:128``)."""
    c, h, w = img.shape
    ky, kx, kp = jax.random.split(key, 3)
    ys = jax.random.randint(ky, (holes,), 0, max(1, h - hh))
    xs = jax.random.randint(kx, (holes,), 0, max(1, w - hw))
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (
        (row[None] >= ys[:, None, None]) & (row[None] < ys[:, None, None] + hh)
        & (col[None] >= xs[:, None, None]) & (col[None] < xs[:, None, None] + hw)
    ).any(axis=0)
    inside = inside & (jax.random.uniform(kp) <= p)
    return jnp.where(inside[None], 0.0, img)


@functools.partial(jax.jit, static_argnames=("img_size", "pad_to"))
def jumpcp_train_augment(
    key: jax.Array,
    imgs: jax.Array,
    mean: jax.Array,
    std: jax.Array,
    *,
    img_size: int = 224,
    pad_to: int = 256,
) -> jax.Array:
    """Full CellAugmentation train pipeline on a (B, C, H, W) raw batch."""
    b = imgs.shape[0]
    keys = jax.random.split(key, b * 4).reshape(b, 4)  # typed keys reshape

    def geo(img, ks):
        img = pad_random(ks[0], img, pad_to)
        img = random_crop(ks[1], img, img_size)
        return flip_rotate_one_of(ks[2], img)

    out = jax.vmap(geo)(imgs, keys)
    out = defocus_batch(jax.random.fold_in(key, 7), out)
    out = jax.vmap(lambda img, ks: coarse_dropout(ks[3], img, 10, 10, 10))(out, keys)
    return (out - mean[None, :, None, None]) / std[None, :, None, None]
