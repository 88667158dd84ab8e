"""Per-channel patch embedding ops.

The reference implements channel-wise patch embedding as a
``Conv3d(1, D, kernel=(1, p, p), stride=(1, p, p))`` over ``x.unsqueeze(1)``
(``models/dichavit.py:77-82, 377``). On TPU that is exactly an im2col
reshape followed by one large (B*C*N, p*p) x (p*p, D) matmul — a layout XLA
tiles straight onto the MXU without the conv lowering's overhead, and which
fuses with the channel-embedding add.

All functions keep tokens in the (B, C, N, D) channel-grouped layout; the
flat (B, C*N, D) token grid of the reference (``dichavit.py:414-415``) is a
reshape away.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def extract_patches(x: jax.Array, patch_size: int) -> jax.Array:
    """(B, C, H, W) -> (B, C, N, p*p) non-overlapping patches, row-major."""
    b, c, h, w = x.shape
    p = patch_size
    h0, w0 = h // p, w // p
    x = x.reshape(b, c, h0, p, w0, p)
    x = x.transpose(0, 1, 2, 4, 3, 5)
    return x.reshape(b, c, h0 * w0, p * p)


def per_channel_patch_embed(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    patch_size: int,
) -> jax.Array:
    """Shared-projection per-channel patch embedding.

    x: (B, C, H, W); kernel: (p*p, D) — the flattened Conv3d(1, D, (1,p,p))
    weight; bias: (D,). Returns (B, C, N, D).

    The projection is *shared* across channels (the defining property of
    ChannelViT's ``PatchEmbedPerChannel``): every channel's patches go
    through the same p*p -> D map; channel identity enters via the additive
    channel embedding.
    """
    patches = extract_patches(x, patch_size)
    tokens = jnp.einsum(
        "bcnp,pd->bcnd", patches, kernel, preferred_element_type=jnp.float32
    ).astype(kernel.dtype)
    if bias is not None:
        tokens = tokens + bias
    return tokens


def add_channel_embedding(tokens: jax.Array, channel_embed: jax.Array) -> jax.Array:
    """tokens (B, C, N, D) + channel_embed (C, D) or (B, C, D), broadcast over N.

    Reference: ``x += channel_embed.unsqueeze(-1).unsqueeze(-1)``
    (``dichavit.py:409-411``).
    """
    if channel_embed.ndim == 2:
        return tokens + channel_embed[None, :, None, :]
    return tokens + channel_embed[:, :, None, :]
