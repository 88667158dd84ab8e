"""Hypernetwork library: channel-id z-vectors -> first-layer conv kernels.

Reference ``models/hypernet.py:9-169``: a 2-layer einsum generator
(optionally with a conv1x1 bottleneck), a batched V2, and two channel-emb
generators. Init parity: ``W``/``W_out``/``W_out_h``/``W_h`` are
kaiming-normal, the biases ``b``/``b_out`` stay plain ``torch.randn``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.initializers import kaiming_normal_init, normal_init

Dtype = Any


class HyperNetwork(nn.Module):
    """z (C, z_dim) -> kernels (out_size, C*in_size, k, k) (``hypernet.py:9-50``)."""

    z_dim: int
    d: int
    kernel_size: int
    out_size: int
    in_size: int = 1
    use_conv1x1: bool = False

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        k = self.kernel_size
        W = self.param("W", kaiming_normal_init(), (self.z_dim, self.in_size, self.d))
        b = self.param("b", normal_init(), (self.in_size, self.d))
        a = jnp.einsum("cz,zid->cid", z, W) + b
        if self.use_conv1x1:
            hid = self.out_size // 4
            W_out_h = self.param("W_out_h", kaiming_normal_init(), (self.d, hid, k, k))
            W_out = self.param("W_out", kaiming_normal_init(), (hid, self.out_size))
            b_out = self.param("b_out", normal_init(), (self.out_size, k, k))
            a = jax.nn.relu(jnp.einsum("cid,dmhw->cimhw", a, W_out_h))
            # (c,i,m,h,w)x(m,o)->(c,i,o,h,w); bias (o,h,w) broadcasts over (c,i)
            K = jnp.einsum("cimhw,mo->ciohw", a, W_out) + b_out
        else:
            W_out = self.param("W_out", kaiming_normal_init(), (self.d, self.out_size, k, k))
            b_out = self.param("b_out", normal_init(), (self.out_size, k, k))
            K = jnp.einsum("cid,dohw->ciohw", a, W_out) + b_out
        c = z.shape[0]
        # (c, i, o, h, w) -> (o, c*i, h, w) (hypernet.py:49)
        return K.transpose(2, 0, 1, 3, 4).reshape(self.out_size, c * self.in_size, k, k)


class HyperNetworkV2(nn.Module):
    """Batched variant: z (B, C, z_dim) -> kernels (B, out, C, k, k)
    (``hypernet.py:53-93``)."""

    z_dim: int
    d: int
    kernel_size: int
    out_size: int
    use_conv1x1: bool = False

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        k = self.kernel_size
        W = self.param("W", kaiming_normal_init(), (self.z_dim, self.d))
        b = self.param("b", normal_init(), (self.d,))
        a = jnp.einsum("bcz,zd->bcd", z, W) + b
        if self.use_conv1x1:
            hid = self.out_size // 4
            W_out_h = self.param("W_out_h", kaiming_normal_init(), (self.d, hid, k, k))
            W_out = self.param("W_out", kaiming_normal_init(), (hid, self.out_size))
            b_out = self.param("b_out", normal_init(), (self.out_size, k, k))
            a = jax.nn.relu(jnp.einsum("bcd,dmhw->bcmhw", a, W_out_h))
            K = jnp.einsum("bcmhw,mo->bcohw", a, W_out) + b_out
        else:
            W_out = self.param("W_out", kaiming_normal_init(), (self.d, self.out_size, k, k))
            b_out = self.param("b_out", normal_init(), (self.out_size, k, k))
            K = jnp.einsum("bcd,dohw->bcohw", a, W_out) + b_out
        return K.transpose(0, 2, 1, 3, 4)  # (B, out, C, k, k)


class HyperNetworkChannelEmbV2(nn.Module):
    """Batched channel-emb generator: z (B, C, z_dim) -> (B, out, C)
    (``hypernet.py:140-169``)."""

    z_dim: int
    d: int
    out_size: int

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        hid = self.out_size // 4
        W = self.param("W", kaiming_normal_init(), (self.z_dim, self.d))
        b = self.param("b", normal_init(), (self.d,))
        W_h = self.param("W_h", kaiming_normal_init(), (self.d, hid))
        W_out = self.param("W_out", kaiming_normal_init(), (hid, self.out_size))
        b_out = self.param("b_out", normal_init(), (self.out_size,))
        out = jax.nn.relu(jnp.einsum("bcz,zd->bcd", z, W) + b)
        out = jax.nn.relu(jnp.einsum("bcd,dh->bch", out, W_h))
        out = jnp.einsum("bch,ho->bco", out, W_out) + b_out
        return out.transpose(0, 2, 1)  # (B, out, C)


class HyperNetworkChannelEmb(nn.Module):
    """z (C, z_dim) -> channel embeddings (out_size, C) (``hypernet.py:96-137``)."""

    z_dim: int
    d: int
    out_size: int
    in_size: int = 1

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        hid = self.out_size // 4
        W = self.param("W", kaiming_normal_init(), (self.z_dim, self.in_size, self.d))
        b = self.param("b", normal_init(), (self.in_size, self.d))
        W_h = self.param("W_h", kaiming_normal_init(), (self.d, hid))
        W_out = self.param("W_out", kaiming_normal_init(), (hid, self.out_size))
        b_out = self.param("b_out", normal_init(), (self.out_size,))
        out = jax.nn.relu(jnp.einsum("cz,zid->cid", z, W) + b)
        out = jax.nn.relu(jnp.einsum("cid,dh->cih", out, W_h))
        out = jnp.einsum("cih,ho->cio", out, W_out) + b_out
        return jnp.mean(out, axis=1).T  # (o, c)
