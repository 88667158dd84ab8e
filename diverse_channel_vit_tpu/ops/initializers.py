"""Weight initializers.

``trunc_normal_init`` reproduces the reference's ``trunc_normal_``
(``utils.py:515-517``): a normal(mean, std) truncated in *value space* at
``[a, b]`` via inverse-CDF sampling. Note this differs from
``jax.nn.initializers.truncated_normal``, which truncates at multiples of the
standard deviation.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp


def _norm_cdf(x: float) -> float:
    return (1.0 + math.erf(x / math.sqrt(2.0))) / 2.0


def trunc_normal(
    key: jax.Array,
    shape: Sequence[int],
    mean: float = 0.0,
    std: float = 1.0,
    a: float = -2.0,
    b: float = 2.0,
    dtype: Any = jnp.float32,
) -> jax.Array:
    """Sample from N(mean, std^2) truncated to the interval [a, b]."""
    lo = _norm_cdf((a - mean) / std)
    hi = _norm_cdf((b - mean) / std)
    u = jax.random.uniform(key, tuple(shape), minval=2 * lo - 1, maxval=2 * hi - 1)
    x = jax.scipy.special.erfinv(u)
    x = x * (std * math.sqrt(2.0)) + mean
    return jnp.clip(x, a, b).astype(dtype)


def trunc_normal_init(std: float = 0.02, mean: float = 0.0, a: float = -2.0, b: float = 2.0):
    """Flax-style initializer wrapping :func:`trunc_normal`."""

    def init(key, shape, dtype=jnp.float32):
        return trunc_normal(key, shape, mean=mean, std=std, a=a, b=b, dtype=dtype)

    return init


def scaled_orthogonal_init(scale: float = 1.0):
    """Orthogonal rows/columns (torch ``nn.init.orthogonal_`` semantics)."""

    def init(key, shape, dtype=jnp.float32):
        return scale * jax.nn.initializers.orthogonal()(key, shape, dtype)

    return init


def conv_patch_init(fan_in: int):
    """Uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    Matches the variance of torch's default Conv init (kaiming_uniform with
    a=sqrt(5)), which the reference patch-embed conv keeps
    (``models/dichavit.py:77-82`` never re-initializes ``self.proj``).
    """
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, tuple(shape), minval=-bound, maxval=bound, dtype=dtype)

    return init


def normal_div8_init():
    """randn / 8 — the reference's proxy initializer (``dichavit.py:62,805``)."""

    def init(key, shape, dtype=jnp.float32):
        return (jax.random.normal(key, tuple(shape)) / 8.0).astype(dtype)

    return init


def kaiming_normal_init(fan_in: int | None = None, gain: float = math.sqrt(2.0)):
    """torch ``nn.init.kaiming_normal_`` (fan_in mode): N(0, gain^2/fan_in).

    torch computes fan_in as ``shape[1] * prod(shape[2:])``; pass ``fan_in``
    explicitly to pin it when the JAX parameter layout differs.
    """

    def init(key, shape, dtype=jnp.float32):
        f = fan_in
        if f is None:
            f = shape[1] * int(math.prod(shape[2:])) if len(shape) > 1 else shape[0]
        std = gain / math.sqrt(f)
        return (jax.random.normal(key, tuple(shape)) * std).astype(dtype)

    return init


def normal_init(std: float = 1.0):
    """Plain ``torch.randn`` parameter (std 1 unless scaled)."""

    def init(key, shape, dtype=jnp.float32):
        return (jax.random.normal(key, tuple(shape)) * std).astype(dtype)

    return init
