"""Flash-attention kernel tests (Pallas interpret mode vs XLA oracle and
torch SDPA)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diverse_channel_vit_tpu.ops import flash_attention
from diverse_channel_vit_tpu.ops.attention import xla_attention


def _rand_qkv(key, b, h, n, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, n, d), dtype)
    k = jax.random.normal(kk, (b, h, n, d), dtype)
    v = jax.random.normal(kv, (b, h, n, d), dtype)
    return q, k, v


class TestForward:
    @pytest.mark.parametrize("n", [128, 289, 300])
    def test_matches_xla(self, n):
        q, k, v = _rand_qkv(jax.random.PRNGKey(0), 2, 3, n, 64)
        ours = flash_attention(q, k, v)
        ref = xla_attention(q, k, v, 64**-0.5)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5, rtol=1e-4)

    def test_matches_torch_sdpa(self):
        q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 2, 160, 32)
        ours = np.asarray(flash_attention(q, k, v))
        ref = torch.nn.functional.scaled_dot_product_attention(
            torch.tensor(np.asarray(q)), torch.tensor(np.asarray(k)), torch.tensor(np.asarray(v))
        ).numpy()
        np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


class TestBackward:
    @pytest.mark.parametrize("n", [128, 200])
    def test_grads_match_xla(self, n):
        q, k, v = _rand_qkv(jax.random.PRNGKey(2), 1, 2, n, 32)

        def loss_flash(q, k, v):
            o = flash_attention(q, k, v)
            return jnp.sum(jnp.sin(o))

        def loss_xla(q, k, v):
            o = xla_attention(q, k, v, 32**-0.5)
            return jnp.sum(jnp.sin(o))

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3)

    def test_grads_finite_with_padding(self):
        # 289 tokens -> padded to 384 inside the wrapper; grads must be finite
        q, k, v = _rand_qkv(jax.random.PRNGKey(3), 1, 1, 289, 32)
        g = jax.grad(lambda q: jnp.sum(flash_attention(q, k, v) ** 2))(q)
        assert np.isfinite(np.asarray(g)).all()
