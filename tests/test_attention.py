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


def test_flash_packed_valid_len_matches_xla_mask():
    """Padded key positions masked via valid_len must match XLA with the
    same mask, for both forward and gradients (valid region only) — through
    the lane-packed (B, N, H*dh) kernel."""
    from diverse_channel_vit_tpu.ops import attention as A

    b, n_valid, n_pad, h, dh = 2, 100, 128, 3, 16
    d = h * dh
    q = jax.random.normal(jax.random.key(0), (b, n_pad, d))
    k = jax.random.normal(jax.random.key(1), (b, n_pad, d))
    v = jax.random.normal(jax.random.key(2), (b, n_pad, d))

    def ref_fn(q, k, v):
        qh, kh, vh = (
            t.reshape(b, n_pad, h, dh).transpose(0, 2, 1, 3) for t in (q, k, v)
        )
        o = A.xla_attention(qh, kh, vh, dh**-0.5, valid_len=n_valid)
        return o.transpose(0, 2, 1, 3).reshape(b, n_pad, d)

    out = A.flash_attention_packed(q, k, v, h, valid_len=n_valid)
    ref = ref_fn(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out[:, :n_valid]), np.asarray(ref[:, :n_valid]), atol=2e-5
    )

    g1 = jax.grad(
        lambda *a: jnp.sum(
            A.flash_attention_packed(*a, h, valid_len=n_valid)[:, :n_valid] ** 2
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    g2 = jax.grad(
        lambda *a: jnp.sum(ref_fn(*a)[:, :n_valid] ** 2), argnums=(0, 1, 2)
    )(q, k, v)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a[:, :n_valid]), np.asarray(bb[:, :n_valid]), atol=3e-4
        )


def test_dense_attention_branch_masks_padded_keys():
    """The Attention module's dense branch (attn_drop>0 in train /
    impl=xla_capture) must mask padded keys via valid_len like the flash
    path — zero-pad rows LayerNorm into bias-valued keys otherwise
    (advisor round-2 medium finding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diverse_channel_vit_tpu.models.vit import Attention

    b, n_valid, n_pad, d, h = 2, 10, 16, 32, 2
    x = jax.random.normal(jax.random.key(0), (b, n_valid, d))
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n_valid), (0, 0)))

    attn = Attention(num_heads=h, impl="xla_capture")
    params = attn.init(jax.random.key(1), x, train=False)["params"]

    out_ref = attn.apply({"params": params}, x, train=False)
    out_pad, inter = attn.apply(
        {"params": params}, xp, train=False, valid_len=n_valid,
        mutable=["intermediates"],
    )
    # valid-query rows unchanged by padding
    np.testing.assert_allclose(np.asarray(out_pad[:, :n_valid]),
                               np.asarray(out_ref), atol=1e-5)
    probs = np.asarray(inter["intermediates"]["attn_probs"][0])
    # padded KEYS receive zero attention mass from every query
    assert probs[:, :, :, n_valid:].max() < 1e-12
    # dropout-active train path runs the same masked dense branch (smoke)
    attn_d = Attention(num_heads=h, attn_drop=0.5)
    params_d = attn_d.init(jax.random.key(2), x, train=False)["params"]
    out_d = attn_d.apply({"params": params_d}, xp, train=True,
                         valid_len=n_valid, rngs={"dropout": jax.random.key(3)})
    assert np.all(np.isfinite(np.asarray(out_d)))
