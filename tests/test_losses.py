"""Loss parity tests.

Oracles are implemented in torch (CPU) directly from the reference formulas
(``models/loss_fn.py:7-59``, ``utils.py:461-465``) — independent code path,
not a port of ours.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from diverse_channel_vit_tpu.ops import (
    orthogonal_projection_loss,
    orthogonal_projection_loss_dense,
    proxy_loss,
)


def torch_proxy_loss(proxies, img_emb, gt, scale):
    # reference loss_fn.py:7-21 with pairwise_distance_v2 = cdist**2
    proxies_emb = scale * F.normalize(proxies, p=2, dim=-1)
    img_emb = scale * F.normalize(img_emb, p=2, dim=-1)
    img_dist = torch.cdist(img_emb, proxies_emb, p=2) ** 2 * -1.0
    return F.cross_entropy(img_dist, gt)


def torch_ortho_loss(features, labels, gamma_s, gamma_d, reverse_pos_pairs, use_square):
    # reference loss_fn.py:24-59
    features = F.normalize(features, p=2, dim=-1)
    labels = labels[None, :, None]
    mask = torch.eq(labels, labels.transpose(-2, -1)).bool()
    eye = torch.eye(mask.shape[-2], mask.shape[-1]).bool().unsqueeze(0)
    mask_pos = mask.masked_fill(eye, 0).float()
    mask_neg = (~mask).float()
    dot_prod = torch.matmul(features, features.transpose(-2, -1))
    pos_pairs_mean = (mask_pos * dot_prod).sum(dim=(-2, -1)) / (mask_pos.sum(dim=(-2, -1)) + 1e-6)
    neg_pairs_mean = (mask_neg * dot_prod).sum(dim=(-2, -1)) / (mask_neg.sum(dim=(-2, -1)) + 1e-6)
    if use_square:
        neg_pairs_mean = neg_pairs_mean**2
    if reverse_pos_pairs:
        if use_square:
            pos_pairs_mean = pos_pairs_mean**2
        loss = gamma_s * pos_pairs_mean + gamma_d * neg_pairs_mean
    else:
        loss = gamma_s * (1.0 - pos_pairs_mean) + gamma_d * neg_pairs_mean
    return loss.mean()


class TestProxyLoss:
    def test_matches_reference_int_labels(self):
        rng = np.random.default_rng(0)
        proxies = rng.normal(size=(7, 16)).astype(np.float32)
        emb = rng.normal(size=(12, 16)).astype(np.float32)
        labels = rng.integers(0, 7, size=(12,))
        scale = np.sqrt(1.0 / 0.11111)
        ours = proxy_loss(jnp.array(proxies), jnp.array(emb), jnp.array(labels), scale)
        ref = torch_proxy_loss(
            torch.tensor(proxies), torch.tensor(emb), torch.tensor(labels), scale
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    def test_matches_reference_onehot_labels(self):
        # CDL uses gt = eye(Cin) (dichavit.py:399-404)
        rng = np.random.default_rng(1)
        c, d = 5, 8
        proxies = rng.normal(size=(c, d)).astype(np.float32)
        emb = rng.normal(size=(c, d)).astype(np.float32)
        eye = np.eye(c, dtype=np.float32)
        scale = 3.0
        ours = proxy_loss(jnp.array(proxies), jnp.array(emb), jnp.array(eye), scale)
        ref = torch_proxy_loss(
            torch.tensor(proxies), torch.tensor(emb), torch.tensor(eye), scale
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


class TestOrthoLoss:
    @pytest.mark.parametrize("reverse_pos_pairs", [False, True])
    @pytest.mark.parametrize("use_square", [False, True])
    def test_matches_reference(self, reverse_pos_pairs, use_square):
        rng = np.random.default_rng(2)
        b, c, n, d = 3, 4, 5, 16
        feats = rng.normal(size=(b, c, n, d)).astype(np.float32)
        labels = np.repeat(np.arange(c), n)
        ref = torch_ortho_loss(
            torch.tensor(feats.reshape(b, c * n, d)),
            torch.tensor(labels),
            gamma_s=0.5,
            gamma_d=2.0,
            reverse_pos_pairs=reverse_pos_pairs,
            use_square=use_square,
        )
        ours = orthogonal_projection_loss(
            jnp.array(feats),
            gamma_s=0.5,
            gamma_d=2.0,
            reverse_pos_pairs=reverse_pos_pairs,
            use_square=use_square,
        )
        np.testing.assert_allclose(float(ours), float(ref), rtol=2e-4)

    def test_dense_matches_factored(self):
        rng = np.random.default_rng(3)
        b, c, n, d = 2, 3, 7, 8
        feats = rng.normal(size=(b, c, n, d)).astype(np.float32)
        labels = jnp.repeat(jnp.arange(c), n)
        dense = orthogonal_projection_loss_dense(
            jnp.array(feats.reshape(b, c * n, d)), labels, 1.0, 0.5, False, False
        )
        fact = orthogonal_projection_loss(jnp.array(feats), 1.0, 0.5, False, False)
        np.testing.assert_allclose(float(fact), float(dense), rtol=2e-4)

    def test_channel_mask_equals_slicing(self):
        # masked channels must reproduce the loss computed on the sliced array
        rng = np.random.default_rng(4)
        b, c, n, d = 2, 5, 4, 8
        feats = rng.normal(size=(b, c, n, d)).astype(np.float32)
        mask = jnp.array([True, True, False, True, False])
        masked = orthogonal_projection_loss(
            jnp.array(feats), 0.5, 2.0, True, False, channel_mask=mask
        )
        sliced = orthogonal_projection_loss(
            jnp.array(feats[:, [0, 1, 3]]), 0.5, 2.0, True, False
        )
        np.testing.assert_allclose(float(masked), float(sliced), rtol=1e-5)

    def test_grads_flow(self):
        feats = jnp.array(np.random.default_rng(5).normal(size=(1, 3, 4, 8)), jnp.float32)
        g = jax.grad(lambda f: orthogonal_projection_loss(f, 1.0, 1.0, False, False))(feats)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0
