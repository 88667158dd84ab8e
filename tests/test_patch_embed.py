"""Per-channel patch embedding vs the reference's Conv3d formulation."""

import jax.numpy as jnp
import numpy as np
import torch

from diverse_channel_vit_tpu.ops.patch_embed import (
    add_channel_embedding,
    extract_patches,
    per_channel_patch_embed,
)


class TestPatchEmbed:
    def test_matches_conv3d(self):
        # reference: Conv3d(1, D, kernel=(1,p,p), stride=(1,p,p)) over x.unsqueeze(1)
        # (models/dichavit.py:77-82, 377)
        rng = np.random.default_rng(0)
        b, c, h, w, p, d = 2, 5, 16, 16, 4, 12
        x = rng.normal(size=(b, c, h, w)).astype(np.float32)
        wconv = rng.normal(size=(d, 1, 1, p, p)).astype(np.float32)
        bias = rng.normal(size=(d,)).astype(np.float32)

        conv = torch.nn.Conv3d(1, d, kernel_size=(1, p, p), stride=(1, p, p))
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(wconv))
            conv.bias.copy_(torch.tensor(bias))
        ref = conv(torch.tensor(x).unsqueeze(1))  # (B, D, C, h0, w0)
        ref = ref.permute(0, 2, 3, 4, 1).reshape(b, c, (h // p) * (w // p), d)

        kernel = jnp.array(wconv.reshape(d, p * p).T)  # (p*p, D) row-major patches
        ours = per_channel_patch_embed(jnp.array(x), kernel, jnp.array(bias), patch_size=p)
        np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(), atol=1e-4, rtol=1e-4)

    def test_extract_patches_layout(self):
        # row-major patch ordering, row-major pixels inside a patch
        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 1, 4, 4)
        patches = extract_patches(x, 2)
        np.testing.assert_array_equal(
            np.asarray(patches[0, 0]),
            [[0, 1, 4, 5], [2, 3, 6, 7], [8, 9, 12, 13], [10, 11, 14, 15]],
        )

    def test_channel_embedding_broadcast(self):
        tokens = jnp.zeros((2, 3, 4, 8))
        emb = jnp.arange(24, dtype=jnp.float32).reshape(3, 8)
        out = add_channel_embedding(tokens, emb)
        assert out.shape == (2, 3, 4, 8)
        np.testing.assert_array_equal(np.asarray(out[1, 2, 3]), np.asarray(emb[2]))
