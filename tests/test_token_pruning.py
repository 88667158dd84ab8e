"""Token-reduction tests: PPT scores, top-k/channel selection, HCS dropout,
BlockV2 pruning inside the backbone."""

import jax
import jax.numpy as jnp
import numpy as np

from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
from diverse_channel_vit_tpu.ops.token_pruning import (
    evit_cls_attention_select,
    ppt_significance_scores,
    random_channel_drop,
    random_token_drop,
    topk_channel_select,
    topk_token_select,
)


def test_ppt_scores_normalized():
    rng = jax.random.key(0)
    attn = jax.nn.softmax(jax.random.normal(rng, (2, 3, 9, 9)), axis=-1)
    v = jax.random.normal(jax.random.key(1), (2, 3, 9, 8))
    s = ppt_significance_scores(attn, v)
    assert s.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(jnp.sum(s, axis=1)), 1.0, rtol=1e-5)


def test_topk_token_select_keeps_cls_and_best():
    x = jnp.arange(2 * 9 * 4, dtype=jnp.float32).reshape(2, 9, 4)
    scores = jnp.asarray([[0.1, 0.9, 0.2, 0.8, 0.3, 0.7, 0.4, 0.6]] * 2)
    out = topk_token_select(x, scores, 3)
    assert out.shape == (2, 4, 4)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(x[:, 0]))  # CLS
    # best tokens are positions 1, 3, 5 of the tail -> x indices 2, 4, 6
    np.testing.assert_array_equal(np.asarray(out[0, 1]), np.asarray(x[0, 2]))


def test_topk_channel_select_groups():
    b, nc, hw, d = 2, 4, 3, 5
    x = jax.random.normal(jax.random.key(0), (b, 1 + nc * hw, d))
    scores = jnp.zeros((b, nc * hw)).at[:, 0:hw].set(5.0).at[:, 2 * hw : 3 * hw].set(3.0)
    out = topk_channel_select(x, scores, nc, 2)
    assert out.shape == (b, 1 + 2 * hw, d)
    # channels 0 and 2 kept, in index order
    np.testing.assert_allclose(np.asarray(out[:, 1 : 1 + hw]), np.asarray(x[:, 1 : 1 + hw]))
    np.testing.assert_allclose(
        np.asarray(out[:, 1 + hw :]), np.asarray(x[:, 1 + 2 * hw : 1 + 3 * hw])
    )


def test_random_drops_shapes_and_cls():
    x = jax.random.normal(jax.random.key(0), (2, 1 + 6 * 4, 8))
    out = random_token_drop(jax.random.key(1), x, 12)
    assert out.shape == (2, 13, 8)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(x[:, 0]))
    out2 = random_channel_drop(jax.random.key(2), x, 6, 3)
    assert out2.shape == (2, 1 + 3 * 4, 8)


def test_evit_wired_through_channel_vit():
    """model.keep_rate < 1 routes layers depth/4, depth/2, 3depth/4 through
    BlockEViT (reference Attention_EVIT's fuse point); forward + grads run.
    The EViT block's parameter tree is IDENTICAL to the plain Block, so
    keep_rate is a runtime knob: dense-trained weights serve pruned."""
    import jax

    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer

    kw = dict(num_total_channels=3, img_size=32, patch_size=16, embed_dim=64,
              depth=4, num_heads=2, attention_impl="xla")
    full = ChannelVisionTransformer(**kw)
    pruned = ChannelVisionTransformer(**kw, keep_rate=0.5)
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    cids = jnp.arange(3)
    p = pruned.init({"params": jax.random.key(1)}, x, cids, train=False)["params"]
    out_p, _ = pruned.apply({"params": p}, x, cids, train=False)
    assert out_p.shape == (2, 64)

    def loss(p):
        out, _ = pruned.apply({"params": p}, x, cids, train=True,
                              rngs={"dropout": jax.random.key(2)})
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(p)
    assert all(
        bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g)
    )
    # tree parity: the same params drive both the dense and the pruned model,
    # and pruning actually changes the function
    out_f, _ = full.apply({"params": p}, x, cids, train=False)
    assert out_f.shape == (2, 64)
    assert not np.allclose(np.asarray(out_f), np.asarray(out_p), atol=1e-4)


def test_evit_select():
    x = jax.random.normal(jax.random.key(0), (2, 9, 4))
    attn = jax.nn.softmax(jax.random.normal(jax.random.key(1), (2, 2, 9, 9)), axis=-1)
    out = evit_cls_attention_select(x, attn, 0.5)
    assert out.shape == (2, 5, 4)
    assert evit_cls_attention_select(x, attn, 1.0).shape == x.shape


def _backbone(**kw):
    return ChannelVisionTransformer(
        num_total_channels=6, img_size=16, patch_size=8, embed_dim=32, depth=2,
        num_heads=2, attention_impl="xla", **kw,
    )


def test_backbone_hcs_token_dropout():
    m = _backbone(dropout_tokens_hcs="channel_random50")
    x = jax.random.normal(jax.random.key(0), (2, 6, 16, 16))
    cids = jnp.arange(6)
    params = m.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                    x, cids, train=False)["params"]
    out, _ = m.apply({"params": params}, x, cids, train=True,
                     rngs={"dropout": jax.random.key(3)})
    assert out.shape == (2, 32)
    # eval path unaffected
    out_eval, _ = m.apply({"params": params}, x, cids, train=False)
    assert np.all(np.isfinite(np.asarray(out_eval)))


def test_backbone_block_v2_pruning():
    for method in ("token_pruning", "channel_pruning"):
        m = _backbone(block_type="block_v2", dropout_tokens_hcs=method,
                      token_keep_channels=3)
        x = jax.random.normal(jax.random.key(0), (2, 6, 16, 16))
        cids = jnp.arange(6)
        params = m.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                        x, cids, train=False)["params"]
        out, _ = m.apply({"params": params}, x, cids, train=True,
                         rngs={"dropout": jax.random.key(3)})
        assert out.shape == (2, 32)
        g = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x, cids, train=True,
                                               rngs={"dropout": jax.random.key(4)})[0] ** 2))(params)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(g))


def test_attention_with_scores_matches_dense_oracle():
    """Flash-path AttentionWithScores == the dense-probability formulation:
    output equals einsum attention, scores equal ppt_significance_scores of
    the full matrix (the CLS row + v-norm recompute is exact)."""
    from diverse_channel_vit_tpu.models.vit import AttentionWithScores

    b, n, c, h = 2, 9, 16, 2
    dh = c // h
    att = AttentionWithScores(num_heads=h, impl="xla")
    x = jax.random.normal(jax.random.key(0), (b, n, c))
    p = att.init({"params": jax.random.key(1)}, x, train=False)["params"]
    out, scores = att.apply({"params": p}, x, train=False)

    q, k, v = (x @ p[w]["kernel"] + p[w]["bias"] for w in ("wq", "wk", "wv"))
    qh, kh, vh = (t.reshape(b, n, h, dh).transpose(0, 2, 1, 3) for t in (q, k, v))
    attn = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * dh**-0.5, -1)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, vh).transpose(0, 2, 1, 3).reshape(b, n, c)
    o = o @ p["proj"]["kernel"] + p["proj"]["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(o), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(scores),
                               np.asarray(ppt_significance_scores(attn, vh)),
                               rtol=2e-5, atol=2e-5)


def test_block_evit_matches_dense_oracle():
    """The flash+CLS-row BlockEViT equals the reference's dense-probability
    formulation (full (B,H,N,N) softmax -> evit_cls_attention_select) with
    the same parameters — the O(N.dh) score recompute is exact, not an
    approximation."""
    from diverse_channel_vit_tpu.models.vit import BlockEViT

    b, n, c, h, keep_rate = 2, 9, 16, 2, 0.5
    blk = BlockEViT(num_heads=h, keep_rate=keep_rate, attention_impl="xla")
    x = jax.random.normal(jax.random.key(0), (b, n, c))
    p = blk.init({"params": jax.random.key(1)}, x, train=False)["params"]
    out, new_valid = blk.apply({"params": p}, x, train=False)
    assert new_valid is None
    assert out.shape == (b, 1 + int(keep_rate * (n - 1)), c)

    # dense oracle, replicating the old formulation from the same params
    def dense_oracle(x):
        def ln(x, sp):
            mu = jnp.mean(x, -1, keepdims=True)
            var = jnp.var(x, -1, keepdims=True)
            return (x - mu) / jnp.sqrt(var + 1e-6) * sp["scale"] + sp["bias"]

        dh = c // h
        y = ln(x, p["norm1"])
        q, k, v = (y @ p["attn"][w]["kernel"] + p["attn"][w]["bias"]
                   for w in ("wq", "wk", "wv"))
        qh, kh, vh = (t.reshape(b, n, h, dh).transpose(0, 2, 1, 3) for t in (q, k, v))
        attn = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * dh**-0.5, -1)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, vh).transpose(0, 2, 1, 3).reshape(b, n, c)
        o = o @ p["attn"]["proj"]["kernel"] + p["attn"]["proj"]["bias"]
        x = x + o
        x = evit_cls_attention_select(x, attn, keep_rate)
        z = ln(x, p["norm2"])
        from diverse_channel_vit_tpu.ops.activations import gelu

        z = gelu(z @ p["mlp"]["fc1"]["kernel"] + p["mlp"]["fc1"]["bias"])
        z = z @ p["mlp"]["fc2"]["kernel"] + p["mlp"]["fc2"]["bias"]
        return x + z

    np.testing.assert_allclose(np.asarray(out), np.asarray(dense_oracle(x)),
                               rtol=2e-5, atol=2e-5)


def test_block_evit_padded_equals_unpadded():
    """A zero-padded grid with valid_len produces the same valid outputs as
    the unpadded grid — the CLS-score softmax masks padded keys and the
    top-k never selects them."""
    from diverse_channel_vit_tpu.models.vit import BlockEViT

    b, n, c, h = 2, 9, 16, 2
    pad = 4
    blk = BlockEViT(num_heads=h, keep_rate=0.5, attention_impl="xla")
    x = jax.random.normal(jax.random.key(0), (b, n, c))
    p = blk.init({"params": jax.random.key(1)}, x, train=False)["params"]
    out, nv = blk.apply({"params": p}, x, train=False)
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    out_p, nv_p = blk.apply({"params": p}, xp, train=False, valid_len=n)
    assert nv is None and nv_p is None  # both pruned to fully-valid grids
    assert out_p.shape == out.shape
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out),
                               rtol=2e-5, atol=2e-5)


def test_backbone_evit_keep_rate():
    # keep_rate wired through BlockEViT at layers {depth//4, depth//2,
    # 3*depth//4} — with depth=2 that's layers {0, 1}
    m = _backbone(keep_rate=0.5)
    x = jax.random.normal(jax.random.key(0), (2, 6, 16, 16))
    cids = jnp.arange(6)
    params = m.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                    x, cids, train=False)["params"]
    # EViT blocks share the plain Block's parameter tree (attn/wq..proj)
    assert "wq" in params["block_0"]["attn"]
    out, _ = m.apply({"params": params}, x, cids, train=True,
                     rngs={"dropout": jax.random.key(3)})
    assert out.shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(out)))
    # pruning applies at eval too (architectural, not a regularizer)
    out_eval, _ = m.apply({"params": params}, x, cids, train=False)
    assert np.all(np.isfinite(np.asarray(out_eval)))
    # gradients flow through the top-k gather
    g = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x, cids, train=True,
                                           rngs={"dropout": jax.random.key(4)})[0]))(params)
    gn = float(jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2)
                            for l in jax.tree_util.tree_leaves(g))))
    assert np.isfinite(gn) and gn > 0
