"""Selective-training (freeze) tests + batched hypernet + SSL views."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diverse_channel_vit_tpu.training.freeze import build_trainable_labels, masked_optimizer


def _params():
    return {
        "backbone": {
            "channel_embed": jnp.ones((8, 16)),
            "proj_kernel": jnp.ones((64, 16)),
            "block_0": {"attn": {"wq": {"kernel": jnp.ones((16, 16))}}},
            "block_1": {"mlp": {"fc1": {"kernel": jnp.ones((16, 64))}}},
            "norm": {"scale": jnp.ones((16,))},
        },
        "proxies": jnp.ones((4, 16)),
    }


def test_freeze_other_trains_interface_and_head_only():
    p = _params()
    labels = build_trainable_labels(p, freeze_other=True)
    assert labels["backbone"]["channel_embed"] == "train"
    assert labels["backbone"]["proj_kernel"] == "train"
    assert labels["backbone"]["block_0"]["attn"]["wq"]["kernel"] == "freeze"
    assert labels["proxies"] == "train"


def test_unfreeze_last_n_layers():
    p = _params()
    labels = build_trainable_labels(p, unfreeze_last_n_layers=1)
    assert labels["backbone"]["block_0"]["attn"]["wq"]["kernel"] == "freeze"
    assert labels["backbone"]["block_1"]["mlp"]["fc1"]["kernel"] == "train"
    assert labels["backbone"]["norm"]["scale"] == "train"
    assert labels["backbone"]["channel_embed"] == "train"  # unfreeze_first_layer default
    labels2 = build_trainable_labels(p, unfreeze_last_n_layers=1, unfreeze_first_layer=False)
    assert labels2["backbone"]["channel_embed"] == "freeze"


def test_masked_optimizer_zeroes_frozen_updates():
    p = _params()
    labels = build_trainable_labels(p, freeze_other=True)
    tx = masked_optimizer(optax.sgd(1.0), labels)
    g = jax.tree_util.tree_map(jnp.ones_like, p)
    state = tx.init(p)
    upd, _ = tx.update(g, state, p)
    assert np.all(np.asarray(upd["backbone"]["block_0"]["attn"]["wq"]["kernel"]) == 0)
    assert np.all(np.asarray(upd["backbone"]["channel_embed"]) != 0)


def _scanned_params():
    # model.scan_blocks=True layout: stacked (depth, ...) leaves
    return {
        "backbone": {
            "channel_embed": jnp.ones((8, 16)),
            "blocks": {"block": {"attn": {"wq": {"kernel": jnp.ones((4, 16, 16))}}}},
            "norm": {"scale": jnp.ones((16,))},
        },
        "proxies": jnp.ones((4, 16)),
    }


def test_unfreeze_last_n_scanned_layout():
    p = _scanned_params()
    labels = build_trainable_labels(p, unfreeze_last_n_layers=1)
    assert labels["backbone"]["blocks"]["block"]["attn"]["wq"]["kernel"] == "train_stack"
    tx = masked_optimizer(optax.sgd(1.0), labels, unfreeze_last_n_layers=1)
    g = jax.tree_util.tree_map(jnp.ones_like, p)
    upd, _ = tx.update(g, tx.init(p), p)
    stack = np.asarray(upd["backbone"]["blocks"]["block"]["attn"]["wq"]["kernel"])
    assert np.all(stack[:3] == 0) and np.all(stack[3] != 0)  # only the last layer moves
    # n=0: the whole stack freezes
    labels0 = build_trainable_labels(p, unfreeze_last_n_layers=0)
    assert labels0["backbone"]["blocks"]["block"]["attn"]["wq"]["kernel"] == "freeze"


def test_unfreeze_last_n_without_blocks_raises():
    import pytest

    p = {"backbone": {"channel_embed": jnp.ones((8, 16))}, "proxies": jnp.ones((4, 16))}
    with pytest.raises(ValueError, match="no transformer blocks"):
        build_trainable_labels(p, unfreeze_last_n_layers=2)


def test_all_trainable_passthrough():
    p = _params()
    labels = build_trainable_labels(p)  # defaults: everything trains
    tx = masked_optimizer(optax.sgd(1.0), labels)
    assert tx is not None  # plain tx returned unchanged
    g = jax.tree_util.tree_map(jnp.ones_like, p)
    upd, _ = tx.update(g, tx.init(p), p)
    assert all(np.all(np.asarray(l) != 0) for l in jax.tree_util.tree_leaves(upd))


def test_hypernet_v2_batched():
    from diverse_channel_vit_tpu.models.hypernet import HyperNetworkChannelEmbV2, HyperNetworkV2

    hn = HyperNetworkV2(z_dim=8, d=16, kernel_size=3, out_size=12)
    z = jax.random.normal(jax.random.key(0), (4, 5, 8))
    params = hn.init(jax.random.key(1), z)
    K = hn.apply(params, z)
    assert K.shape == (4, 12, 5, 3, 3)

    ce = HyperNetworkChannelEmbV2(z_dim=8, d=16, out_size=32)
    params = ce.init(jax.random.key(2), z)
    out = ce.apply(params, z)
    assert out.shape == (4, 32, 5)


def test_ssl_two_views(tmp_path):
    import pandas as pd
    from PIL import Image

    from diverse_channel_vit_tpu.data.morphem70k import SingleCellDataset

    root = tmp_path
    (root / "a").mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(4):
        tape = (rng.random((16, 16 * 3)) * 255).astype(np.uint8)
        Image.fromarray(tape).save(root / f"a/img_{i}.tif")
        rows.append({"file_path": f"a/img_{i}.tif", "channel_width": 16,
                     "chunk": "Allen", "label": "M0", "train_test_split": "Train"})
    pd.DataFrame(rows).to_csv(root / "meta.csv", index=False)
    ds = SingleCellDataset(str(root), file_name="meta.csv", chunk_name="Allen",
                           is_train=True, img_size=8, ssl_flag=True)
    ex = ds.get_example(0, np.random.default_rng(1))
    assert ex["image"].shape == (2, 3, 8, 8)
    assert not np.allclose(ex["image"][0], ex["image"][1])  # independent views
