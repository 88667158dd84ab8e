"""ConvNeXt-family tests: all six factories build/run/grad; chunk-bound
variants share one param tree across chunks; torch-checkpoint loading maps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diverse_channel_vit_tpu.config.loader import Config
from diverse_channel_vit_tpu.models import MODEL_REGISTRY, build_model
from diverse_channel_vit_tpu.models.wrappers import bind_chunk

CHAMMI_MAPPER = {"Allen": [5, 2, 6], "HPA": [3, 6, 5, 0], "CP": [5, 0, 7, 1, 4]}
REG_MAPPER = {"train": [0, 1, 2, 3, 4, 5, 6, 7]}

CONVNEXT_MODELS = [
    "convnext_base", "shared_convnext", "sliceparamconvnext",
    "templatemixingconvnext", "hyperconvnext", "depthwiseconvnext",
]


def _cfg(name, **extra):
    base = {
        "name": name,
        "in_channel_names": [f"c{i}" for i in range(8)],
        "pooling": "avg",
        "pretrained": False,
        "in_dim": 3,
        "patch_size": 4,
        "kernels_per_channel": 8,
        "num_templates": 8,
        "z_dim": 8,
        "hidden_dim": 8,
    }
    base.update(extra)
    return Config(base)


@pytest.mark.parametrize("name", CONVNEXT_MODELS)
def test_convnext_forward_and_grad(name):
    model = build_model(name, _cfg(name), CHAMMI_MAPPER, num_classes=4, dtype=jnp.float32)
    chunk_model = bind_chunk(model, "Allen")
    x = jax.random.normal(jax.random.key(0), (2, 3, 32, 32))
    cids = jnp.asarray(CHAMMI_MAPPER["Allen"])
    params = chunk_model.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                              x, cids, train=False)["params"]
    out, _ = chunk_model.apply({"params": params}, x, cids, train=False)
    assert out.shape == (2, 768)  # CHAMMI: features, no head
    assert np.all(np.isfinite(np.asarray(out)))

    def loss(p):
        o, e = chunk_model.apply({"params": p}, x, cids, train=True,
                                 rngs={"dropout": jax.random.key(3)})
        return jnp.mean(o**2)

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(g))


@pytest.mark.parametrize("name", ["shared_convnext", "sliceparamconvnext", "hyperconvnext"])
def test_chunk_clones_share_param_tree(name):
    model = build_model(name, _cfg(name), CHAMMI_MAPPER, num_classes=4, dtype=jnp.float32)
    m_allen = bind_chunk(model, "Allen")
    m_cp = bind_chunk(model, "CP")
    xa = jnp.zeros((1, 3, 32, 32))
    xc = jnp.zeros((1, 5, 32, 32))
    pa = m_allen.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                      xa, jnp.asarray(CHAMMI_MAPPER["Allen"]), train=False)["params"]
    # CP forward works with the Allen-initialized tree (same structure)
    out, _ = m_cp.apply({"params": pa}, xc, jnp.asarray(CHAMMI_MAPPER["CP"]), train=False)
    assert out.shape == (1, 768)


def test_convnext_regular_dataset_has_head():
    model = build_model("depthwiseconvnext", _cfg("depthwiseconvnext"), REG_MAPPER,
                        num_classes=7, dtype=jnp.float32)
    m = bind_chunk(model, "train")
    x = jnp.zeros((2, 8, 32, 32))
    cids = jnp.arange(8)
    params = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                    x, cids, train=False)["params"]
    out, _ = m.apply({"params": params}, x, cids, train=False)
    assert out.shape == (2, 7)  # classifier head applied


@pytest.mark.parametrize("pool", ["sum", "weighted_sum_random", "weighted_sum_one_no_softmax", "attention"])
def test_depthwise_pooling_modes(pool):
    cfg = _cfg("depthwiseconvnext", pooling_channel_type=pool)
    model = build_model("depthwiseconvnext", cfg, REG_MAPPER, num_classes=3, dtype=jnp.float32)
    m = bind_chunk(model, "train")
    x = jax.random.normal(jax.random.key(0), (2, 8, 32, 32))
    cids = jnp.arange(8)
    params = m.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                    x, cids, train=False)["params"]
    out, _ = m.apply({"params": params}, x, cids, train=False)
    assert out.shape == (2, 3) and np.all(np.isfinite(np.asarray(out)))


def test_load_torch_convnext_state_maps_keys():
    import torch

    from diverse_channel_vit_tpu.models.convnext import ConvNeXtTrunk, TINY, load_torch_convnext_state

    trunk = ConvNeXtTrunk(**TINY)
    x = jnp.zeros((1, 8, 8, 96))
    params = trunk.init({"params": jax.random.key(0)}, x, train=False)["params"]
    params = jax.tree_util.tree_map(np.asarray, params)
    # fake torch state for one block + stem norm
    state = {
        "stem.1.weight": torch.full((96,), 2.0),
        "stem.1.bias": torch.full((96,), 0.5),
        "stages.0.blocks.0.conv_dw.weight": torch.randn(96, 1, 7, 7),
        "stages.0.blocks.0.conv_dw.bias": torch.randn(96),
        "stages.0.blocks.0.mlp.fc1.weight": torch.randn(384, 96),
        "stages.0.blocks.0.mlp.fc1.bias": torch.randn(384),
        "stages.0.blocks.0.gamma": torch.randn(96),
        "stages.1.downsample.0.weight": torch.randn(192),
        "stages.1.downsample.1.weight": torch.randn(192, 96, 2, 2),
    }
    new = load_torch_convnext_state(params, state)
    assert np.allclose(np.asarray(new["stem_norm"]["scale"]), 2.0)
    assert np.allclose(
        np.asarray(new["stage0_block0"]["pwconv1"]["kernel"]),
        state["stages.0.blocks.0.mlp.fc1.weight"].numpy().T,
    )
    assert np.allclose(
        np.asarray(new["downsample_conv_1"]["kernel"]),
        state["stages.1.downsample.1.weight"].numpy().transpose(2, 3, 1, 0),
    )


def test_all_twelve_reference_models_registered():
    expected = {
        "convnext_base", "shared_convnext", "sliceparamconvnext",
        "templatemixingconvnext", "hyperconvnext", "depthwiseconvnext",
        "channelvit_adapt", "dichavit", "vit_adapt", "depthwisevit_adapt",
        "hypervit_adapt", "templatemixingvit",
    }
    assert expected <= set(MODEL_REGISTRY)
