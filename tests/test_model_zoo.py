"""Model-zoo tests: every registered factory builds, initializes, runs
forward (train + eval), and takes gradients with finite values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diverse_channel_vit_tpu.config.loader import Config
from diverse_channel_vit_tpu.models import MODEL_REGISTRY, build_model

MAPPER = {"train": [0, 1, 2, 3, 4, 5]}
CHAMMI_MAPPER = {"Allen": [0, 1, 2], "HPA": [3, 4, 5]}


def _cfg(name, **extra):
    base = {
        "name": name,
        "in_channel_names": [f"c{i}" for i in range(6)],
        "img_size": [16],
        "patch_size": 8,
        "pretrained_model_name": "test",
        "attention_impl": "xla",
    }
    base.update(extra)
    return Config(base)


VIT_MODELS = ["dichavit", "channelvit_adapt", "vit_adapt", "depthwisevit_adapt",
              "hypervit_adapt", "templatemixingvit"]


@pytest.mark.parametrize("name", VIT_MODELS)
def test_model_forward_and_grad(name):
    model = build_model(name, _cfg(name), MAPPER, num_classes=4, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (2, 6, 16, 16))
    cids = jnp.arange(6)
    params = model.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                        x, cids, train=False)["params"]
    out, extra = model.apply({"params": params}, x, cids, train=False)
    assert out.shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(out)))

    def loss(p):
        o, e = model.apply({"params": p}, x, cids, train=True,
                           rngs={"dropout": jax.random.key(3)})
        return jnp.mean(o**2) + e

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)
    assert any(np.any(np.asarray(l) != 0) for l in flat)


@pytest.mark.parametrize("name", VIT_MODELS)
def test_model_channel_subset(name):
    """Channel-adaptive property: the same params run on any channel subset."""
    model = build_model(name, _cfg(name), MAPPER, num_classes=4, dtype=jnp.float32)
    x6 = jax.random.normal(jax.random.key(0), (2, 6, 16, 16))
    params = model.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                        x6, jnp.arange(6), train=False)["params"]
    out3, _ = model.apply({"params": params}, x6[:, :3], jnp.array([0, 1, 2]), train=False)
    assert out3.shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(out3)))


def test_depthwise_attention_pooling():
    cfg = _cfg("depthwisevit_adapt", pooling_channel_type="attention")
    from diverse_channel_vit_tpu.models.depthwise_vit import depthwisevit_adapt

    model = depthwisevit_adapt(cfg, MAPPER, num_classes=4, dtype=jnp.float32,
                               attn_pooling=dict(depth=1, heads=2, dim_head=8, mlp_dim=8,
                                                 use_cls_token=True, use_channel_tokens=True,
                                                 init_channel_tokens="random"))
    x = jax.random.normal(jax.random.key(0), (2, 6, 16, 16))
    params = model.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                        x, jnp.arange(6), train=False)["params"]
    out, _ = model.apply({"params": params}, x, jnp.arange(6), train=False)
    assert out.shape == (2, 4)


def test_hypernet_generates_per_channel_kernels():
    from diverse_channel_vit_tpu.models.hypernet import HyperNetwork

    hn = HyperNetwork(z_dim=8, d=16, kernel_size=4, out_size=12)
    z = jax.random.normal(jax.random.key(0), (5, 8))
    params = hn.init(jax.random.key(1), z)
    K = hn.apply(params, z)
    assert K.shape == (12, 5, 4, 4)
    # distinct z rows -> distinct kernels
    assert not np.allclose(np.asarray(K[:, 0]), np.asarray(K[:, 1]))


def test_template_mixing_kernels_linear_in_coefs():
    """Mixed kernel must be linear in the coefficients (def of template mix)."""
    from diverse_channel_vit_tpu.models.template_mixing_vit import TemplateMixingViT

    m = TemplateMixingViT(num_total_channels=4, img_size=16, patch_size=8,
                          embed_dim=32, depth=1, num_heads=2, num_templates=6,
                          attention_impl="xla")
    x = jax.random.normal(jax.random.key(0), (1, 4, 16, 16))
    params = m.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                    x, jnp.arange(4), train=False)["params"]
    coefs = params["conv1_coefs"]
    out1, _ = m.apply({"params": params}, x, jnp.arange(4), train=False,
                      channel_embed_override=coefs)
    out2, _ = m.apply({"params": params}, x, jnp.arange(4), train=False,
                      channel_embed_override=2.0 * coefs)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_registry_contents():
    for name in VIT_MODELS:
        assert name in MODEL_REGISTRY


def test_attention_maps_extraction():
    from diverse_channel_vit_tpu.models.vit import attention_maps

    model = build_model("dichavit", _cfg("dichavit"), MAPPER, num_classes=4, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(0), (2, 6, 16, 16))
    cids = jnp.arange(6)
    params = model.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                        x, cids, train=False)["params"]
    probs = attention_maps(model, params, x, cids, layer_idx=-1)
    n = 6 * 4 + 1  # 6 channels x (16/8)^2 patches + CLS
    assert probs.shape == (2, 2, n, n)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-4)


def test_num_heads_preset_override():
    """``++model.num_heads=3`` (head_dim 128, the MXU-native geometry)
    flows through the factory; parameter count is unchanged vs 6 heads."""
    import jax
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu import models as model_zoo
    from diverse_channel_vit_tpu.training.state import param_count

    counts = {}
    for heads in (None, 3):
        over = ["model=dichavit"] + ([f"++model.num_heads={heads}"] if heads else [])
        cfg = load_config("jump_cp_cfg", over)
        cfg.model.in_channel_names = cfg.dataset.in_channel_names
        model = model_zoo.build_model(
            cfg.model.name, cfg.model, {"jump_cp": list(range(8))}, 10,
            dtype=jnp.float32,
        )
        assert model.backbone.num_heads == (heads or 6)
        x = jnp.zeros((1, 8, 32, 32))
        p = model.init({"params": jax.random.key(0)}, x, jnp.arange(8),
                       train=False)["params"]
        counts[heads] = param_count(p)
    assert counts[None] == counts[3]


def test_scan_blocks_equivalent_to_unrolled():
    """BlockStack(nn.scan) with restacked per-layer params must reproduce the
    unrolled forward exactly (eval mode, no dropout)."""
    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer

    kw = dict(num_total_channels=6, img_size=16, patch_size=8, embed_dim=32,
              depth=3, num_heads=2, attention_impl="xla")
    m_unroll = ChannelVisionTransformer(**kw)
    m_scan = ChannelVisionTransformer(**kw, scan_blocks=True)
    x = jax.random.normal(jax.random.key(0), (2, 6, 16, 16))
    cids = jnp.arange(6)
    p = m_unroll.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                      x, cids, train=False)["params"]
    # restack block_i params into the scan layout
    blocks = [p[f"block_{i}"] for i in range(3)]
    stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls, axis=0), *blocks)
    p_scan = {k: v for k, v in p.items() if not k.startswith("block_")}
    p_scan["blocks"] = {"blocks": {"block": stacked}}
    out1, _ = m_unroll.apply({"params": p}, x, cids, train=False)
    out2, _ = m_scan.apply({"params": p_scan}, x, cids, train=False)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


@pytest.mark.parametrize("name", VIT_MODELS)
def test_model_grad_bf16(name):
    """Training dtype is bf16 by default; grads must trace and execute in
    bf16 on every backend (regressions: the depthwise c-batched einsum hit
    XLA:CPU's unsupported BF16xBF16=F32 DotThunk; templatemixing's stem
    conv with preferred_element_type=f32 broke the conv VJP everywhere)."""
    model = build_model(name, _cfg(name), MAPPER, num_classes=4, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.key(0), (2, 6, 16, 16))
    cids = jnp.arange(6)
    params = model.init({"params": jax.random.key(1), "dropout": jax.random.key(2)},
                        x, cids, train=False)["params"]

    def loss(p):
        o, e = model.apply({"params": p}, x, cids, train=True,
                           rngs={"dropout": jax.random.key(3)})
        return jnp.mean(o.astype(jnp.float32) ** 2) + e

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l, np.float32))) for l in flat)
