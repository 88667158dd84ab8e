"""Model zoo tests: shapes, parameter accounting, diversity losses, jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diverse_channel_vit_tpu.config import load_config
from diverse_channel_vit_tpu.models import MODEL_REGISTRY, build_model, model_scale


def tiny_cfg(name="dichavit", **extra):
    over = [f"model={name}", "++model.pretrained_model_name=tiny", "++model.img_size=[16]",
            "++model.patch_size=8"]
    over += [f"++model.{k}={v}" for k, v in extra.items()]
    cfg = load_config("so2sat_city_cfg", over)
    cfg.model.in_channel_names = list(range(6))
    return cfg.model


MAPPER = {"train": [0, 1, 2, 3, 4, 5], "test_1": [0, 1, 2]}


def init_model(cfg_model, num_classes=4):
    model = build_model(cfg_model.name, cfg_model, MAPPER, num_classes, jnp.float32)
    x = jnp.zeros((2, 6, 16, 16))
    ids = jnp.arange(6)
    variables = model.init(jax.random.PRNGKey(0), x, ids, train=False)
    return model, variables


class TestRegistry:
    def test_registered(self):
        assert {"dichavit", "channelvit_adapt", "vit_adapt"} <= set(MODEL_REGISTRY)

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            build_model("nope", None, {}, 1, jnp.float32)


class TestChannelViT:
    def test_forward_shapes(self):
        model, variables = init_model(tiny_cfg())
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16, 16))
        out, extra = model.apply(variables, x, jnp.arange(6), train=False)
        assert out.shape == (2, 4)  # classifier head (non-CHAMMI mapper)
        assert float(extra) == 0.0

    def test_channel_subset_changes_shape_not_params(self):
        model, variables = init_model(tiny_cfg())
        x3 = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 16, 16))
        out, _ = model.apply(variables, x3, jnp.array([0, 2, 5]), train=False)
        assert out.shape == (2, 4)

    def test_extra_loss_enabled_in_train(self):
        cfg = tiny_cfg(proxy_loss_lambda=0.1, ortho_loss_v1_lambda=1.0, gamma_s=0.5,
                       gamma_d=2.0, reverse_pos_pairs=True)
        model, variables = init_model(cfg)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 16, 16))
        out, extra = model.apply(
            variables, x, jnp.arange(6), train=True, rngs={"dropout": jax.random.PRNGKey(0)}
        )
        assert float(extra) != 0.0
        out_eval, extra_eval = model.apply(variables, x, jnp.arange(6), train=False)
        assert float(extra_eval) == 0.0

    def test_channel_embed_override(self):
        model, variables = init_model(tiny_cfg())
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 16, 16))
        emb = variables["params"]["backbone"]["channel_embed"]
        override = (emb[jnp.array([0, 1])].mean(0)[None, :]).repeat(3, axis=0)
        out, _ = model.apply(
            variables, x, jnp.array([0, 1, 2]), train=False, channel_embed_override=override
        )
        assert out.shape == (2, 4)

    def test_vit_small_param_count(self):
        # ViT-S/16 at 224^2 + 8-channel embedding: ~22M params like the
        # reference's channelvit_small (dichavit.py:712-727)
        cfg = load_config("jump_cp_cfg", ["model=dichavit"]).model
        cfg.in_channel_names = list(range(8))
        model = build_model("dichavit", cfg, MAPPER, 161, jnp.float32)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 224, 224)), jnp.arange(8), train=False)
        )
        n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"]))
        assert 21e6 < n_params < 24e6, n_params

    def test_jit_gradients_finite(self):
        cfg = tiny_cfg(proxy_loss_lambda=0.1, ortho_loss_v1_lambda=1.0)
        model, variables = init_model(cfg)
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 16, 16))
        y = jnp.array([0, 2])

        @jax.jit
        def loss_fn(params):
            out, extra = model.apply(
                {"params": params}, x, jnp.array([0, 1, 3, 5]), train=True,
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            ce = -jnp.mean(jax.nn.log_softmax(out)[jnp.arange(2), y])
            return ce + extra

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # channel embeddings of sampled channels receive gradient
        gemb = np.asarray(g["backbone"]["channel_embed"])
        assert np.abs(gemb[[0, 1, 3, 5]]).sum() > 0
        assert np.abs(gemb[[2, 4]]).sum() == 0  # unsampled channels untouched

    def test_scale(self):
        s = model_scale({}, learnable_temp=False, temperature=0.11111)
        np.testing.assert_allclose(float(s), (1 / 0.11111) ** 0.5, rtol=1e-6)
        s2 = model_scale({"logit_scale": jnp.log(9.0)}, learnable_temp=True, temperature=0.11111)
        np.testing.assert_allclose(float(s2), 9.0, rtol=1e-6)


class TestViTAdapt:
    def test_forward_and_subset(self):
        model, variables = init_model(tiny_cfg("vit_adapt"))
        x = jax.random.normal(jax.random.PRNGKey(6), (2, 6, 16, 16))
        out, extra = model.apply(variables, x, jnp.arange(6), train=False)
        assert out.shape == (2, 4)
        x2 = x[:, [1, 4]]
        out2, _ = model.apply(variables, x2, jnp.array([1, 4]), train=False)
        assert out2.shape == (2, 4)
