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

    def test_placeholder_in_channel_names_raises(self):
        # len("FILL_LATER") would silently size the channel tables to 10
        cfg = tiny_cfg()
        cfg.in_channel_names = "FILL_LATER"
        with pytest.raises(ValueError, match="placeholder"):
            build_model(cfg.name, cfg, MAPPER, 4, jnp.float32)

    def test_mapper_id_overflow_raises(self):
        # mapper ids beyond the table would hit jnp.take's NaN fill at run
        # time; build_model fails loudly instead (the Trainer checks too,
        # trainer.py:205-214, but scripts call build_model directly)
        cfg = tiny_cfg()  # 6 in_channel_names
        with pytest.raises(ValueError, match="out of range"):
            build_model(cfg.name, cfg, {"train": [0, 1, 11]}, 4, jnp.float32)


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


class TestClsOnlyReadout:
    """Inference-only last-block CLS readout (models/vit.py Block cls_query):
    the final block's queries + MLP run on the CLS row alone. Exact — not an
    approximation — because every consumer reads only the CLS embedding
    (reference forward_features returns x[:, 0], vit.py:612-638)."""

    def _trunk(self, cls_only, **kw):
        from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer

        return ChannelVisionTransformer(
            num_total_channels=4, img_size=32, patch_size=16, embed_dim=96,
            depth=3, num_heads=3, attention_impl="xla",
            cls_only_readout=cls_only, **kw,
        )

    def _init(self, model):
        x = jax.random.normal(jax.random.key(1), (2, 4, 32, 32))
        cids = jnp.arange(4)
        p = jax.jit(
            lambda r: model.init({"params": r}, x, cids, train=False)["params"]
        )(jax.random.key(0))
        return x, cids, p

    def test_eval_forward_identical(self):
        m0, m1 = self._trunk(False), self._trunk(True)
        x, cids, p = self._init(m0)
        o0, _ = m0.apply({"params": p}, x, cids, train=False)
        o1, _ = m1.apply({"params": p}, x, cids, train=False)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                                   atol=2e-5, rtol=2e-5)

    def test_init_tree_identical(self):
        """Params created THROUGH the cls_query branch (init runs at
        train=False) must match the dense branch tree bit-for-bit."""
        m0, m1 = self._trunk(False), self._trunk(True)
        x, cids, p0 = self._init(m0)
        _, _, p1 = self._init(m1)
        assert jax.tree_util.tree_all(
            jax.tree_util.tree_map(lambda a, b: bool(jnp.all(a == b)), p0, p1)
        )

    def test_train_loss_and_grads_identical(self):
        """Exact at train too: the final block's non-CLS rows are dead code
        (zero gradient — only CLS feeds the head; diversity losses attach at
        the patch embed). Includes stochastic depth: DropPath's per-sample
        mask draws identically on the 1-row branch."""
        kw = dict(drop_path_rate=0.1, proxy_loss_lambda=1e-3,
                  ortho_loss_v1_lambda=1e-3)
        m0, m1 = self._trunk(False, **kw), self._trunk(True, **kw)
        x, cids, p = self._init(m0)
        rngs = {"dropout": jax.random.key(2), "sampling": jax.random.key(3)}

        def loss(params, m):
            cls, extra = m.apply({"params": params}, x, cids, train=True, rngs=rngs)
            return jnp.sum(cls.astype(jnp.float32) ** 2) * 1e-2 + extra

        l0, g0 = jax.value_and_grad(lambda q: loss(q, m0))(p)
        l1, g1 = jax.value_and_grad(lambda q: loss(q, m1))(p)
        assert abs(float(l0 - l1)) < 1e-5
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-6, rtol=5e-4)

    def test_train_dropout_gate(self):
        """Element-wise dropout draws per-element masks, so fewer rows would
        reshuffle the CLS row's draw — active dropouts must force the dense
        path (outputs bit-equal between the flags)."""
        m0 = self._trunk(False, drop_rate=0.1)
        m1 = self._trunk(True, drop_rate=0.1)
        x, cids, p = self._init(m0)
        rngs = {"dropout": jax.random.key(2), "sampling": jax.random.key(3)}
        o0, _ = m0.apply({"params": p}, x, cids, train=True, rngs=rngs)
        o1, _ = m1.apply({"params": p}, x, cids, train=True, rngs=rngs)
        np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))

    def test_capture_sees_full_rows(self):
        """MIRO taps (training/miro.py) capture per-block outputs with
        train=False — the gate must keep the LAST block full-shaped there,
        or the pre-featurizer taps silently broadcast against (B,1,D)."""
        from diverse_channel_vit_tpu.training.miro import tap_filter, _flatten_taps

        m1 = self._trunk(True)
        x, cids, p = self._init(m1)
        _, v = m1.apply({"params": p}, x, cids, train=False,
                        capture_intermediates=tap_filter,
                        mutable=["intermediates"])
        taps = _flatten_taps(v["intermediates"])
        n_tok = 4 * 4 + 1
        assert all(a.shape == (2, n_tok, 96) for a in taps.values())

    def test_vit_adapt_trunk_parity(self):
        from diverse_channel_vit_tpu.models.vit_adapt import SlicedPatchVisionTransformer

        def build(flag):
            return SlicedPatchVisionTransformer(
                num_total_channels=4, img_size=32, patch_size=16, embed_dim=96,
                depth=2, num_heads=3, attention_impl="xla",
                cls_only_readout=flag,
            )

        m0, m1 = build(False), build(True)
        x = jax.random.normal(jax.random.key(1), (2, 4, 32, 32))
        cids = jnp.arange(4)
        p = jax.jit(
            lambda r: m0.init({"params": r}, x, cids, train=False)["params"]
        )(jax.random.key(0))
        o0, _ = m0.apply({"params": p}, x, cids, train=False)
        o1, _ = m1.apply({"params": p}, x, cids, train=False)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                                   atol=2e-5, rtol=2e-5)

    def test_shared_trunk_parity(self):
        from diverse_channel_vit_tpu.models.trunk import ViTTrunk

        def build(flag):
            return ViTTrunk(img_size=32, patch_size=16, embed_dim=96, depth=2,
                            num_heads=3, attention_impl="xla",
                            cls_only_readout=flag)

        m0, m1 = build(False), build(True)
        tokens = jax.random.normal(jax.random.key(1), (2, 4, 96))
        p = jax.jit(
            lambda r: m0.init({"params": r}, tokens, (2, 2), train=False)["params"]
        )(jax.random.key(0))
        o0 = m0.apply({"params": p}, tokens, (2, 2), train=False)
        o1 = m1.apply({"params": p}, tokens, (2, 2), train=False)
        np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                                   atol=2e-5, rtol=2e-5)
