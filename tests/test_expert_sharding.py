"""Expert-parallel sharding of the per-channel parameter tables.

The per-GLOBAL-channel tables (channel embeddings, CDL proxies, depthwise
kernel banks, hypernet z embeddings, template coefficients) are this model
family's "experts": indexed by global channel id, looked up by gather.
``parallel/shardings.py`` shards their leading C_total dim over an
``expert`` mesh axis so a large channel vocabulary scales memory across
chips; GSPMD turns the per-step k-row lookups into a gather collective and
everything else is untouched.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diverse_channel_vit_tpu.ops import attention as A
from diverse_channel_vit_tpu.parallel import (
    apply_param_shardings,
    make_mesh,
    param_shardings,
    shard_batch,
)

C, IMG, PATCH = 8, 32, 16


def test_expert_patterns_assign_leading_dim():
    mesh = make_mesh({"data": 2, "expert": 4})
    params = {
        "backbone": {
            "patch_embed": {
                "channel_embed": np.zeros((C, 16), np.float32),
                "depthwise_bank": np.zeros((C, 4, 16), np.float32),
                "channel_weights": np.zeros((C,), np.float32),
                "conv1_emb": np.zeros((C, 8), np.float32),
                "conv1_coefs": np.zeros((C, 3), np.float32),
            },
            "channel_emb_proxies": np.zeros((C, 16), np.float32),
            "blocks": {"wq": {"kernel": np.zeros((16, 16), np.float32)}},
        }
    }
    specs = param_shardings(params, mesh)
    pe = specs["backbone"]["patch_embed"]
    assert pe["channel_embed"].spec[0] == "expert"
    assert pe["depthwise_bank"].spec[0] == "expert"
    assert pe["channel_weights"].spec[0] == "expert"
    assert pe["conv1_emb"].spec[0] == "expert"
    assert pe["conv1_coefs"].spec[0] == "expert"
    assert specs["backbone"]["channel_emb_proxies"].spec[0] == "expert"
    # non-expert leaves stay replicated (model axis absent)
    assert specs["backbone"]["blocks"]["wq"]["kernel"].spec == ()


def test_expert_indivisible_stays_replicated():
    mesh = make_mesh({"data": 2, "expert": 4})
    params = {"channel_embed": np.zeros((6, 16), np.float32)}  # 6 % 4 != 0
    specs = param_shardings(params, mesh)
    assert specs["channel_embed"].spec == ()


def _build_model(attention_impl="xla"):
    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier

    backbone = ChannelVisionTransformer(
        num_total_channels=C, img_size=IMG, patch_size=PATCH, embed_dim=64,
        depth=2, num_heads=2, proxy_loss_lambda=1e-3, ortho_loss_v1_lambda=1e-3,
        attention_impl=attention_impl,
    )
    return ChannelAdaptiveClassifier(backbone=backbone, embed_dim=64,
                                     num_classes=7, with_head=True)


def test_ep_train_step_matches_unsharded():
    """DCS + CDL/TDL train step with the channel tables expert-sharded:
    loss/grad_norm equal to the mesh-free step (the gather is exact)."""
    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.steps import make_train_step

    model = _build_model()
    tx = make_optimizer("adamw", dict(weight_decay=0.01),
                        lr_schedule=lambda s: jnp.float32(1e-3), total_steps=4)

    def fresh_state():
        return create_train_state(
            model, tx, rng=jax.random.key(0),
            sample_input=jnp.zeros((2, C, IMG, IMG), jnp.float32),
            sample_channel_ids=jnp.arange(C))

    kwargs = dict(channel_ids=range(C), k=3, hcs_method="lowest_cosine_prob",
                  hcs_temp=0.5, patch_size=PATCH, loss_type="ce",
                  extra_loss_lambda=1.0, donate=False)
    batch = {
        "image": jax.random.normal(jax.random.key(1), (8, C, IMG, IMG)),
        "label": jnp.arange(8) % 7,
    }

    step_ref = make_train_step(model, **kwargs)
    _, m_ref = step_ref(fresh_state(), dict(batch), jax.random.key(3))

    mesh = make_mesh({"data": 2, "expert": 4})
    state = fresh_state()
    sharded = apply_param_shardings(state.params, mesh)
    # the table must actually be distributed over the expert axis
    emb = sharded["backbone"]["channel_embed"]
    assert len(emb.sharding.device_set) == 8 and "expert" in emb.sharding.spec

    state = state.replace(params=sharded, opt_state=tx.init(sharded))
    step_ep = make_train_step(model, mesh=mesh, **kwargs)
    _, m_ep = step_ep(state, shard_batch(dict(batch), mesh), jax.random.key(3))

    np.testing.assert_allclose(float(m_ep["loss"]), float(m_ref["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_ep["grad_norm"]), float(m_ref["grad_norm"]),
                               rtol=1e-4)


def test_trainer_wires_expert_axis(tmp_path):
    """`++hardware.mesh.expert=N` through the config surface: the Trainer
    shards the channel tables, activates the attention mesh guard, and a
    real epoch trains + evals."""
    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.ops.fused_block import set_fused_block
    from diverse_channel_vit_tpu.trainer import Trainer

    cfg = load_config(
        "synthetic_cfg",
        [
            "train.num_epochs=1",
            "train.batch_size=16",
            "dataset.num_train_samples=32",
            "dataset.num_eval_samples=16",
            f"train.checkpoints={tmp_path}/ckpt",
            "hardware.num_workers=0",
            "model.attention_impl=xla",
            "hardware.mesh.data=4",
            "++hardware.mesh.expert=2",
        ],
    )
    try:
        t = Trainer(cfg)
        assert dict(t.mesh.shape) == {"data": 4, "model": 1, "expert": 2}
        emb = t.state.params["backbone"]["channel_embed"]
        assert "expert" in emb.sharding.spec
        assert A._TP_STATE["mesh"] is not None
        best = t.train()
        assert np.isfinite(best)
    finally:
        A.set_tp_attention(None)
        set_fused_block(True)


def test_ep_flash_kernel_wrapped_manual():
    """With only an expert axis >1 (no model axis), the flash kernel still
    needs to stay out of GSPMD propagation: the wrapper goes manual over
    ``expert`` with replicated activations and matches the XLA oracle."""
    mesh = make_mesh({"data": 2, "expert": 2}, devices=jax.devices()[:4])
    A.set_tp_attention(mesh)
    try:
        assert A.tp_degree(2) == 1 and A._wrap_axes() == ("expert",)
        b, n, h, dh = 2, 12, 2, 32
        ks = jax.random.split(jax.random.key(0), 3)
        q, k, v = (jax.random.normal(kk, (b, n, h * dh), jnp.float32) for kk in ks)
        got = A.flash_attention_packed(q, k, v, h)
        want = A.multi_head_attention_packed(q, k, v, h, impl="xla")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)
    finally:
        A.set_tp_attention(None)
