"""Tensor-parallel flash attention (ops/attention.py:set_tp_attention).

GSPMD cannot auto-partition Mosaic kernels, so under a >1 ``model`` mesh
axis the lane-packed flash kernel runs per TP shard via an inner shard_map
(heads are embarrassingly parallel). These tests validate, on the virtual
8-device CPU mesh with the Pallas interpreter:

- the TP-wrapped kernel matches the XLA attention oracle (fwd + grads),
- it composes when nested inside the data-manual shard_map train-step body,
- the full TP train step reproduces the unsharded step's loss,
- non-divisible head counts fall back to the XLA path instead of crashing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diverse_channel_vit_tpu.ops import attention as A
from diverse_channel_vit_tpu.parallel import (
    apply_param_shardings,
    make_mesh,
    shard_batch,
)


@pytest.fixture
def tp_mesh():
    mesh = make_mesh({"data": 2, "model": 2}, devices=jax.devices()[:4])
    A.set_tp_attention(mesh)
    yield mesh
    A.set_tp_attention(None)


def _oracle(q, k, v, num_heads, valid_len=None):
    return A.multi_head_attention_packed(q, k, v, num_heads, impl="xla",
                                         valid_len=valid_len)


@pytest.mark.parametrize("valid_len", [None, 17])
def test_tp_flash_matches_xla_oracle(tp_mesh, valid_len):
    b, n, h, dh = 2, 20, 2, 64
    ks = jax.random.split(jax.random.key(0), 4)
    q, k, v = (jax.random.normal(kk, (b, n, h * dh), jnp.float32) for kk in ks[:3])
    t = jax.random.normal(ks[3], (b, n, h * dh), jnp.float32)

    assert A.tp_degree(h) == 2

    def tp_loss(q, k, v):
        o = A.flash_attention_packed(q, k, v, h, valid_len=valid_len)
        return jnp.sum(o * t), o

    def ref_loss(q, k, v):
        o = _oracle(q, k, v, h, valid_len=valid_len)
        return jnp.sum(o * t), o

    (l1, o1), g1 = jax.jit(jax.value_and_grad(tp_loss, (0, 1, 2), has_aux=True))(q, k, v)
    (l2, o2), g2 = jax.jit(jax.value_and_grad(ref_loss, (0, 1, 2), has_aux=True))(q, k, v)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, bgrad in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bgrad),
                                   atol=2e-4, rtol=2e-4)


def test_tp_flash_nested_in_data_shard_map(tp_mesh):
    """The train-step shape: outer shard_map manual over ``data``, the TP
    flash shard_map nested inside (reuses the context AbstractMesh)."""
    from jax.sharding import PartitionSpec as P

    b, n, h, dh = 4, 12, 2, 32
    ks = jax.random.split(jax.random.key(1), 3)
    q, k, v = (jax.random.normal(kk, (b, n, h * dh), jnp.float32) for kk in ks)

    def body(q, k, v):
        return A.flash_attention_packed(q, k, v, h)

    f = jax.shard_map(body, mesh=tp_mesh, in_specs=(P("data"),) * 3,
                      out_specs=P("data"), axis_names=frozenset({"data"}),
                      check_vma=False)
    got = jax.jit(f)(q, k, v)
    want = _oracle(q, k, v, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_tp_fallback_when_heads_dont_divide(tp_mesh):
    """heads % tp != 0: the dispatch must route to the XLA path (an
    unsharded Mosaic call under GSPMD model-axis propagation would crash
    on real hardware) and stay numerically correct."""
    b, n, h, dh = 2, 10, 3, 32
    ks = jax.random.split(jax.random.key(2), 3)
    q, k, v = (jax.random.normal(kk, (b, n, h * dh), jnp.float32) for kk in ks)
    assert A.tp_degree(h) == 1
    got = A.multi_head_attention_packed(q, k, v, h, impl="pallas")
    want = _oracle(q, k, v, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_tp_train_step_matches_unsharded():
    """Full dp x tp train step with the Pallas path forced: loss and grad
    norm reproduce the unsharded (TP-disabled) step."""
    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier
    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.steps import make_train_step

    C, IMG, PATCH = 4, 32, 16
    backbone = ChannelVisionTransformer(
        num_total_channels=C, img_size=IMG, patch_size=PATCH, embed_dim=64,
        depth=2, num_heads=2, proxy_loss_lambda=1e-3, ortho_loss_v1_lambda=1e-3,
        attention_impl="pallas",
    )
    model = ChannelAdaptiveClassifier(backbone=backbone, embed_dim=64,
                                      num_classes=7, with_head=True)
    tx = make_optimizer("adamw", dict(weight_decay=0.01),
                        lr_schedule=lambda s: jnp.float32(1e-3), total_steps=4)

    def fresh_state():
        return create_train_state(
            model, tx, rng=jax.random.key(0),
            sample_input=jnp.zeros((2, C, IMG, IMG), jnp.float32),
            sample_channel_ids=jnp.arange(C))

    kwargs = dict(channel_ids=range(C), k=2, hcs_method="lowest_cosine_prob",
                  hcs_temp=0.5, patch_size=PATCH, loss_type="ce",
                  extra_loss_lambda=1.0, donate=False)
    batch = {
        "image": jax.random.normal(jax.random.key(1), (8, C, IMG, IMG)),
        "label": jnp.arange(8) % 7,
    }

    # unsharded reference (TP off)
    A.set_tp_attention(None)
    step_ref = make_train_step(model, **kwargs)
    _, m_ref = step_ref(fresh_state(), dict(batch), jax.random.key(3))

    mesh = make_mesh({"data": 2, "model": 2}, devices=jax.devices()[:4])
    A.set_tp_attention(mesh)
    try:
        state = fresh_state()
        state = state.replace(params=apply_param_shardings(state.params, mesh),
                              opt_state=tx.init(apply_param_shardings(state.params, mesh)))
        step_tp = make_train_step(model, mesh=mesh, **kwargs)
        _, m_tp = step_tp(state, shard_batch(dict(batch), mesh), jax.random.key(3))
        np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m_tp["grad_norm"]),
                                   float(m_ref["grad_norm"]), rtol=1e-4)
    finally:
        A.set_tp_attention(None)
