"""shard_map-wrapped train/grad/eval steps (training/steps.py).

On multi-chip TPU the Pallas kernels cannot be GSPMD-partitioned
(jax/_src/tpu_custom_call.py raises), so a data-sharded mesh routes the
grad/forward computation through shard_map with explicit pmean collectives.
These tests check the sharded steps reproduce the unsharded ones on the
virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diverse_channel_vit_tpu.parallel import make_mesh, shard_batch
from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
from diverse_channel_vit_tpu.training.schedules import make_lr_schedule
from diverse_channel_vit_tpu.training.steps import (
    make_eval_step,
    make_grad_step,
    make_train_step,
)

C, IMG, PATCH = 4, 32, 16


def _build(num_classes=7, with_head=True):
    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier

    backbone = ChannelVisionTransformer(
        num_total_channels=C, img_size=IMG, patch_size=PATCH, embed_dim=64,
        depth=2, num_heads=2, proxy_loss_lambda=1e-3, ortho_loss_v1_lambda=1e-3,
        attention_impl="xla",
    )
    return ChannelAdaptiveClassifier(
        backbone=backbone, embed_dim=64, num_classes=num_classes,
        with_head=with_head,
    )


def _state(model):
    lr = make_lr_schedule("cosine", 1e-3, dict(t_initial=2, warmup_t=1,
                                               warmup_lr_init=1e-5),
                          num_epochs=2, steps_per_epoch=2)
    tx = make_optimizer("adamw", dict(weight_decay=0.01), lr_schedule=lr,
                        total_steps=4)
    x0 = jnp.zeros((2, C, IMG, IMG), jnp.float32)
    return create_train_state(model, tx, rng=jax.random.key(0),
                              sample_input=x0,
                              sample_channel_ids=jnp.arange(C))


def _batch(mesh=None, b=16):
    data = {
        "image": jax.random.normal(jax.random.key(1), (b, C, IMG, IMG)),
        "label": jnp.arange(b) % 7,
    }
    return shard_batch(data, mesh) if mesh is not None else data


@pytest.mark.parametrize("hcs_method,k", [("none", None), ("lowest_cosine_prob", 2),
                                          ("lowest_cosine_prob_proj", 2)])
def test_sharded_train_step_matches_unsharded(hcs_method, k):
    model = _build()
    mesh = make_mesh({"data": -1, "model": 1})
    assert mesh.devices.size == 8

    kwargs = dict(
        channel_ids=range(C), k=k, hcs_method=hcs_method, hcs_temp=0.5,
        patch_size=PATCH, loss_type="ce", extra_loss_lambda=1.0, donate=False,
    )
    step_ref = make_train_step(model, **kwargs)  # GSPMD path
    step_smap = make_train_step(model, mesh=mesh, **kwargs)

    s1, m1 = step_ref(_state(model), _batch(), jax.random.key(3))
    s2, m2 = step_smap(_state(model), _batch(mesh), jax.random.key(3))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1["grad_norm"]), float(m2["grad_norm"]), rtol=1e-4
    )
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    if k is not None:
        # the channel draw is global (pmean'd cosine): same subset both ways
        np.testing.assert_array_equal(
            np.asarray(m1["sampled_channels"]), np.asarray(m2["sampled_channels"])
        )


def test_sharded_grad_step_matches_unsharded():
    model = _build(with_head=False)  # proxy loss runs on embeddings
    mesh = make_mesh({"data": -1, "model": 1})
    kwargs = dict(channel_ids=range(C), k=3, hcs_method="lowest_cosine_prob",
                  hcs_temp=0.5, patch_size=PATCH, loss_type="proxy",
                  extra_loss_lambda=1.0)
    state = _state(model)
    g1, m1 = make_grad_step(model, **kwargs)(state.params, _batch(), jax.random.key(5))
    g2, m2 = make_grad_step(model, mesh=mesh, **kwargs)(
        state.params, _batch(mesh), jax.random.key(5)
    )
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_sharded_step_collective_count_and_volume():
    """Communication contract of the data-parallel step (SURVEY §2.6): the
    compiled HLO contains ONE gradient all-reduce volume per step — the
    summed all-reduce operand bytes stay within ~1.1x of the parameter
    bytes (grads + the small pmean'd metrics tuple) — and NO all-gathers
    (parameters replicate; nothing is re-assembled)."""
    import re

    model = _build()
    mesh = make_mesh({"data": -1, "model": 1})
    state = _state(model)
    batch = _batch(mesh)
    step = make_train_step(model, channel_ids=range(C), k=None, loss_type="ce",
                           extra_loss_lambda=1.0, donate=False, mesh=mesh)
    txt = step.trace(state, batch, jax.random.key(0)).lower().compile().as_text()

    lines = txt.splitlines()
    ar_defs = [l for l in lines if re.search(r"= *\(?.*all-reduce\(", l)]
    assert ar_defs, "expected at least one all-reduce in the sharded step"
    ag_defs = [l for l in lines if re.search(r"= *\(?.*all-gather\(", l)]
    assert not ag_defs, f"unexpected all-gathers: {ag_defs[:3]}"

    reduced_bytes = 0
    for l in ar_defs:
        lhs = l.split("all-reduce(")[0]
        for shp in re.findall(r"f32\[([\d,]*)\]", lhs):
            n = 1
            for d in shp.split(","):
                if d:
                    n *= int(d)
            reduced_bytes += 4 * n
    param_bytes = sum(
        int(np.prod(x.shape)) * 4 for x in jax.tree_util.tree_leaves(state.params)
    )
    assert param_bytes <= reduced_bytes <= 1.15 * param_bytes, (
        reduced_bytes, param_bytes)


def test_sharded_eval_step_matches_unsharded():
    model = _build()
    mesh = make_mesh({"data": -1, "model": 1})
    state = _state(model)
    x = jax.random.normal(jax.random.key(6), (16, C, IMG, IMG))
    cids = jnp.arange(C)

    out_ref = make_eval_step(model)(state.params, x, cids)
    xs = jax.device_put(x, __import__("jax").sharding.NamedSharding(
        mesh, __import__("jax").sharding.PartitionSpec("data")))
    out_smap = make_eval_step(model, mesh=mesh)(state.params, xs, cids)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_smap), atol=1e-5)

    # (C, D) override replicates through the sharded path
    override = jax.random.normal(jax.random.key(7), (C, 64))
    o1 = make_eval_step(model)(state.params, x, cids, override)
    o2 = make_eval_step(model, mesh=mesh)(state.params, xs, cids, override)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
