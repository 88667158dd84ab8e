"""Training-core tests: schedules (timm-parity golden values), optimizers,
fused/accumulated train steps, and the data-parallel mesh path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diverse_channel_vit_tpu.models import build_model
from diverse_channel_vit_tpu.config.loader import Config
from diverse_channel_vit_tpu.parallel import make_mesh, shard_batch, shard_params
from diverse_channel_vit_tpu.training import (
    create_train_state,
    make_eval_step,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
    wd_cosine_schedule,
)
from diverse_channel_vit_tpu.training.steps import make_apply_step, make_grad_step, tree_add


# --------------------------------------------------------------------------
# Schedules
# --------------------------------------------------------------------------


def test_cosine_schedule_matches_timm_semantics():
    # configs/scheduler/cosine.yaml: warmup_t=3, warmup_lr_init=1e-5, lr_min=1e-6
    base = 4e-4
    fn = make_lr_schedule(
        "cosine",
        base,
        dict(t_initial=10, lr_min=1e-6, warmup_t=3, warmup_lr_init=1e-5,
             cycle_decay=0.5, cycle_limit=1, t_in_epochs=True),
        num_epochs=10,
        steps_per_epoch=5,
    )
    # loop-position parity (trainer.py:346-348): scheduler.step(epoch) runs
    # BEFORE each 1-based epoch, so epoch e trains at timm value t=e —
    # steps 0-4 are epoch 1 -> t=1, steps 5-9 epoch 2 -> t=2, ...
    slope = (base - 1e-5) / 3
    assert np.isclose(float(fn(0)), 1e-5 + slope, rtol=1e-6)
    assert np.isclose(float(fn(5)), 1e-5 + 2 * slope, rtol=1e-6)
    # epoch 3 (last warmup epoch): t=3 == warmup_t -> first cosine value
    expected = 1e-6 + 0.5 * (base - 1e-6) * (1 + np.cos(np.pi * 3 / 10))
    assert np.isclose(float(fn(10)), expected, rtol=1e-6)
    # past cycle_limit: lr_min
    assert np.isclose(float(fn(5 * 12)), 1e-6, rtol=1e-6)


def test_multistep_schedule_decays_at_milestones():
    fn = make_lr_schedule(
        "multistep",
        1.0,
        dict(decay_t=[30, 60, 80], decay_rate=0.2, warmup_t=1, warmup_lr_init=0.0,
             t_in_epochs=False),
        num_epochs=100,
        steps_per_epoch=10,
        convert_to_batch=True,  # milestones become steps: 300, 600, 800
    )
    assert float(fn(0)) == 0.0  # warmup start
    assert np.isclose(float(fn(10)), 1.0)
    assert np.isclose(float(fn(299)), 1.0)
    assert np.isclose(float(fn(300)), 0.2, rtol=1e-6)
    assert np.isclose(float(fn(799)), 0.04, rtol=1e-5)
    assert np.isclose(float(fn(900)), 0.008, rtol=1e-5)


def test_wd_cosine_schedule_endpoints():
    fn = wd_cosine_schedule(0.04, 0.4, 1000)
    assert np.isclose(float(fn(0)), 0.04, rtol=1e-6)
    assert np.isclose(float(fn(999)), 0.4, rtol=1e-5)
    assert 0.04 < float(fn(500)) < 0.4


# --------------------------------------------------------------------------
# Optimizers
# --------------------------------------------------------------------------


@pytest.mark.parametrize("name,params", [
    ("sgd", dict(momentum=0.9, weight_decay=5e-4, nesterov=False, dampening=0)),
    ("adam", dict(betas=[0.9, 0.999], eps=1e-8, weight_decay=5e-5)),
    ("adamw", dict(betas=[0.9, 0.999], eps=1e-8, weight_decay=5e-5)),
    ("adamw", dict(betas=[0.9, 0.999], eps=1e-6, weight_decay=0.04, weight_decay_end=0.4)),
    ("adamp", dict(betas=[0.9, 0.999], eps=1e-8, weight_decay=1e-2)),
])
def test_optimizer_factory_steps(name, params):
    tx = make_optimizer(
        name, params, lr_schedule=lambda s: jnp.float32(1e-3), total_steps=100,
        clip_grad_norm=1.0,
    )
    p = {"w": jnp.ones((4, 8)), "b": jnp.zeros((8,))}
    g = {"w": jnp.full((4, 8), 0.1), "b": jnp.full((8,), 0.1)}
    state = tx.init(p)
    upd, state = tx.update(g, state, p)
    import optax
    p2 = optax.apply_updates(p, upd)
    assert not np.allclose(np.asarray(p2["w"]), np.asarray(p["w"]))
    assert all(np.all(np.isfinite(np.asarray(x))) for x in jax.tree_util.tree_leaves(p2))


def test_adamw_wd_schedule_is_applied():
    # zero grads => update is pure weight decay * lr; scheduled wd changes over steps
    tx = make_optimizer(
        "adamw", dict(weight_decay=0.1, weight_decay_end=1.0),
        lr_schedule=lambda s: jnp.float32(1.0), total_steps=3,
    )
    p = {"w": jnp.ones((2, 2))}
    g = {"w": jnp.zeros((2, 2))}
    state = tx.init(p)
    upd1, state = tx.update(g, state, p)
    upd2, state = tx.update(g, state, p)
    upd3, state = tx.update(g, state, p)
    d1, d3 = float(upd1["w"][0, 0]), float(upd3["w"][0, 0])
    assert np.isclose(d1, -0.1, rtol=1e-5)
    # reference lag (trainer.py:940-948): update i trains with the table
    # value at i-1; i=2 -> 1.0 + 0.5*(0.1-1.0)*(1+cos(pi*1/3)) = 0.325
    assert np.isclose(d3, -0.325, rtol=1e-5)
    # update 1 also trains with table[0] = base (the one-step write lag)
    assert np.isclose(float(upd2["w"][0, 0]), -0.1, rtol=1e-5)


# --------------------------------------------------------------------------
# Train steps
# --------------------------------------------------------------------------


def tiny_model(num_classes=5, with_proxy_losses=False, n_channels=6, with_head=True):
    cfg = Config({
        "name": "dichavit",
        "in_channel_names": [f"c{i}" for i in range(n_channels)],
        "img_size": [16],
        "patch_size": 8,
        "pretrained_model_name": "tiny",
        "enable_sample": True,
        "hcs_sampling": "lowest_cosine_prob",
        "proxy_loss_lambda": 0.1 if with_proxy_losses else 0.0,
        "ortho_loss_v1_lambda": 1.0 if with_proxy_losses else 0.0,
        "attention_impl": "xla",
    })
    # tiny preset is heavy for tests; monkey-light via direct construction
    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier
    backbone = ChannelVisionTransformer(
        num_total_channels=n_channels, img_size=16, patch_size=8,
        embed_dim=32, depth=2, num_heads=2,
        proxy_loss_lambda=cfg.proxy_loss_lambda,
        ortho_loss_v1_lambda=cfg.ortho_loss_v1_lambda,
        attention_impl="xla",
    )
    return ChannelAdaptiveClassifier(
        backbone=backbone, embed_dim=32, num_classes=num_classes, with_head=with_head
    )


def _make_state(model, tx=None, n_channels=6, batch=4):
    import optax
    tx = tx or make_optimizer("adamw", dict(weight_decay=1e-4),
                              lr_schedule=lambda s: jnp.float32(1e-3), total_steps=100)
    x = jnp.zeros((batch, n_channels, 16, 16))
    cids = jnp.arange(n_channels)
    return create_train_state(model, tx, rng=jax.random.key(0),
                              sample_input=x, sample_channel_ids=cids)


def test_fused_train_step_decreases_loss():
    model = tiny_model()
    state = _make_state(model)
    step = make_train_step(
        model, channel_ids=range(6), loss_type="ce", donate=False,
    )
    rng = jax.random.key(1)
    x = jax.random.normal(jax.random.key(2), (4, 6, 16, 16))
    y = jnp.array([0, 1, 2, 3])
    batch = {"image": x, "label": y}
    _, m0 = step(state, batch, rng)
    for i in range(10):
        state, m = step(state, batch, jax.random.fold_in(rng, i))
    assert float(m["loss"]) < float(m0["loss"])
    assert set(m) >= {"loss", "main_loss", "extra_loss", "acc", "grad_norm"}


def test_train_step_with_dcs_sampling():
    model = tiny_model(with_proxy_losses=True, with_head=False)
    state = _make_state(model)
    step = make_train_step(
        model, channel_ids=range(6), k=3, hcs_method="lowest_cosine_prob",
        hcs_temp=0.1, loss_type="proxy", extra_loss_lambda=1.0,
        learnable_temp=False, donate=False,
    )
    batch = {"image": jax.random.normal(jax.random.key(3), (4, 6, 16, 16)),
             "label": jnp.array([0, 1, 2, 3])}
    state2, m = step(state, batch, jax.random.key(4))
    assert np.isfinite(float(m["loss"]))
    assert float(m["extra_loss"]) != 0.0
    # params changed
    w0 = state.params["backbone"]["channel_embed"]
    w1 = state2.params["backbone"]["channel_embed"]
    assert not np.allclose(np.asarray(w0), np.asarray(w1))


def test_grad_accumulation_matches_fused_sum():
    """Per-chunk grad accumulation == grad of summed loss (CHAMMI path)."""
    model = tiny_model()
    state = _make_state(model)
    gstep = make_grad_step(model, channel_ids=range(6), loss_type="ce")
    b1 = {"image": jax.random.normal(jax.random.key(5), (4, 6, 16, 16)),
          "label": jnp.array([0, 1, 2, 3])}
    b2 = {"image": jax.random.normal(jax.random.key(6), (4, 6, 16, 16)),
          "label": jnp.array([4, 3, 2, 1])}
    rng = jax.random.key(7)
    g1, m1 = gstep(state.params, b1, rng)
    g2, m2 = gstep(state.params, b2, rng)
    acc = tree_add(g1, g2)
    apply_step = make_apply_step(donate=False)
    new_state, norm = apply_step(state, acc)
    assert float(norm) > 0
    assert int(new_state.step) == 1


def test_eval_step_with_override():
    model = tiny_model()
    state = _make_state(model)
    ev = make_eval_step(model)
    x = jax.random.normal(jax.random.key(8), (2, 6, 16, 16))
    cids = jnp.arange(6)
    out = ev(state.params, x, cids)
    assert out.shape == (2, 5)
    override = jnp.zeros((6, 32))
    out2 = ev(state.params, x, cids, override)
    assert out2.shape == (2, 5)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


# --------------------------------------------------------------------------
# Mesh data parallelism
# --------------------------------------------------------------------------


def test_mesh_sharded_train_step_matches_single_device():
    assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
    mesh = make_mesh({"data": -1, "model": 1})
    assert mesh.shape == {"data": 8, "model": 1}

    model = tiny_model()
    state = _make_state(model, batch=8)
    step = make_train_step(model, channel_ids=range(6), loss_type="ce", donate=False)
    batch = {"image": jax.random.normal(jax.random.key(9), (8, 6, 16, 16)),
             "label": jnp.arange(8) % 5}
    rng = jax.random.key(10)

    # single-device result
    s1, m1 = step(state, batch, rng)

    # sharded: batch split over 8 devices, params replicated
    sharded_batch = shard_batch(batch, mesh)
    state_r = state.replace(params=shard_params(state.params, mesh),
                            opt_state=shard_params(state.opt_state, mesh),
                            base_rng=state.base_rng)
    s2, m2 = step(state_r, sharded_batch, rng)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-5)
    w1 = np.asarray(jax.tree_util.tree_leaves(s1.params)[0])
    w2 = np.asarray(jax.tree_util.tree_leaves(s2.params)[0])
    np.testing.assert_allclose(w1, w2, rtol=2e-4, atol=1e-6)


def test_mu_dtype_bf16_moments():
    """`++optimizer.params.mu_dtype=bfloat16` (beyond reference): the first
    Adam moment is stored bf16 (2P -> 1.5P optimizer HBM), nu stays f32,
    and a few steps track the f32-moment run closely."""
    import numpy as np

    from diverse_channel_vit_tpu.training import make_optimizer

    lr = lambda s: jnp.float32(1e-2)

    def run(params, mu_dtype):
        opt_params = dict(weight_decay=0.01)
        if mu_dtype:
            opt_params["mu_dtype"] = mu_dtype
        tx = make_optimizer("adamw", opt_params, lr_schedule=lr, total_steps=4)
        state = tx.init(params)
        p = params
        for t in range(4):
            grads = jax.tree_util.tree_map(
                lambda x: jnp.full_like(x, 0.1 * (t + 1)), p
            )
            updates, state = tx.update(grads, state, p)
            p = optax.apply_updates(p, updates)
        return p, state

    import optax

    params = {
        "w": jnp.ones((8, 4), jnp.float32),
        "b": jnp.zeros((4,), jnp.float32),
    }
    p_bf, st_bf = run(params, "bfloat16")
    p_f32, _ = run(params, None)

    mus = [l for l in jax.tree_util.tree_leaves(st_bf)
           if hasattr(l, "dtype") and l.dtype == jnp.bfloat16]
    assert mus, "no bf16 moment leaves found"
    f32s = [l for l in jax.tree_util.tree_leaves(st_bf)
            if hasattr(l, "dtype") and l.dtype == jnp.float32 and l.ndim >= 1]
    assert f32s, "nu should stay f32"
    for a, b in zip(jax.tree_util.tree_leaves(p_bf),
                    jax.tree_util.tree_leaves(p_f32)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=5e-3)
