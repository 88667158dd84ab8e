"""TP-sharded fused attention core (ops/fused_block.attend_project_sharded).

Round 5, closing the attend_project share of the measured TP fused-path tax
(PERFORMANCE.md "TP fused-path tax" — the builder's own r4 analysis put the
remaining ~10 (dh=64) / ~4 (dh=128) points here): under a model axis the
whole attention sub-block keeps its fused kernels, with per-head Megatron
qkv column / proj row shards and ONE f32 psum where the unfused GSPMD path
puts its proj all-reduce. These tests pin numerics (fwd + grads) vs the
unsharded kernel, the fallback gates, and the communication contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diverse_channel_vit_tpu.ops import attention as A
from diverse_channel_vit_tpu.ops import fused_block as fb
from diverse_channel_vit_tpu.parallel import make_mesh

B, N, D, H = 2, 32, 256, 4  # dh=64, heads divide tp=2 and 4


@pytest.fixture(autouse=True)
def _force_fused_cpu():
    fb.FORCE_ON_CPU = True
    yield
    fb.FORCE_ON_CPU = False
    A.set_tp_attention(None)


def _inputs(key=0, d=D, h=H):
    ks = jax.random.split(jax.random.key(key), 10)
    mk = lambda i, shape, s=0.2: (jax.random.normal(ks[i], shape) * s).astype(jnp.bfloat16)
    return dict(
        y=mk(0, (B, N, d), 0.5), x_res=mk(1, (B, N, d), 0.5),
        wq=mk(2, (d, d)), wk=mk(3, (d, d)), wv=mk(4, (d, d)),
        bq=mk(5, (d,)), bk=mk(6, (d,)), bv=mk(7, (d,)),
        wp=mk(8, (d, d)), bp=mk(9, (d,)),
    )


def _plain(a, h=H, residual=True, valid=None):
    w = jnp.concatenate([a["wq"], a["wk"], a["wv"]], axis=1)
    b = jnp.concatenate([a["bq"], a["bk"], a["bv"]])
    return fb.attend_project(a["y"], w, b, a["wp"], a["bp"],
                             a["x_res"] if residual else None, h,
                             valid_len=valid)


@pytest.mark.parametrize("residual", [False, True])
@pytest.mark.parametrize("tp", [2, 4])
def test_sharded_matches_unsharded(residual, tp):
    a = _inputs()
    A.set_tp_attention(None)
    want = _plain(a, residual=residual, valid=N - 3)
    mesh = make_mesh({"data": 8 // tp, "model": tp})
    A.set_tp_attention(mesh)
    got = fb.attend_project_sharded(
        a["y"], a["wq"], a["wk"], a["wv"], a["bq"], a["bk"], a["bv"],
        a["wp"], a["bp"], a["x_res"] if residual else None, H,
        valid_len=N - 3)
    # same kernels per head group; the psum reassociates the proj partial
    # sums in f32 (the unsharded kernel accumulates all heads in one f32
    # dot) — a handful of elements land on bf16 rounding boundaries
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-2, rtol=5e-2)
    err = (np.linalg.norm(np.asarray(got - want, np.float32))
           / np.linalg.norm(np.asarray(want, np.float32)))
    assert err < 6e-3, err


def test_sharded_grads_match_unsharded():
    a = _inputs(1)
    keys = list(a)

    def loss_plain(vals):
        aa = dict(zip(keys, vals))
        return jnp.sum(_plain(aa).astype(jnp.float32) ** 2)

    def loss_tp(vals):
        aa = dict(zip(keys, vals))
        return jnp.sum(fb.attend_project_sharded(
            aa["y"], aa["wq"], aa["wk"], aa["wv"], aa["bq"], aa["bk"],
            aa["bv"], aa["wp"], aa["bp"], aa["x_res"], H,
        ).astype(jnp.float32) ** 2)

    vals = tuple(a.values())
    A.set_tp_attention(None)
    g_ref = jax.grad(loss_plain)(vals)
    A.set_tp_attention(make_mesh({"model": 4}, devices=jax.devices()[:4]))
    g_tp = jax.grad(loss_tp)(vals)
    norms = {k: np.linalg.norm(np.asarray(r, np.float32))
             for k, r in zip(keys, g_ref)}
    scale = max(norms.values())
    for name, r, t in zip(keys, g_ref, g_tp):
        r = np.asarray(r, np.float32)
        t = np.asarray(t, np.float32)
        if norms[name] < 1e-3 * scale:
            # bk's true gradient is EXACTLY zero (softmax rows: sum_j ds_ij
            # = 0 -> sum_j dk_j = 0); both sides are cancellation noise —
            # only require it stays noise-scale
            assert np.linalg.norm(t) < 1e-3 * scale, (name, np.linalg.norm(t))
            continue
        err = np.linalg.norm(t - r) / norms[name]
        assert err < 2e-2, (name, err)


def test_heads_not_divisible_falls_back_to_plain_math():
    """H=3 under tp=2: the head split can't engage — the sharded entry must
    return the PLAIN kernel's math (GSPMD shards the weights itself), not a
    replicated shard_map (all-gather trap, ADVICE r4)."""
    a = _inputs(2, d=192, h=3)
    A.set_tp_attention(None)
    want = _plain(a, h=3)
    assert fb.tp_attend_available(3) is True  # no wrap yet
    mesh = make_mesh({"data": 4, "model": 2})
    A.set_tp_attention(mesh)
    assert fb.tp_attend_available(3) is False
    got = fb.attend_project_sharded(
        a["y"], a["wq"], a["wk"], a["wv"], a["bq"], a["bk"], a["bv"],
        a["wp"], a["bp"], a["x_res"], 3)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=0, rtol=0)


def test_expert_only_mesh_replicates_bit_equal():
    a = _inputs(3)
    A.set_tp_attention(None)
    want = _plain(a)
    mesh = make_mesh({"data": 2, "expert": 4})
    A.set_tp_attention(mesh)
    assert fb.tp_attend_available(H) is True
    got = fb.attend_project_sharded(
        a["y"], a["wq"], a["wk"], a["wv"], a["bq"], a["bk"], a["bv"],
        a["wp"], a["bp"], a["x_res"], H)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=0, rtol=0)


def _count_fused_calls(monkeypatch):
    """Engagement guard: the Block's %8-token gate silently drops to the
    unfused path at careless geometries (C*(IMG/P)^2+1 must be %8) — these
    full-step tests count the sharded-entry calls so they can never pass
    vacuously."""
    calls = {"ap": 0, "mlp": 0}
    orig_ap, orig_mlp = fb.attend_project_sharded, fb.ln_mlp_sharded
    monkeypatch.setattr(fb, "attend_project_sharded", lambda *a, **k: (
        calls.__setitem__("ap", calls["ap"] + 1), orig_ap(*a, **k))[1])
    monkeypatch.setattr(fb, "ln_mlp_sharded", lambda *a, **k: (
        calls.__setitem__("mlp", calls["mlp"] + 1), orig_mlp(*a, **k))[1])
    return calls


def test_tp_step_with_fused_attention_has_no_allgathers(monkeypatch):
    """Full dp x tp "mlp"-mode train step at a geometry where the fused
    gates AND the head split engage (64 tokens, H=4, tp=2): the
    communication contract must still hold — zero all-gathers/permutes,
    attention + MLP each contributing only all-reduces."""
    import re

    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier
    from diverse_channel_vit_tpu.parallel import apply_param_shardings, shard_batch
    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.steps import make_train_step

    calls = _count_fused_calls(monkeypatch)
    C, IMG, PATCH = 7, 48, 16  # 7*9+1 = 64 tokens (%8 gate open)
    backbone = ChannelVisionTransformer(
        num_total_channels=C, img_size=IMG, patch_size=PATCH, embed_dim=D,
        depth=2, num_heads=H, attention_impl="pallas", dtype=jnp.bfloat16)
    model = ChannelAdaptiveClassifier(backbone=backbone, embed_dim=D,
                                      num_classes=7, with_head=True)
    tx = make_optimizer("adamw", dict(weight_decay=0.01),
                        lr_schedule=lambda s: jnp.float32(1e-3), total_steps=4)
    state = create_train_state(
        model, tx, rng=jax.random.key(0),
        sample_input=jnp.zeros((2, C, IMG, IMG), jnp.float32),
        sample_channel_ids=jnp.arange(C))
    mesh = make_mesh({"data": 2, "model": 2}, devices=jax.devices()[:4])
    old = fb.FUSED_BLOCK_DEFAULT
    try:
        fb.set_fused_block("mlp")
        A.set_tp_attention(mesh)
        sharded = apply_param_shardings(state.params, mesh)
        state = state.replace(params=sharded, opt_state=tx.init(sharded))
        step = make_train_step(model, channel_ids=range(C), k=None,
                               loss_type="ce", extra_loss_lambda=1.0,
                               donate=False, mesh=mesh)
        batch = shard_batch({
            "image": jax.random.normal(jax.random.key(1), (8, C, IMG, IMG)),
            "label": jnp.arange(8) % 7,
        }, mesh)
        txt = step.trace(state, batch, jax.random.key(2)).lower().compile().as_text()
    finally:
        fb.set_fused_block(old)
        A.set_tp_attention(None)
    assert calls["ap"] >= 2 and calls["mlp"] >= 2, calls  # depth-2 engagement
    for op in ("all-gather", "collective-permute", "all-to-all"):
        bad = [l for l in txt.splitlines()
               if re.search(r"= *\(?.*" + op + r"(-start)?\(", l)]
        assert not bad, (op, bad[:3])


def test_tp_step_with_fused_attention_matches_unsharded(monkeypatch):
    """Loss/grad_norm parity of the full TP step with the sharded fused
    attention core engaged vs the unsharded fused step."""
    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier
    from diverse_channel_vit_tpu.parallel import apply_param_shardings, shard_batch
    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.steps import make_train_step

    calls = _count_fused_calls(monkeypatch)
    C, IMG, PATCH = 7, 48, 16  # 64 tokens: fused gates open
    backbone = ChannelVisionTransformer(
        num_total_channels=C, img_size=IMG, patch_size=PATCH, embed_dim=D,
        depth=2, num_heads=H, proxy_loss_lambda=1e-3,
        ortho_loss_v1_lambda=1e-3, attention_impl="pallas",
        dtype=jnp.bfloat16)
    model = ChannelAdaptiveClassifier(backbone=backbone, embed_dim=D,
                                      num_classes=7, with_head=True)
    tx = make_optimizer("adamw", dict(weight_decay=0.01),
                        lr_schedule=lambda s: jnp.float32(1e-3), total_steps=4)

    def fresh_state():
        return create_train_state(
            model, tx, rng=jax.random.key(0),
            sample_input=jnp.zeros((2, C, IMG, IMG), jnp.float32),
            sample_channel_ids=jnp.arange(C))

    kwargs = dict(channel_ids=range(C), k=None, loss_type="ce",
                  extra_loss_lambda=1.0, donate=False)
    batch = {
        "image": jax.random.normal(jax.random.key(1), (8, C, IMG, IMG)),
        "label": jnp.arange(8) % 7,
    }
    old = fb.FUSED_BLOCK_DEFAULT
    try:
        fb.set_fused_block(True)
        A.set_tp_attention(None)
        step_ref = make_train_step(model, **kwargs)
        _, m_ref = step_ref(fresh_state(), dict(batch), jax.random.key(3))

        mesh = make_mesh({"data": 2, "model": 2}, devices=jax.devices()[:4])
        fb.set_fused_block("mlp")
        A.set_tp_attention(mesh)
        state = fresh_state()
        sharded = apply_param_shardings(state.params, mesh)
        state = state.replace(params=sharded, opt_state=tx.init(sharded))
        step_tp = make_train_step(model, mesh=mesh, **kwargs)
        _, m_tp = step_tp(state, shard_batch(dict(batch), mesh), jax.random.key(3))
    finally:
        fb.set_fused_block(old)
        A.set_tp_attention(None)

    assert calls["ap"] >= 4 and calls["mlp"] >= 4, calls  # both steps engaged
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]),
                               rtol=2e-2)
    np.testing.assert_allclose(float(m_tp["grad_norm"]), float(m_ref["grad_norm"]),
                               rtol=5e-2)
