"""TP-aware fused MLP (ops/fused_block.ln_mlp_sharded + Block "mlp" mode).

Round 4: closes part of the measured TP fused-path tax (PERFORMANCE.md "TP
fused-path tax") — under non-data mesh axes the fused ln_mlp now runs per
shard with Megatron column/row-sharded fc1/fc2 and ONE psum, instead of
yielding to the unfused path. These tests pin numerics (fwd + grads) against
the dense oracle on the virtual mesh, the end-to-end TP train step, and the
communication contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diverse_channel_vit_tpu.ops import attention as A
from diverse_channel_vit_tpu.ops import fused_block as fb
from diverse_channel_vit_tpu.parallel import (apply_param_shardings, make_mesh,
                                              shard_batch)

D, HID, N, B = 128, 512, 32, 4


@pytest.fixture(autouse=True)
def _force_fused_cpu():
    fb.FORCE_ON_CPU = True
    yield
    fb.FORCE_ON_CPU = False
    A.set_tp_attention(None)


def _inputs(key=0, d=D, hid=HID):
    ks = jax.random.split(jax.random.key(key), 7)
    mk = lambda i, shape, s=0.3: (jax.random.normal(ks[i], shape) * s).astype(jnp.bfloat16)
    return (mk(0, (B, N, d)), jnp.abs(mk(1, (d,))) + 0.5, mk(2, (d,)),
            mk(3, (d, hid), 0.05), mk(4, (hid,)), mk(5, (hid, d), 0.05),
            mk(6, (d,)))


def _dense_ref(x, scale, bias, w1, b1, w2, b2, residual):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    y = (xf - mu) / jnp.sqrt(var + 1e-6) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    h = y.astype(jnp.bfloat16) @ w1 + b1
    from diverse_channel_vit_tpu.ops.activations import gelu

    h = gelu(h.astype(jnp.float32), exact=False).astype(jnp.bfloat16)
    out = (h @ w2).astype(jnp.float32) + b2.astype(jnp.float32)
    if residual:
        out = out + xf
    return out.astype(jnp.bfloat16)


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("residual", [False, True])
def test_ln_mlp_sharded_matches_dense_under_model_axis(residual, quantized):
    args = _inputs()
    mesh = make_mesh({"data": 2, "model": 2}, devices=jax.devices()[:4])
    A.set_tp_attention(mesh)
    got = fb.ln_mlp_sharded(*args, residual, quantized)
    want = _dense_ref(*args, residual)
    # int8 path: ~1% relative error per GEMM by design, and the per-row
    # activation scales of the row-sharded fc2 input are computed per
    # shard — looser band (ADVICE r4: pin the quantized TP path too)
    tol = dict(atol=8e-2, rtol=8e-2) if quantized else dict(atol=3e-2, rtol=3e-2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), **tol)
    # against the unsharded kernel itself: tight (same kernel, one psum)
    A.set_tp_attention(None)
    base = fb.ln_mlp(*args, residual, quantized)
    tol = dict(atol=5e-2, rtol=5e-2) if quantized else dict(atol=1e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(base, np.float32), **tol)


@pytest.mark.parametrize("quantized", [False, True])
def test_ln_mlp_sharded_grads_match_unsharded(quantized):
    args = _inputs(1)
    mesh = make_mesh({"model": 4}, devices=jax.devices()[:4])

    def loss(fn, a):
        return jnp.sum(fn(*a, False, quantized).astype(jnp.float32) ** 2)

    A.set_tp_attention(None)
    g_ref = jax.grad(lambda a: loss(fb.ln_mlp, a))(args)
    A.set_tp_attention(mesh)
    g_tp = jax.grad(lambda a: loss(fb.ln_mlp_sharded, a))(args)
    for r, t in zip(g_ref, g_tp):
        r, t = np.asarray(r, np.float32), np.asarray(t, np.float32)
        if quantized:
            # per-shard activation scales re-bin a handful of int8 elements;
            # elementwise bands are the wrong instrument — pin the relative
            # L2 error of each grad tensor instead
            err = np.linalg.norm(t - r) / (np.linalg.norm(r) + 1e-8)
            assert err < 3e-2, err
        else:
            # bf16 weight grads from 4 split partial GEMMs reassociate; the
            # residual deltas are single-ulp at the element scale
            np.testing.assert_allclose(t, r, atol=2e-1, rtol=5e-2)


def test_ln_mlp_sharded_misaligned_falls_back_to_xla():
    """hid % tp == 0 but the shard isn't lane-aligned ((hid//tp) % 128 != 0):
    the Megatron split can't engage. ADVICE r4: the old path replicated the
    FULL MLP inside shard_map with P() in_specs — forcing per-step
    all-gathers of the GSPMD-sharded fc1/fc2. Now it must route to dense XLA
    ops (GSPMD shards them itself): correct numerics, and when jitted with
    Megatron-sharded weights the HLO contains all-reduce only."""
    d, hid = 96, 384  # tp=4 -> shard 96, not %128
    args = _inputs(3, d=d, hid=hid)
    mesh = make_mesh({"data": 2, "model": 4})
    A.set_tp_attention(mesh)
    got = fb.ln_mlp_sharded(*args, True, False)
    want = _dense_ref(*args, True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)

    # communication contract: jit with fc1 column- / fc2 row-sharded weights
    # (what apply_param_shardings produces at this geometry) -> no all-gather
    import re

    from jax.sharding import NamedSharding, PartitionSpec as P

    x, scale, bias, w1, b1, w2, b2 = args
    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))
    w1s = put(w1, P(None, "model"))
    b1s = put(b1, P("model"))
    w2s = put(w2, P("model", None))
    xs = put(x, P("data"))

    fn = jax.jit(lambda *a: fb.ln_mlp_sharded(*a, True, False))
    txt = fn.lower(xs, scale, bias, w1s, b1s, w2s, b2).compile().as_text()
    for op in ("all-gather", "collective-permute", "all-to-all"):
        bad = [l for l in txt.splitlines()
               if re.search(r"= *\(?.*" + op + r"(-start)?\(", l)]
        assert not bad, (op, bad[:3])
    assert "all-reduce" in txt  # the Megatron fc2 reduction is still there


def test_ln_mlp_sharded_expert_axis_replicates():
    """An expert-only mesh shards nothing here: the wrapper only keeps the
    kernel out of GSPMD — outputs equal the unsharded kernel exactly."""
    args = _inputs(2)
    mesh = make_mesh({"data": 2, "expert": 4})
    A.set_tp_attention(mesh)
    got = fb.ln_mlp_sharded(*args, True, False)
    A.set_tp_attention(None)
    want = fb.ln_mlp(*args, True, False)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), atol=0, rtol=0)


def test_tp_train_step_fused_mlp_matches_unsharded():
    """Full dp x tp train step in "mlp" mode: loss/grad_norm reproduce the
    unsharded fused step (the mode a TP trainer now configures)."""
    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier
    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.steps import make_train_step

    C, IMG, PATCH = 4, 32, 16
    backbone = ChannelVisionTransformer(
        num_total_channels=C, img_size=IMG, patch_size=PATCH, embed_dim=D,
        depth=2, num_heads=2, proxy_loss_lambda=1e-3, ortho_loss_v1_lambda=1e-3,
        attention_impl="pallas", dtype=jnp.bfloat16)
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

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]),
                               rtol=2e-2)
    np.testing.assert_allclose(float(m_tp["grad_norm"]), float(m_ref["grad_norm"]),
                               rtol=5e-2)


def test_tp_fused_mlp_step_has_no_allgathers():
    """Communication contract of the "mlp"-mode TP step: still zero
    all-gathers/permutes — the sharded fused MLP communicates only through
    its psum (an all-reduce, where the unfused path had one too)."""
    import re

    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier
    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.steps import make_train_step

    C, IMG, PATCH = 4, 32, 16
    backbone = ChannelVisionTransformer(
        num_total_channels=C, img_size=IMG, patch_size=PATCH, embed_dim=D,
        depth=2, num_heads=2, attention_impl="pallas", dtype=jnp.bfloat16)
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
    for op in ("all-gather", "collective-permute", "all-to-all"):
        bad = [l for l in txt.splitlines()
               if re.search(r"= *\(?.*" + op + r"(-start)?\(", l)]
        assert not bad, (op, bad[:3])
