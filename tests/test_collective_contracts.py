"""HLO collective contracts for the TP / EP / SP / PP legs (SURVEY §2.6).

tests/test_shard_map_steps.py pins the data-parallel step's communication
contract (ONE grad-sized all-reduce, zero all-gathers); these tests extend
the same assert-from-compiled-HLO pattern to the remaining mesh axes, so a
regression that silently adds re-assembly (all-gather) or extra ring/pipe
traffic fails loudly. Counts are *HLO op definitions* in the compiled
module text — loops (lax.scan over layers, the unrolled ring) mean one
textual def can execute many times; the contract pins the program
structure, the formulas in comments give the per-step executed volume.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diverse_channel_vit_tpu.models.vit import Block, BlockStack
from diverse_channel_vit_tpu.parallel import (apply_param_shardings, make_mesh,
                                              shard_batch)
from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
from diverse_channel_vit_tpu.training.steps import make_train_step

C, IMG, PATCH, DIM, DEPTH = 4, 32, 16, 64, 2


def _census(txt: str) -> dict:
    ops = ("all-reduce", "all-gather", "reduce-scatter", "collective-permute",
           "all-to-all")
    return {op: len([l for l in txt.splitlines()
                     if re.search(r"= *\(?.*" + op + r"(-start)?\(", l)])
            for op in ops}


def _build(impl="xla"):
    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier

    backbone = ChannelVisionTransformer(
        num_total_channels=C, img_size=IMG, patch_size=PATCH, embed_dim=DIM,
        depth=DEPTH, num_heads=2, proxy_loss_lambda=1e-3,
        ortho_loss_v1_lambda=1e-3, attention_impl=impl)
    return ChannelAdaptiveClassifier(backbone=backbone, embed_dim=DIM,
                                     num_classes=7, with_head=True)


def _step_txt(model, mesh):
    tx = make_optimizer("adamw", dict(weight_decay=0.01),
                        lr_schedule=lambda s: jnp.float32(1e-3), total_steps=4)
    state = create_train_state(
        model, tx, rng=jax.random.key(0),
        sample_input=jnp.zeros((2, C, IMG, IMG), jnp.float32),
        sample_channel_ids=jnp.arange(C))
    sharded = apply_param_shardings(state.params, mesh)
    state = state.replace(params=sharded, opt_state=tx.init(sharded))
    step = make_train_step(model, channel_ids=range(C), k=2,
                           hcs_method="lowest_cosine_prob", hcs_temp=0.5,
                           patch_size=PATCH, loss_type="ce",
                           extra_loss_lambda=1.0, donate=False, mesh=mesh)
    batch = shard_batch({
        "image": jax.random.normal(jax.random.key(1), (8, C, IMG, IMG)),
        "label": jnp.arange(8) % 7,
    }, mesh)
    return step.trace(state, batch, jax.random.key(3)).lower().compile().as_text()


def test_tp_step_collective_contract():
    """dp2 x model2 with the TP flash path: Megatron shardings communicate
    ONLY via all-reduces (row-parallel output reductions in fwd,
    column-parallel input-grad reductions in bwd, the data-axis grad sync
    and the metric pmeans) — crucially ZERO all-gathers (no weight or
    activation re-assembly) and zero permutes."""
    from diverse_channel_vit_tpu.ops import attention as A

    A.INTERPRET = True
    mesh = make_mesh({"data": 2, "model": 2}, devices=jax.devices()[:4])
    A.set_tp_attention(mesh)
    try:
        c = _census(_step_txt(_build("pallas"), mesh))
    finally:
        A.set_tp_attention(None)
    assert c["all-gather"] == 0, c
    assert c["collective-permute"] == 0 and c["all-to-all"] == 0, c
    # measured structure at depth 2: 4 fwd activation reduces (attn proj +
    # MLP fc2 per block) + 4 bwd input-grad reduces + grad sync + metrics
    assert c["all-reduce"] == 10, c


def test_ep_step_collective_contract():
    """dp2 x expert4: the per-global-channel table lookups lower to masked
    gathers that reduce over the expert axis — all-reduce only, zero
    all-gathers (the tables are never re-assembled on one device)."""
    mesh = make_mesh({"data": 2, "expert": 4})
    c = _census(_step_txt(_build("xla"), mesh))
    assert c["all-gather"] == 0, c
    assert c["collective-permute"] == 0 and c["all-to-all"] == 0, c
    assert c["all-reduce"] == 4, c


@pytest.mark.parametrize("seq", [2, 4, 8])
def test_sp_forward_collective_contract(seq):
    """Ring attention forward: exactly 2*(seq-1) collective-permute defs
    (k and v hop once per ring step; the layer loop is scanned so depth
    does not multiply the textual count) and NO other collectives."""
    from diverse_channel_vit_tpu.parallel import seq_parallel_apply

    stack = BlockStack(depth=DEPTH, num_heads=2, mlp_ratio=2.0,
                       attention_impl="xla", remat=False)
    x = jax.random.normal(jax.random.key(0), (2, 32, 32))
    params = stack.init({"params": jax.random.key(1)}, x, train=False)["params"]
    mesh = make_mesh({"seq": seq}, devices=jax.devices()[:seq])
    f = jax.jit(lambda p, x_: seq_parallel_apply(stack, p, x_, mesh, train=False))
    c = _census(f.trace(params, x).lower().compile().as_text())
    assert c["collective-permute"] == 2 * (seq - 1), c
    assert c["all-reduce"] == 0 and c["all-gather"] == 0, c


def test_sp_grad_collective_contract():
    """Ring attention fwd+bwd: the ring runs twice (recompute + reverse)
    -> 4*(seq-1) permute defs; the weight grads psum over seq in ONE fused
    all-reduce; still zero all-gathers."""
    from diverse_channel_vit_tpu.parallel import seq_parallel_apply

    seq = 4
    stack = BlockStack(depth=DEPTH, num_heads=2, mlp_ratio=2.0,
                       attention_impl="xla", remat=False)
    x = jax.random.normal(jax.random.key(2), (2, 32, 32))
    params = stack.init({"params": jax.random.key(3)}, x, train=False)["params"]
    mesh = make_mesh({"seq": seq}, devices=jax.devices()[:seq])
    g = jax.jit(jax.grad(lambda p: jnp.sum(
        seq_parallel_apply(stack, p, x, mesh, train=False) ** 2)))
    c = _census(g.trace(params).lower().compile().as_text())
    assert c["collective-permute"] == 4 * (seq - 1), c
    assert c["all-reduce"] == 1, c
    assert c["all-gather"] == 0, c


@pytest.mark.parametrize("pipe,m", [(2, 2), (2, 4), (4, 4), (4, 8)])
def test_pp_collective_contract(pipe, m):
    """GPipe forward: the collapsed schedule runs m + pipe - 1 ticks with
    one boundary hand-off between consecutive ticks -> m + pipe - 2
    collective-permute defs, ONE all-reduce (the stage-masked output
    reduction), zero all-gathers."""
    from diverse_channel_vit_tpu.parallel.pipeline import pipeline_apply

    stack = BlockStack(depth=4, num_heads=2, mlp_ratio=2.0,
                       attention_impl="xla", remat=False)
    x = jax.random.normal(jax.random.key(1), (8, 16, 32))
    params = stack.init({"params": jax.random.key(2)},
                        jnp.zeros((2, 16, 32)), train=False)["params"]

    def block_apply(lp, h):
        return Block(num_heads=2, mlp_ratio=2.0,
                     attention_impl="xla").apply({"params": lp}, h, train=False)

    mesh = make_mesh({"pipe": pipe}, devices=jax.devices()[:pipe])
    f = jax.jit(lambda p, x_: pipeline_apply(block_apply, p, x_, mesh,
                                             n_microbatches=m))
    c = _census(f.trace(params["blocks"]["block"], x).lower().compile().as_text())
    assert c["collective-permute"] == m + pipe - 2, c
    assert c["all-reduce"] == 1, c
    assert c["all-gather"] == 0, c


def test_composed_axes_step_collective_contract(monkeypatch):
    """dp2 x model2 x expert2 with ZeRO-1 and the "mlp" fused mode — the
    round-5 composition leg (VERDICT r4 item 5): real deployments compose
    axes, and cross-axis interactions must not regress the per-axis
    contracts. Geometry chosen so the SHARDED fused kernels actually engage
    (64 tokens, dh=64, hid/tp %128==0 — engagement is asserted, not
    assumed). Still zero all-gathers, zero permutes; all-reduce only."""
    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier
    from diverse_channel_vit_tpu.ops import attention as A
    from diverse_channel_vit_tpu.ops import fused_block as fb
    from diverse_channel_vit_tpu.parallel.zero import apply_zero1

    calls = {"ap": 0, "mlp": 0}
    orig_ap, orig_mlp = fb.attend_project_sharded, fb.ln_mlp_sharded
    monkeypatch.setattr(fb, "attend_project_sharded", lambda *a, **k: (
        calls.__setitem__("ap", calls["ap"] + 1), orig_ap(*a, **k))[1])
    monkeypatch.setattr(fb, "ln_mlp_sharded", lambda *a, **k: (
        calls.__setitem__("mlp", calls["mlp"] + 1), orig_mlp(*a, **k))[1])

    A.INTERPRET = True
    fb.FORCE_ON_CPU = True
    mesh = make_mesh({"data": 2, "model": 2, "expert": 2})
    A.set_tp_attention(mesh)
    fb.set_fused_block("mlp")
    cc, img, patch = 7, 48, 16  # 7*9+1 = 64 tokens: the %8 fused gate opens
    try:
        backbone = ChannelVisionTransformer(
            num_total_channels=cc, img_size=img, patch_size=patch,
            embed_dim=128, depth=DEPTH, num_heads=2, proxy_loss_lambda=1e-3,
            ortho_loss_v1_lambda=1e-3, attention_impl="pallas",
            dtype=jnp.bfloat16)
        model = ChannelAdaptiveClassifier(backbone=backbone, embed_dim=128,
                                          num_classes=7, with_head=True)
        tx = make_optimizer("adamw", dict(weight_decay=0.01),
                            lr_schedule=lambda s: jnp.float32(1e-3),
                            total_steps=4)
        state = create_train_state(
            model, tx, rng=jax.random.key(0),
            sample_input=jnp.zeros((2, cc, img, img), jnp.float32),
            sample_channel_ids=jnp.arange(cc))
        sharded = apply_param_shardings(state.params, mesh)
        state = state.replace(params=sharded,
                              opt_state=apply_zero1(tx.init(sharded), mesh))
        # k=None: a sampled channel subset would shrink the token count
        # below the %8 fused gate; the EP table gathers happen regardless
        step = make_train_step(model, channel_ids=range(cc), k=None,
                               loss_type="ce", extra_loss_lambda=1.0,
                               donate=False, mesh=mesh, zero1=True)
        batch = shard_batch({
            "image": jax.random.normal(jax.random.key(1), (8, cc, img, img)),
            "label": jnp.arange(8) % 7,
        }, mesh)
        txt = step.trace(state, batch, jax.random.key(3)).lower().compile().as_text()
    finally:
        A.set_tp_attention(None)
        fb.set_fused_block(True)
        fb.FORCE_ON_CPU = False
    assert calls["ap"] >= 2 and calls["mlp"] >= 2, calls  # fused engaged
    c = _census(txt)
    assert c["all-gather"] == 0, c
    assert c["collective-permute"] == 0 and c["all-to-all"] == 0, c
    # composition = TP reduces (fused attention psum + fused MLP psum per
    # block, their bwd transposes, grad sync, metrics) + EP table reduces
    assert c["all-reduce"] > 0 and c["all-reduce"] <= 20, c
