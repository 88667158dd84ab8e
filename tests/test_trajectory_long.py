"""Long-horizon trajectory parity: 200 composed steps with SWA + MIRO on.

Extends tests/test_trajectory_parity.py (30 steps) to epoch scales
(VERDICT r3 item 10): identical fp32 init transplanted into the reference's
own torch DiChaViT trunk, 200 optimizer steps of the full composition —
AdamW + warmup-cosine lr + clip + CDL/TDL extra losses + the MIRO
mutual-information regularizer (reference formula, ``trainer.py:885-910``)
— with plain-SWA parameter averaging every 10-step "epoch" past swa_start
(``trainer.py:810-812``). Asserts the per-step loss drift at checkpoints
along the curve (documenting growth vs step count) and the final
SWA-averaged parameter trees.

Oracle notes:
- the reference's in-tree MIRO is broken (``get_shapes`` unpacks a tensor),
  so the torch side implements the reference FORMULA: identity mean
  encoder, softplus variance encoder per block tap, frozen init copy as
  pre-featurizer, vlb = mean((f-pre)^2/var + log var)/2 summed over taps;
- ``miro_lr_mult=1`` and constant wd, so the reference's 3-param-group
  optimizer collapses to a single group (group-composition at mult>1 is
  not under test here);
- SWA averaging is the running mean ``avg += (p-avg)/(n+1)`` — exactly
  torch's ``AveragedModel`` default — applied to every trainable tensor
  including the variance-encoder biases.
"""

import copy
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_trajectory_parity import (  # noqa: E402
    BATCH, C_TOTAL, DEPTH, DIM, IMG, NUM_CLASSES, PATCH, _build_ref_trunk,
    _our_model, _ref_cfg, _transplant_backbone, ref_dichavit, exact_gelu)

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent"),
]

N_STEPS = 200
EPOCH_LEN = 10
SWA_START_EPOCH = 10  # epochs (1-based); updates after epochs 11..20
MIRO_LD = 0.01
MILESTONES = (30, 60, 100, 150, 200)


def _swa_update(avg, cur, n):
    return [a + (c - a) / (n + 1) for a, c in zip(avg, cur)]


def test_long_horizon_swa_miro_trajectory(ref_dichavit, exact_gelu):
    import jax
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.miro import MIRO_KEY, init_encoders
    from diverse_channel_vit_tpu.training.schedules import make_lr_schedule
    from diverse_channel_vit_tpu.training.steps import make_train_step

    subsets = [[0, 1, 2, 3], [2, 0, 3], [1, 3], [0, 2, 1]]
    mapper = {"train": list(range(C_TOTAL))}
    mapper.update({f"s{i}": s for i, s in enumerate(subsets)})
    base_lr, clip, wd0, extra_lambda = 4e-4, 1.0, 0.01, 1.0

    cfg = _ref_cfg()
    trunk = _build_ref_trunk(ref_dichavit, mapper, cfg)
    torch.manual_seed(1)
    head = torch.nn.Linear(DIM, NUM_CLASSES)
    trunk.train(), head.train()

    lr_fn = make_lr_schedule(
        "cosine", base_lr, dict(t_initial=20, warmup_t=2, warmup_lr_init=1e-5),
        num_epochs=20, steps_per_epoch=EPOCH_LEN)
    lr_values = [float(lr_fn(t)) for t in range(N_STEPS)]

    rng = np.random.default_rng(31)
    xs = rng.normal(size=(N_STEPS, BATCH, C_TOTAL, IMG, IMG)).astype(np.float32) * 0.5
    ys = rng.integers(0, NUM_CLASSES, size=(N_STEPS, BATCH))

    init_backbone = _transplant_backbone(trunk)
    init_head = {"kernel": head.weight.detach().numpy().copy().T,
                 "bias": head.bias.detach().numpy().copy()}

    # ---- torch oracle ----------------------------------------------------
    pre_trunk = copy.deepcopy(trunk).eval()
    b0 = float(np.log(np.exp(0.1 - 1e-5) - 1.0))  # softplus^-1(0.1 - eps)
    var_bs = [torch.nn.Parameter(torch.full((1, 1, DIM), b0))
              for _ in range(DEPTH)]

    taps, pre_taps = [], []
    for blocks, store in ((trunk.blocks, taps), (pre_trunk.blocks, pre_taps)):
        for blk in blocks:
            blk.register_forward_hook(
                lambda m, i, o, _s=store: _s.append(o))

    all_params = list(trunk.parameters()) + list(head.parameters()) + var_bs
    opt = torch.optim.AdamW(all_params, lr=lr_values[0], betas=(0.9, 0.999),
                            eps=1e-6, weight_decay=wd0)
    ce = torch.nn.CrossEntropyLoss()

    param_names = ([f"trunk.{n}" for n, _ in trunk.named_parameters()]
                   + ["head.weight", "head.bias"]
                   + [f"var_b.{i}" for i in range(DEPTH)])
    assert len(param_names) == len(all_params)

    ref_losses, ref_swa, ref_n = [], None, 0
    for t in range(N_STEPS):
        s = subsets[t % len(subsets)]
        opt.param_groups[0]["lr"] = lr_values[t]
        opt.zero_grad()
        taps.clear(), pre_taps.clear()
        x = torch.from_numpy(xs[t][:, s])
        feats, extra = trunk(x, f"s{t % len(subsets)}")
        with torch.no_grad():
            pre_trunk(x, f"s{t % len(subsets)}")
        vlb = 0.0
        for f, pre, b in zip(taps, pre_taps, var_bs):
            var = torch.nn.functional.softplus(b) + 1e-5
            vlb = vlb + (((f - pre.detach()) ** 2) / var + var.log()).mean() / 2.0
        logits = head(feats)
        loss = ce(logits, torch.from_numpy(ys[t])) + extra_lambda * extra \
            + MIRO_LD * vlb
        loss.backward()
        torch.nn.utils.clip_grad_norm_(all_params, clip)
        opt.step()
        ref_losses.append(float(loss))
        if (t + 1) % EPOCH_LEN == 0 and (t + 1) // EPOCH_LEN > SWA_START_EPOCH:
            cur = [p.detach().clone() for p in all_params]
            ref_swa = cur if ref_swa is None else _swa_update(ref_swa, cur, ref_n)
            ref_n += 1

    # ---- our jitted steps ------------------------------------------------
    model = _our_model(with_head=True)
    tx = make_optimizer(
        "adamw", dict(betas=[0.9, 0.999], eps=1e-6, weight_decay=wd0),
        lr_schedule=lr_fn, total_steps=N_STEPS, clip_grad_norm=clip)
    state = create_train_state(
        model, tx, rng=jax.random.key(0),
        sample_input=jnp.zeros((2, C_TOTAL, IMG, IMG), jnp.float32),
        sample_channel_ids=jnp.arange(C_TOTAL))
    params = dict(state.params)
    params["backbone"] = init_backbone
    params["classifier_head"] = init_head
    params = jax.tree_util.tree_map(jnp.asarray, params)
    model_params = dict(params)
    params[MIRO_KEY] = init_encoders(
        model, model_params, jnp.zeros((2, C_TOTAL, IMG, IMG), jnp.float32),
        jnp.arange(C_TOTAL))
    pre_params = jax.tree_util.tree_map(jnp.copy, model_params)
    state = state.replace(params=params, opt_state=tx.init(params))

    # tap-count sanity: one variance encoder per block on both sides
    assert len(params[MIRO_KEY]) == DEPTH

    step_cache = {}
    our_losses, our_swa_tree, our_n = [], None, 0
    for t in range(N_STEPS):
        s = subsets[t % len(subsets)]
        step = step_cache.get(tuple(s))
        if step is None:
            step = step_cache[tuple(s)] = make_train_step(
                model, channel_ids=s, k=None, loss_type="ce",
                extra_loss_lambda=extra_lambda, donate=False,
                miro_pre_params=pre_params, miro_ld=MIRO_LD)
        batch = {"image": jnp.asarray(xs[t][:, s]), "label": jnp.asarray(ys[t])}
        state, metrics = step(state, batch, jax.random.key(t))
        our_losses.append(float(metrics["loss"]))
        if (t + 1) % EPOCH_LEN == 0 and (t + 1) // EPOCH_LEN > SWA_START_EPOCH:
            cur = jax.tree_util.tree_map(np.asarray, state.params)
            if our_swa_tree is None:
                our_swa_tree = cur
            else:
                our_swa_tree = jax.tree_util.tree_map(
                    lambda a, c, _n=our_n: a + (c - a) / (_n + 1),
                    our_swa_tree, cur)
            our_n += 1

    # ---- drift growth along the curve -----------------------------------
    ref_arr, our_arr = np.asarray(ref_losses), np.asarray(our_losses)
    drift_curve = {}
    for m in MILESTONES:
        d = np.max(np.abs(our_arr[:m] - ref_arr[:m]) / np.abs(ref_arr[:m]))
        drift_curve[m] = float(d)
    print("drift curve (max rel per prefix):", drift_curve)
    # measured: ~3e-6 at 30 steps; fp32 accumulation grows it along the
    # curve but it must stay comfortably inside optimizer-trajectory noise
    assert drift_curve[30] < 1e-4, drift_curve
    assert drift_curve[200] < 5e-3, drift_curve

    # ---- final SWA averages ----------------------------------------------
    assert ref_n == our_n == (N_STEPS // EPOCH_LEN) - SWA_START_EPOCH
    ref_avg = {n: t_.numpy() for n, t_ in zip(param_names, ref_swa)}
    our_avg = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(our_swa_tree)[0]:
        our_avg["/".join(str(getattr(p, "key", p)) for p in path)] = np.asarray(leaf)

    def close(ref, ours):
        # measured: ~1e-4 max abs drift in the averaged weights after 200
        # composed fp32 steps (loss drift curve above bounds the dynamics)
        np.testing.assert_allclose(ref.squeeze(), np.asarray(ours).squeeze(),
                                   atol=5e-4, rtol=5e-3)

    close(ref_avg["trunk.cls_token"], our_avg["backbone/cls_token"])
    close(ref_avg["trunk.pos_embed"], our_avg["backbone/pos_embed"])
    close(ref_avg["trunk.patch_embed.channel_embed.weight"],
          our_avg["backbone/channel_embed"])
    close(ref_avg["trunk.blocks.0.mlp.fc1.weight"].T,
          our_avg["backbone/block_0/mlp/fc1/kernel"])
    close(ref_avg["head.weight"].T, our_avg["classifier_head/kernel"])
    miro_keys = sorted(k for k in our_avg if k.startswith(MIRO_KEY))
    for i, mk in enumerate(miro_keys):
        close(ref_avg[f"var_b.{i}"], our_avg[mk])
    # global magnitude of the full averaged solution (leaf-split-invariant:
    # our wq/wk/wv vs torch's fused qkv hold the same numbers). Our tree
    # carries one extra leaf the torch side has no counterpart for: the
    # head-mode classifier keeps `proxies` for checkpoint compatibility
    # (unused by the CE loss) — excluded.
    ref_flat = np.concatenate([v.ravel() for v in ref_avg.values()])
    our_flat = np.concatenate([v.ravel() for k, v in our_avg.items()
                               if k != "proxies"])
    np.testing.assert_allclose(
        np.linalg.norm(our_flat), np.linalg.norm(ref_flat), rtol=1e-4)
