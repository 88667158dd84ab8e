"""Trajectory-level golden parity vs the torch reference.

The per-part golden suite (tests/test_reference_parity.py) pins forward,
losses, TPS and schedules separately; these tests pin the COMPOSED update
loop — AdamW + timm-style lr writes + cosine weight-decay writes + global
grad clipping + CDL/TDL + forced channel draws — by transplanting identical
fp32 init into the reference's own torch DiChaViT trunk
(/root/reference/models/dichavit.py), driving both frameworks with the same
synthetic batches and the same forced channel subsets for N optimizer steps,
and asserting the per-step loss sequences agree within fp32 tolerance.

Oracle fidelity notes:
- the torch loop re-implements the reference's update loop verbatim
  (``trainer.py:963-1028`` regular, ``:824-931`` per-chunk accumulation,
  ``optimizers.py:9-27``): clip -> step -> write wd_schedule[num_updates-1]
  into the param group AFTER the step (the one-step lag), single param
  group, torch.optim.AdamW (timm's AdamW is the same decoupled update);
- per-step lr values come from OUR schedule function on both sides — the
  schedule-vs-timm value parity is pinned separately in
  tests/test_training.py, so this test isolates the loop composition;
- forced HCS draws: the reference model is built with ``enable_sample=False``
  and a mapper containing one named chunk per forced subset, so each step
  processes exactly the channels our step factory is specialized on.
"""

import os
import sys
import types
from functools import partial

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")

C_TOTAL = 4
IMG, PATCH, DIM, DEPTH, HEADS = 32, 16, 64, 2, 2
NUM_CLASSES = 7
BATCH = 8


@pytest.fixture(scope="module")
def ref_dichavit():
    """Import the reference dichavit module (third-party stubs scoped by
    ref_stubs — they must not leak into sys.modules past the import)."""
    import ref_stubs

    return ref_stubs.load("models.dichavit")


class _Cfg(dict):
    """Attribute-style config the reference modules read (OmegaConf role)."""

    __getattr__ = dict.get


def _ref_cfg(**over):
    base = dict(
        drop_path_rate=0.0, block_type="block", dropout_tokens_hcs="none",
        temperature=0.11111, proxy_loss_lambda=1e-3, ortho_loss_v1_lambda=1e-3,
        orthogonal_channel_emb_init=False, freeze_channel_emb=False,
        hcs_sampling="none", gamma_s=1.0, gamma_d=4.0, reverse_pos_pairs=False,
        use_square=False, img_size=[IMG],
    )
    base.update(over)
    return _Cfg(base)


def _build_ref_trunk(ref_dichavit, mapper, cfg):
    torch.manual_seed(0)
    return ref_dichavit.ChannelVisionTransformer(
        config=cfg, img_size=[IMG], patch_size=PATCH, in_chans=C_TOTAL,
        mapper=mapper, embed_dim=DIM, depth=DEPTH, num_heads=HEADS,
        qkv_bias=True, enable_sample=False, use_channelvit_channels=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    )


def _transplant_backbone(trunk):
    """Reference DiChaViT trunk state_dict -> our backbone param tree."""
    sd = {k: v.detach().numpy().copy() for k, v in trunk.state_dict().items()}
    p = sd["patch_embed.proj.weight"]  # (D, 1, 1, p, p)
    params = {
        "proj_kernel": p.reshape(DIM, -1).T,
        "proj_bias": sd["patch_embed.proj.bias"],
        "channel_embed": sd["patch_embed.channel_embed.weight"],
        "channel_emb_proxies": sd["patch_embed.channel_emb_proxies"],
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    for i in range(DEPTH):
        r = f"blocks.{i}."
        w_qkv, b_qkv = sd[r + "attn.qkv.weight"], sd[r + "attn.qkv.bias"]
        params[f"block_{i}"] = {
            "norm1": {"scale": sd[r + "norm1.weight"], "bias": sd[r + "norm1.bias"]},
            "norm2": {"scale": sd[r + "norm2.weight"], "bias": sd[r + "norm2.bias"]},
            "attn": {
                "wq": {"kernel": w_qkv[:DIM].T, "bias": b_qkv[:DIM]},
                "wk": {"kernel": w_qkv[DIM:2 * DIM].T, "bias": b_qkv[DIM:2 * DIM]},
                "wv": {"kernel": w_qkv[2 * DIM:].T, "bias": b_qkv[2 * DIM:]},
                "proj": {"kernel": sd[r + "attn.proj.weight"].T,
                         "bias": sd[r + "attn.proj.bias"]},
            },
            "mlp": {
                "fc1": {"kernel": sd[r + "mlp.fc1.weight"].T,
                        "bias": sd[r + "mlp.fc1.bias"]},
                "fc2": {"kernel": sd[r + "mlp.fc2.weight"].T,
                        "bias": sd[r + "mlp.fc2.bias"]},
            },
        }
    return params


def _our_model(with_head, **loss_over):
    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier

    kw = dict(proxy_loss_lambda=1e-3, ortho_loss_v1_lambda=1e-3,
              gamma_s=1.0, gamma_d=4.0)
    kw.update(loss_over)
    backbone = ChannelVisionTransformer(
        num_total_channels=C_TOTAL, img_size=IMG, patch_size=PATCH,
        embed_dim=DIM, depth=DEPTH, num_heads=HEADS, attention_impl="xla",
        **kw,
    )
    return ChannelAdaptiveClassifier(
        backbone=backbone, embed_dim=DIM, num_classes=NUM_CLASSES,
        with_head=with_head,
    )


def _ref_wd_table(base, end, total):
    """utils.cosine_scheduler (utils.py:563-573), no warmup."""
    i = np.arange(total)
    return end + 0.5 * (base - end) * (1 + np.cos(np.pi * i / total))


@pytest.fixture()
def exact_gelu(monkeypatch):
    from diverse_channel_vit_tpu.ops import activations

    monkeypatch.setattr(activations, "GELU_EXACT_DEFAULT", True)


def test_trajectory_regular_ce_path(ref_dichavit, exact_gelu):
    """30 composed optimizer steps on the regular (JUMP-CP-style) path:
    CE + CDL/TDL, AdamW (eps 1e-6), warmup+cosine lr, cosine wd 0.04->0.4
    with the reference's write-after-step lag, clip_grad_norm 1.0, forced
    channel subsets cycling through 4 draws. Loss curves must agree.
    Matches /root/reference/trainer.py:963-1028 + optimizers.py:9-27."""
    import jax
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.schedules import make_lr_schedule
    from diverse_channel_vit_tpu.training.steps import make_train_step

    n_steps = 30
    subsets = [[0, 1, 2, 3], [2, 0, 3], [1, 3], [0, 2, 1]]
    mapper = {"train": list(range(C_TOTAL))}
    mapper.update({f"s{i}": s for i, s in enumerate(subsets)})
    extra_lambda = 1.0
    base_lr, clip = 4e-4, 1.0
    wd0, wd_end = 0.04, 0.4

    cfg = _ref_cfg()
    trunk = _build_ref_trunk(ref_dichavit, mapper, cfg)
    torch.manual_seed(1)
    head = torch.nn.Linear(DIM, NUM_CLASSES)
    trunk.train(), head.train()

    # ---- shared schedules ------------------------------------------------
    lr_fn = make_lr_schedule(
        "cosine", base_lr,
        dict(t_initial=3, warmup_t=1, warmup_lr_init=1e-5),
        num_epochs=3, steps_per_epoch=10,
    )
    lr_values = [float(lr_fn(t)) for t in range(n_steps)]
    wd_table = _ref_wd_table(wd0, wd_end, n_steps)

    # ---- identical data / draws -----------------------------------------
    rng = np.random.default_rng(11)
    xs = rng.normal(size=(n_steps, BATCH, C_TOTAL, IMG, IMG)).astype(np.float32) * 0.5
    ys = rng.integers(0, NUM_CLASSES, size=(n_steps, BATCH))

    # snapshot the INITIAL weights before the torch loop mutates them
    init_backbone = _transplant_backbone(trunk)
    init_head = {
        "kernel": head.weight.detach().numpy().copy().T,
        "bias": head.bias.detach().numpy().copy(),
    }

    # ---- torch oracle: the reference update loop verbatim ----------------
    opt = torch.optim.AdamW(
        list(trunk.parameters()) + list(head.parameters()),
        lr=lr_values[0], betas=(0.9, 0.999), eps=1e-6, weight_decay=wd0,
    )
    ce = torch.nn.CrossEntropyLoss()
    ref_losses = []
    for t in range(n_steps):
        s = subsets[t % len(subsets)]
        opt.param_groups[0]["lr"] = lr_values[t]
        opt.zero_grad()
        feats, extra = trunk(torch.from_numpy(xs[t][:, s]), f"s{t % len(subsets)}")
        logits = head(feats)
        loss = ce(logits, torch.from_numpy(ys[t])) + extra_lambda * extra
        loss.backward()
        torch.nn.utils.clip_grad_norm_(
            list(trunk.parameters()) + list(head.parameters()), clip
        )
        opt.step()
        # reference lag: wd_schedule[num_updates-1] written AFTER the step
        opt.param_groups[0]["weight_decay"] = float(wd_table[t])
        ref_losses.append(float(loss))

    # ---- our jitted steps -------------------------------------------------
    model = _our_model(with_head=True)
    tx = make_optimizer(
        "adamw", dict(betas=[0.9, 0.999], eps=1e-6, weight_decay=wd0,
                      weight_decay_end=wd_end),
        lr_schedule=lr_fn, total_steps=n_steps, clip_grad_norm=clip,
    )
    state = create_train_state(
        model, tx, rng=jax.random.key(0),
        sample_input=jnp.zeros((2, C_TOTAL, IMG, IMG), jnp.float32),
        sample_channel_ids=jnp.arange(C_TOTAL),
    )
    params = dict(state.params)
    params["backbone"] = init_backbone
    params["classifier_head"] = init_head
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = state.replace(params=params, opt_state=tx.init(params))

    step_cache = {}
    our_losses = []
    for t in range(n_steps):
        s = subsets[t % len(subsets)]
        step = step_cache.get(tuple(s))
        if step is None:
            step = step_cache[tuple(s)] = make_train_step(
                model, channel_ids=s, k=None, loss_type="ce",
                extra_loss_lambda=extra_lambda, donate=False,
            )
        batch = {"image": jnp.asarray(xs[t][:, s]), "label": jnp.asarray(ys[t])}
        state, metrics = step(state, batch, jax.random.key(t))
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-5)
    # measured max per-step relative drift ~3e-6 over the full curve
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-4)


def test_trajectory_mixed_chunk_proxy_path(ref_dichavit, exact_gelu):
    """15 steps of the CHAMMI-style mixed-chunk loop: per-chunk proxy-loss
    backward accumulation (grad-of-sum) + ONE optimizer update per step,
    constant-wd AdamW + clip. Matches /root/reference/trainer.py:824-931."""
    import jax
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.models.wrappers import model_scale
    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.steps import (
        make_apply_step,
        make_grad_step,
        tree_add,
    )

    n_steps = 15
    chunks = {"A": [0, 1], "B": [2, 3, 1]}
    mapper = {"train": list(range(C_TOTAL))}
    mapper.update(chunks)
    extra_lambda = 1.0
    base_lr, clip, wd0 = 4e-5, 1.0, 0.01
    temperature = 0.07

    cfg = _ref_cfg(temperature=temperature, gamma_s=0.5, gamma_d=2.0,
                   reverse_pos_pairs=True)
    trunk = _build_ref_trunk(ref_dichavit, mapper, cfg)
    torch.manual_seed(2)
    proxies = torch.nn.Parameter(torch.randn(NUM_CLASSES, DIM) / 8)
    trunk.train()
    scale = float(np.sqrt(1.0 / temperature))

    import ref_stubs

    loss_fn = ref_stubs.load("models.loss_fn")

    rng = np.random.default_rng(21)
    xs = {
        ch: rng.normal(size=(n_steps, BATCH, len(ids), IMG, IMG)).astype(np.float32) * 0.5
        for ch, ids in chunks.items()
    }
    ys = {ch: rng.integers(0, NUM_CLASSES, size=(n_steps, BATCH)) for ch in chunks}

    # snapshot the INITIAL weights before the torch loop mutates them
    init_backbone = _transplant_backbone(trunk)
    init_proxies = proxies.detach().numpy().copy()

    all_params = list(trunk.parameters()) + [proxies]
    opt = torch.optim.AdamW(all_params, lr=base_lr, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=wd0)
    ref_losses = []
    for t in range(n_steps):
        opt.zero_grad()
        tot = 0.0
        for ch in chunks:
            feats, extra = trunk(torch.from_numpy(xs[ch][t]), ch)
            loss = loss_fn.proxy_loss(
                proxies, feats, torch.from_numpy(ys[ch][t]), scale
            ) + extra_lambda * extra
            loss.backward()  # per-chunk backward accumulates (trainer.py:918)
            tot += float(loss)
        torch.nn.utils.clip_grad_norm_(all_params, clip)
        opt.step()
        ref_losses.append(tot)

    model = _our_model(with_head=False, temperature=temperature, gamma_s=0.5,
                       gamma_d=2.0, reverse_pos_pairs=True)
    tx = make_optimizer(
        "adamw", dict(betas=[0.9, 0.999], eps=1e-8, weight_decay=wd0),
        lr_schedule=lambda s: jnp.float32(base_lr), total_steps=n_steps,
        clip_grad_norm=clip,
    )
    state = create_train_state(
        model, tx, rng=jax.random.key(0),
        sample_input=jnp.zeros((2, C_TOTAL, IMG, IMG), jnp.float32),
        sample_channel_ids=jnp.arange(C_TOTAL),
    )
    params = dict(state.params)
    params["backbone"] = init_backbone
    params["proxies"] = init_proxies
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = state.replace(params=params, opt_state=tx.init(params))

    gsteps = {
        ch: make_grad_step(model, channel_ids=ids, k=None, loss_type="proxy",
                           extra_loss_lambda=extra_lambda,
                           temperature=temperature)
        for ch, ids in chunks.items()
    }
    apply_step = make_apply_step(donate=False)
    our_losses = []
    for t in range(n_steps):
        grads, tot = None, 0.0
        for ch in chunks:
            batch = {"image": jnp.asarray(xs[ch][t]), "label": jnp.asarray(ys[ch][t])}
            g, metrics = gsteps[ch](state.params, batch, jax.random.key(t))
            grads = g if grads is None else tree_add(grads, g)
            tot += float(metrics["loss"])
        state, _ = apply_step(state, grads)
        our_losses.append(tot)

    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-5)
    # measured max per-step relative drift ~3e-6 over the full curve
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-4)


def test_trajectory_sgd_momentum_path(ref_dichavit, exact_gelu):
    """20 composed steps on the SGD family (``optimizers.py:14-15`` ->
    torch.optim.SGD): momentum buffer + COUPLED L2 weight decay (added to
    the gradient AFTER clipping, unlike AdamW's decoupled decay) + the
    same lr writes and clip. Pins the optax sgd chain's op ordering
    (clip -> add_decayed_weights -> trace -> -lr) against torch."""
    import jax
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.schedules import make_lr_schedule
    from diverse_channel_vit_tpu.training.steps import make_train_step

    n_steps = 20
    subsets = [[0, 1, 2, 3], [3, 1], [2, 0, 1]]
    mapper = {"train": list(range(C_TOTAL))}
    mapper.update({f"s{i}": s for i, s in enumerate(subsets)})
    extra_lambda = 1.0
    base_lr, clip, wd, mom = 0.05, 1.0, 1e-4, 0.9

    cfg = _ref_cfg()
    trunk = _build_ref_trunk(ref_dichavit, mapper, cfg)
    torch.manual_seed(3)
    head = torch.nn.Linear(DIM, NUM_CLASSES)
    trunk.train(), head.train()

    lr_fn = make_lr_schedule(
        "cosine", base_lr,
        dict(t_initial=2, warmup_t=1, warmup_lr_init=1e-3),
        num_epochs=2, steps_per_epoch=10,
    )
    lr_values = [float(lr_fn(t)) for t in range(n_steps)]

    rng = np.random.default_rng(31)
    xs = rng.normal(size=(n_steps, BATCH, C_TOTAL, IMG, IMG)).astype(np.float32) * 0.5
    ys = rng.integers(0, NUM_CLASSES, size=(n_steps, BATCH))

    init_backbone = _transplant_backbone(trunk)
    init_head = {
        "kernel": head.weight.detach().numpy().copy().T,
        "bias": head.bias.detach().numpy().copy(),
    }

    opt = torch.optim.SGD(
        list(trunk.parameters()) + list(head.parameters()),
        lr=lr_values[0], momentum=mom, weight_decay=wd,
    )
    ce = torch.nn.CrossEntropyLoss()
    ref_losses = []
    for t in range(n_steps):
        s = subsets[t % len(subsets)]
        opt.param_groups[0]["lr"] = lr_values[t]
        opt.zero_grad()
        feats, extra = trunk(torch.from_numpy(xs[t][:, s]), f"s{t % len(subsets)}")
        loss = ce(head(feats), torch.from_numpy(ys[t])) + extra_lambda * extra
        loss.backward()
        torch.nn.utils.clip_grad_norm_(
            list(trunk.parameters()) + list(head.parameters()), clip
        )
        opt.step()
        ref_losses.append(float(loss))

    model = _our_model(with_head=True)
    tx = make_optimizer(
        "sgd", dict(momentum=mom, weight_decay=wd),
        lr_schedule=lr_fn, total_steps=n_steps, clip_grad_norm=clip,
    )
    state = create_train_state(
        model, tx, rng=jax.random.key(0),
        sample_input=jnp.zeros((2, C_TOTAL, IMG, IMG), jnp.float32),
        sample_channel_ids=jnp.arange(C_TOTAL),
    )
    params = dict(state.params)
    params["backbone"] = init_backbone
    params["classifier_head"] = init_head
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = state.replace(params=params, opt_state=tx.init(params))

    step_cache = {}
    our_losses = []
    for t in range(n_steps):
        s = subsets[t % len(subsets)]
        step = step_cache.get(tuple(s))
        if step is None:
            step = step_cache[tuple(s)] = make_train_step(
                model, channel_ids=s, k=None, loss_type="ce",
                extra_loss_lambda=extra_lambda, donate=False,
            )
        batch = {"image": jnp.asarray(xs[t][:, s]), "label": jnp.asarray(ys[t])}
        state, metrics = step(state, batch, jax.random.key(t))
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-5)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-4)
