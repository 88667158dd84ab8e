"""Trajectory-level golden parity for the rest of the ViT zoo.

tests/test_trajectory_parity.py pins the composed update loop (AdamW +
schedules + clip + losses) for the ChannelViT/DiChaViT family; this module
extends the same trajectory oracle to the other three stem families, whose
BACKWARD paths run through entirely different TPU-native formulations:

- DepthwiseViT — gathered-bank einsum + channel_weights pooling
  (reference grouped conv, ``/root/reference/models/depthwise_vit.py:113-176``)
- HyperNetViT — hypernet-generated stem kernels
  (``/root/reference/models/hyper_vit.py:235-238``)
- TemplateMixingViT — template-mixed 3x3 stem + 1x1 projection
  (``/root/reference/models/template_mixing_vit.py:335-372``)
- ViTAdapt — sliceable per-channel Conv2d bank (``vit_adapt.py:47-69``)

Each test transplants identical fp32 init into the reference torch model,
drives both frameworks with the same synthetic batches and the same forced
channel subsets for N composed AdamW steps (timm-style lr writes + global
grad clipping, ``/root/reference/trainer.py:963-1028``), and asserts the
per-step loss sequences agree to fp32 tolerance — pinning each stem's
gather/einsum gradients through the full optimizer composition.
"""

import os
from functools import partial
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")

C, IMG, P, D, DEPTH, HEADS = 4, 32, 8, 64, 2, 2
NUM_CLASSES = 5
BATCH = 6
N_STEPS = 12
SUBSETS = [[0, 1, 2, 3], [2, 0], [1, 3, 0]]
MAPPER = {"train": list(range(C))}
MAPPER.update({f"s{i}": s for i, s in enumerate(SUBSETS)})


@pytest.fixture(scope="module")
def ref_zoo():
    import ref_stubs

    return ref_stubs.load(
        "models.depthwise_vit",
        "models.hyper_vit",
        "models.template_mixing_vit",
        "models.vit_adapt",
    )


@pytest.fixture()
def exact_gelu(monkeypatch):
    from diverse_channel_vit_tpu.ops import activations

    monkeypatch.setattr(activations, "GELU_EXACT_DEFAULT", True)


def _trunk_params(sd, depth):
    """Reference cls/pos/blocks/norm -> our ViTTrunk subtree (split fused
    qkv rows into wq/wk/wv — see tests/test_zoo_reference_parity.py)."""
    d_model = sd["cls_token"].shape[-1]
    tr = {
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    for i in range(depth):
        r = f"blocks.{i}."
        w_qkv, b_qkv = sd[r + "attn.qkv.weight"], sd[r + "attn.qkv.bias"]
        tr[f"block_{i}"] = {
            "norm1": {"scale": sd[r + "norm1.weight"], "bias": sd[r + "norm1.bias"]},
            "norm2": {"scale": sd[r + "norm2.weight"], "bias": sd[r + "norm2.bias"]},
            "attn": {
                "wq": {"kernel": w_qkv[:d_model].T, "bias": b_qkv[:d_model]},
                "wk": {"kernel": w_qkv[d_model:2 * d_model].T,
                       "bias": b_qkv[d_model:2 * d_model]},
                "wv": {"kernel": w_qkv[2 * d_model:].T, "bias": b_qkv[2 * d_model:]},
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
    return tr


def _state_dict(m):
    return {k: v.detach().numpy().copy() for k, v in m.state_dict().items()}


def _run_pair(ref_trunk, our_backbone, backbone_params, *, ref_chunk_of,
              subsets=SUBSETS):
    """Drive the reference torch trunk (+ a fresh Linear head) and our
    wrapped model through N_STEPS identical composed AdamW updates
    (lr writes + global clip, trainer.py:963-1028); return both loss curves.

    ``backbone_params`` is the transplanted init for our backbone subtree;
    ``ref_chunk_of(t)`` names the mapper chunk the reference forwards with
    at step t (our side uses ``subsets[t % len(subsets)]`` directly).
    """
    import jax
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier
    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.schedules import make_lr_schedule
    from diverse_channel_vit_tpu.training.steps import make_train_step

    base_lr, clip, wd = 4e-4, 1.0, 0.05
    torch.manual_seed(100)
    head = torch.nn.Linear(D, NUM_CLASSES)
    init_head = {"kernel": head.weight.detach().numpy().copy().T,
                 "bias": head.bias.detach().numpy().copy()}
    ref_trunk.train(), head.train()

    lr_fn = make_lr_schedule(
        "cosine", base_lr,
        dict(t_initial=2, warmup_t=1, warmup_lr_init=1e-5),
        num_epochs=2, steps_per_epoch=6,
    )
    lr_values = [float(lr_fn(t)) for t in range(N_STEPS)]

    rng = np.random.default_rng(17)
    xs = rng.normal(size=(N_STEPS, BATCH, C, IMG, IMG)).astype(np.float32) * 0.5
    ys = rng.integers(0, NUM_CLASSES, size=(N_STEPS, BATCH))

    # ---- torch oracle ------------------------------------------------------
    ref_params = list(ref_trunk.parameters()) + list(head.parameters())
    opt = torch.optim.AdamW(ref_params, lr=lr_values[0], betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=wd)
    ce = torch.nn.CrossEntropyLoss()
    ref_losses = []
    for t in range(N_STEPS):
        s = subsets[t % len(subsets)]
        opt.param_groups[0]["lr"] = lr_values[t]
        opt.zero_grad()
        feats = ref_trunk(torch.from_numpy(xs[t][:, s]), ref_chunk_of(t))
        if isinstance(feats, tuple):
            feats = feats[0]
        loss = ce(head(feats), torch.from_numpy(ys[t]))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref_params, clip)
        opt.step()
        ref_losses.append(float(loss))

    # ---- our jitted steps --------------------------------------------------
    model = ChannelAdaptiveClassifier(
        backbone=our_backbone, embed_dim=D, num_classes=NUM_CLASSES,
        with_head=True,
    )
    tx = make_optimizer(
        "adamw", dict(betas=[0.9, 0.999], eps=1e-8, weight_decay=wd),
        lr_schedule=lr_fn, total_steps=N_STEPS, clip_grad_norm=clip,
    )
    state = create_train_state(
        model, tx, rng=jax.random.key(0),
        sample_input=jnp.zeros((2, C, IMG, IMG), jnp.float32),
        sample_channel_ids=jnp.arange(C),
    )
    params = dict(state.params)
    params["backbone"] = backbone_params
    params["classifier_head"] = init_head
    params = jax.tree_util.tree_map(jnp.asarray, params)
    state = state.replace(params=params, opt_state=tx.init(params))

    step_cache = {}
    our_losses = []
    for t in range(N_STEPS):
        s = subsets[t % len(subsets)]
        step = step_cache.get(tuple(s))
        if step is None:
            step = step_cache[tuple(s)] = make_train_step(
                model, channel_ids=s, k=None, loss_type="ce", donate=False,
            )
        batch = {"image": jnp.asarray(xs[t][:, s]), "label": jnp.asarray(ys[t])}
        state, metrics = step(state, batch, jax.random.key(t))
        our_losses.append(float(metrics["loss"]))

    return our_losses, ref_losses


def _assert_curves(our_losses, ref_losses):
    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-5)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-4)


def test_trajectory_depthwise_vit(ref_zoo, exact_gelu):
    """Gathered-bank einsum + channel_weights pooling gradients composed
    with AdamW: sparse per-channel bank/weight updates under cycling
    subsets must track the reference's grouped-conv backward exactly."""
    ref_dv, _, _, _ = ref_zoo
    from diverse_channel_vit_tpu.models.depthwise_vit import DepthwiseViT

    torch.manual_seed(0)
    ref = ref_dv.DepthwiseViT(
        img_size=[IMG], patch_size=P, in_chans=C, mapper=MAPPER,
        embed_dim=D, depth=DEPTH, num_heads=HEADS, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        pooling_channel_type="channel_weights",
    )
    sd = _state_dict(ref)
    ours = DepthwiseViT(num_total_channels=C, img_size=IMG, patch_size=P,
                        embed_dim=D, depth=DEPTH, num_heads=HEADS,
                        attention_impl="xla")
    backbone_params = {
        "depthwise_bank": sd["patch_embed.conv1depth_params"]
        .reshape(C, D, P * P).transpose(0, 2, 1),
        "channel_embed": sd["patch_embed.channel_embed.weight"],
        "channel_weights": sd["patch_embed.channel_weights"],
        "trunk": _trunk_params(sd, DEPTH),
    }
    _assert_curves(*_run_pair(ref, ours, backbone_params,
                              ref_chunk_of=lambda t: f"s{t % len(SUBSETS)}"))


def test_trajectory_hypernet_vit(ref_zoo, exact_gelu):
    """Hypernet-generated stem: gradients flow through the weight-generating
    MLP (z-emb -> W/b -> per-channel kernels) — the longest indirect grad
    path in the zoo — plus the 1x1 projection."""
    _, ref_hv, _, _ = ref_zoo
    from diverse_channel_vit_tpu.models.hyper_vit import HyperNetViT

    z_dim = hid = 16
    torch.manual_seed(1)
    ref = ref_hv.HyperNetViT(
        img_size=[IMG], patch_size=P, in_chans=C, mapper=MAPPER,
        embed_dim=D, depth=DEPTH, num_heads=HEADS, qkv_bias=True,
        z_dim=z_dim, hidden_dim=hid, use_conv1x1=False,
    )
    sd = _state_dict(ref)
    ours = HyperNetViT(num_total_channels=C, img_size=IMG, patch_size=P,
                       embed_dim=D, depth=DEPTH, num_heads=HEADS,
                       z_dim=z_dim, hidden_dim=hid, attention_impl="xla")
    backbone_params = {
        "conv1_emb": sd["conv1_emb.weight"],
        "hypernet": {
            "W": sd["hypernet.W"], "b": sd["hypernet.b"],
            "W_out": sd["hypernet.W_out"], "b_out": sd["hypernet.b_out"],
        },
        "conv1x1": {"kernel": sd["conv1x1.weight"][:, :, 0, 0].T,
                    "bias": sd["conv1x1.bias"]},
        "trunk": _trunk_params(sd, DEPTH),
    }
    _assert_curves(*_run_pair(ref, ours, backbone_params,
                              ref_chunk_of=lambda t: f"s{t % len(SUBSETS)}"))


def test_trajectory_template_mixing_vit(ref_zoo, exact_gelu):
    """Template-mixed 3x3 stem: conv1_coefs gather + template-bank mixing
    gradients (the reference recombines the bank per forward,
    template_mixing_vit.py:335-372)."""
    _, _, ref_tm, _ = ref_zoo
    from diverse_channel_vit_tpu.models.template_mixing_vit import TemplateMixingViT

    n_templates = 16
    cfg = SimpleNamespace(
        enable_sample=False, in_channel_names=["a", "b", "c", "d"],
        num_templates_per_channel=n_templates // C, num_classes=NUM_CLASSES,
        pooling="avg", temperature=0.1, learnable_temp=False,
    )
    # "Allen" chunk at construction => no internal classifier head; the
    # forward returns the normed CLS feature (template_mixing_vit.py:287-289)
    mapper = dict(MAPPER)
    mapper["Allen"] = list(range(C))
    torch.manual_seed(2)
    ref = ref_tm.TemplateMixingViT(
        config=cfg, img_size=[IMG], patch_size=P, in_chans=C,
        embed_dim=D, depth=DEPTH, num_heads=HEADS, qkv_bias=True,
        mapper=mapper,
    )
    sd = _state_dict(ref)
    ours = TemplateMixingViT(num_total_channels=C, img_size=IMG, patch_size=P,
                             embed_dim=D, depth=DEPTH, num_heads=HEADS,
                             num_templates=n_templates, attention_impl="xla")
    backbone_params = {
        "conv1_param_bank": sd["conv1_param_bank"],
        "conv1_coefs": sd["conv1_coefs"],
        "conv1x1": {"kernel": sd["conv1x1.weight"][:, :, 0, 0].T,
                    "bias": sd["conv1x1.bias"]},
        "trunk": _trunk_params(sd, DEPTH),
    }
    _assert_curves(*_run_pair(ref, ours, backbone_params,
                              ref_chunk_of=lambda t: f"s{t % len(SUBSETS)}"))


def test_trajectory_vit_adapt(ref_zoo, exact_gelu):
    """Per-channel-bank stem: summing per-channel projections must backprop
    exactly like the multi-channel conv (vit_adapt.py:47-69). Full-channel
    steps only — the reference's fixed-width Conv2d stem cannot take channel
    subsets at all (its enable_sample branch would feed a sliced x into the
    full-width conv), so subsetting is untestable against it."""
    _, _, _, ref_va = ref_zoo
    from diverse_channel_vit_tpu.models.vit_adapt import SlicedPatchVisionTransformer

    torch.manual_seed(3)
    ref = ref_va.VisionTransformerModel(
        config=SimpleNamespace(enable_sample=False), mapper=MAPPER,
        img_size=[IMG], patch_size=P, in_chans=C, embed_dim=D, depth=DEPTH,
        num_heads=HEADS, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    )
    sd = _state_dict(ref)
    ours = SlicedPatchVisionTransformer(
        num_total_channels=C, img_size=IMG, patch_size=P, embed_dim=D,
        depth=DEPTH, num_heads=HEADS, attention_impl="xla")
    backbone_params = {
        **_trunk_params(sd, DEPTH),
        "proj_bank": sd["patch_embed.proj.weight"]
        .reshape(D, C, P * P).transpose(1, 2, 0),
        "proj_bias": sd["patch_embed.proj.bias"],
    }
    _assert_curves(*_run_pair(ref, ours, backbone_params,
                              ref_chunk_of=lambda t: "train",
                              subsets=[list(range(C))]))
