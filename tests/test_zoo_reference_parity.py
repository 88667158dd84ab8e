"""Golden cross-framework parity for the rest of the ViT zoo.

test_reference_parity.py pins ChannelViT/DiChaViT forward + losses against
the torch reference; this module extends transplant-forward parity to the
other three ViT stems — DepthwiseViT (``models/depthwise_vit.py``),
HyperNetViT (``models/hyper_vit.py``) and TemplateMixingViT
(``models/template_mixing_vit.py``): identical weights + input through both
full forwards, outputs equal to fp32 tolerance.
"""

import os
import sys
import types
from functools import partial
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")


@pytest.fixture(scope="module")
def ref_zoo():
    """Import the reference zoo modules without running models/__init__
    (timm) or config.py's omegaconf import; stubs scoped by ref_stubs."""
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
    """Reference cls/pos/blocks/norm -> our ViTTrunk subtree (trunk.py).
    The reference fuses qkv in one Linear; our Attention keeps wq/wk/wv so
    the lane-packed kernel sees each GEMM's natural layout — split rows."""
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


def _state_dict(ref_model):
    return {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}


def _to_jax(tree):
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, tree)


C, IMG, P, D, DEPTH, HEADS = 4, 32, 8, 64, 2, 2
MAPPER = {"train": [0, 1, 2, 3]}


def _input():
    rng = np.random.default_rng(7)
    return rng.normal(size=(2, C, IMG, IMG)).astype(np.float32)


def test_depthwise_vit_forward_matches_reference(ref_zoo, exact_gelu):
    """Gathered-bank einsum stem ≡ the reference's grouped conv + pooling
    (``depthwise_vit.py:113-176``)."""
    ref_dv, _, _, _ = ref_zoo
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.models.depthwise_vit import DepthwiseViT

    torch.manual_seed(0)
    ref = ref_dv.DepthwiseViT(
        img_size=[IMG], patch_size=P, in_chans=C, mapper=MAPPER,
        embed_dim=D, depth=DEPTH, num_heads=HEADS, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
        pooling_channel_type="channel_weights",
    ).eval()
    sd = _state_dict(ref)

    ours = DepthwiseViT(num_total_channels=C, img_size=IMG, patch_size=P,
                        embed_dim=D, depth=DEPTH, num_heads=HEADS,
                        attention_impl="xla")
    params = _to_jax({
        # (C*D, 1, p, p) grouped-conv bank -> (C, p*p, D) einsum bank,
        # out-channel c*D+d is channel c's d-th kernel
        "depthwise_bank": sd["patch_embed.conv1depth_params"]
        .reshape(C, D, P * P).transpose(0, 2, 1),
        "channel_embed": sd["patch_embed.channel_embed.weight"],
        "channel_weights": sd["patch_embed.channel_weights"],
        "trunk": _trunk_params(sd, DEPTH),
    })

    x = _input()
    with torch.no_grad():
        want = ref(torch.from_numpy(x), "train").numpy()
    got, _ = ours.apply({"params": params}, jnp.asarray(x), jnp.arange(C),
                        train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_hypernet_vit_forward_matches_reference(ref_zoo, exact_gelu):
    """Hypernet-generated stem kernels ≡ reference (``hyper_vit.py:235-238``):
    same z-emb + W/b/W_out/b_out tensors produce the same conv, applied as
    an im2col einsum + dense 1x1 here."""
    _, ref_hv, _, _ = ref_zoo
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.models.hyper_vit import HyperNetViT

    z_dim = hid = 16
    torch.manual_seed(1)
    ref = ref_hv.HyperNetViT(
        img_size=[IMG], patch_size=P, in_chans=C, mapper=MAPPER,
        embed_dim=D, depth=DEPTH, num_heads=HEADS, qkv_bias=True,
        z_dim=z_dim, hidden_dim=hid, use_conv1x1=False,
    ).eval()
    sd = _state_dict(ref)

    ours = HyperNetViT(num_total_channels=C, img_size=IMG, patch_size=P,
                       embed_dim=D, depth=DEPTH, num_heads=HEADS,
                       z_dim=z_dim, hidden_dim=hid, attention_impl="xla")
    params = _to_jax({
        "conv1_emb": sd["conv1_emb.weight"],
        "hypernet": {
            "W": sd["hypernet.W"], "b": sd["hypernet.b"],
            "W_out": sd["hypernet.W_out"], "b_out": sd["hypernet.b_out"],
        },
        "conv1x1": {"kernel": sd["conv1x1.weight"][:, :, 0, 0].T,
                    "bias": sd["conv1x1.bias"]},
        "trunk": _trunk_params(sd, DEPTH),
    })

    x = _input()
    with torch.no_grad():
        want = ref(torch.from_numpy(x), "train").numpy()
    got, _ = ours.apply({"params": params}, jnp.asarray(x), jnp.arange(C),
                        train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_template_mixing_vit_forward_matches_reference(ref_zoo, exact_gelu):
    """Template-mixed 3x3 stem ≡ reference (``template_mixing_vit.py:335-372``)."""
    _, _, ref_tm, _ = ref_zoo
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.models.template_mixing_vit import TemplateMixingViT

    n_templates = 16
    cfg = SimpleNamespace(
        enable_sample=False, in_channel_names=["a", "b", "c", "d"],
        num_templates_per_channel=n_templates // C, num_classes=5,
        pooling="avg", temperature=0.1, learnable_temp=False,
    )
    torch.manual_seed(2)
    # mapper with an "Allen" chunk => no classifier head; forward returns
    # the normed CLS feature (template_mixing_vit.py:287-289, :394-396)
    ref = ref_tm.TemplateMixingViT(
        config=cfg, img_size=[IMG], patch_size=P, in_chans=C,
        embed_dim=D, depth=DEPTH, num_heads=HEADS, qkv_bias=True,
        mapper={"Allen": [0, 1, 2, 3]},
    ).eval()
    sd = _state_dict(ref)

    ours = TemplateMixingViT(num_total_channels=C, img_size=IMG, patch_size=P,
                             embed_dim=D, depth=DEPTH, num_heads=HEADS,
                             num_templates=n_templates, attention_impl="xla")
    params = _to_jax({
        "conv1_param_bank": sd["conv1_param_bank"],
        "conv1_coefs": sd["conv1_coefs"],
        "conv1x1": {"kernel": sd["conv1x1.weight"][:, :, 0, 0].T,
                    "bias": sd["conv1x1.bias"]},
        "trunk": _trunk_params(sd, DEPTH),
    })

    x = _input()
    with torch.no_grad():
        want = ref(torch.from_numpy(x), "Allen").numpy()
    got, _ = ours.apply({"params": params}, jnp.asarray(x), jnp.arange(C),
                        train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_vit_adapt_forward_matches_reference(ref_zoo, exact_gelu):
    """Plain-ViT Conv2d stem ≡ the sliceable per-channel weight bank
    (``vit_adapt.py:47-69``): summing per-channel projections is exactly
    the multi-channel conv."""
    _, _, _, ref_va = ref_zoo
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.models.vit_adapt import SlicedPatchVisionTransformer

    torch.manual_seed(3)
    ref = ref_va.VisionTransformerModel(
        config=SimpleNamespace(enable_sample=False), mapper=MAPPER,
        img_size=[IMG], patch_size=P, in_chans=C, embed_dim=D, depth=DEPTH,
        num_heads=HEADS, qkv_bias=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()
    sd = _state_dict(ref)

    ours = SlicedPatchVisionTransformer(
        num_total_channels=C, img_size=IMG, patch_size=P, embed_dim=D,
        depth=DEPTH, num_heads=HEADS, attention_impl="xla")
    tr = _trunk_params(sd, DEPTH)
    params = _to_jax({
        **tr,
        # Conv2d (D, C, p, p) -> bank (C, p*p, D)
        "proj_bank": sd["patch_embed.proj.weight"]
        .reshape(D, C, P * P).transpose(1, 2, 0),
        "proj_bias": sd["patch_embed.proj.bias"],
    })

    x = _input()
    with torch.no_grad():
        want = ref(torch.from_numpy(x), "train").numpy()
    got, _ = ours.apply({"params": params}, jnp.asarray(x), jnp.arange(C),
                        train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)
