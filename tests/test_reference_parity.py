"""Golden cross-framework parity tests against /root/reference (torch CPU).

Fixed inputs + transplanted weights through the reference's own modules:
- ``models/loss_fn.py`` proxy loss and TDL (``ortho_proj_loss_fn_v2``)
- ``models/channel_vit.py`` ChannelVisionTransformer forward (xFormers off)
- ``datasets/tps_transform.py`` warp field + warped image
- the DINO +0.1 positional-embedding resample (torch bicubic oracle)

The reference imports timm/torchvision at package level; neither is in the
env, so stub modules satisfy the imports and the reference packages are
registered without executing ``models/__init__`` (which pulls timm).
Everything skips gracefully when torch or the reference tree is absent.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")


@pytest.fixture(scope="module")
def ref_modules():
    """Import reference modules without running models/__init__ (timm)."""
    import ref_stubs

    return ref_stubs.load(
        "models.loss_fn", "models.channel_vit", "datasets.tps_transform"
    )


@pytest.fixture(scope="module")
def ref_model_utils(ref_modules):
    """models/model_utils.py needs config.py, which imports omegaconf (absent
    in env) — ref_stubs scopes the stub."""
    import ref_stubs

    return ref_stubs.load("models.model_utils")


@pytest.mark.parametrize("in_dim", [4, 5, 8])
@pytest.mark.parametrize("mode", ["pretrained_pad_random", "pretrained_pad_avg"])
def test_first_conv_layer_init_matches_reference(ref_model_utils, in_dim, mode):
    """initialize_first_conv_layer vs the reference's
    ``intialize_first_conv_layer`` (model_utils.py:45-91): pretrained columns
    and the hard-coded PAD_AVG channel averages must bit-match; the random
    pad columns keep our kaiming draw (torch RNG differs by construction)."""
    from helper_classes.first_layer_init import FirstLayerInit

    from diverse_channel_vit_tpu.models.convnext import initialize_first_conv_layer

    torch.manual_seed(3)
    conv = torch.nn.Conv2d(3, 8, 4, 4)
    model = types.SimpleNamespace(stem=[conv])
    ref_conv = ref_model_utils.intialize_first_conv_layer(
        model, (8, in_dim, 4, 4), 3, FirstLayerInit(mode), in_dim,
        return_first_layer_only=True,
    )
    ref_w = ref_conv.weight.detach().numpy()  # (8, in_dim, 4, 4)
    # the reference call mutates conv in place; the original pretrained
    # weight survives as the first 3 columns of its output
    pre = ref_w[:, :3]

    rng = np.random.default_rng(7)
    ours0 = rng.normal(size=(4, 4, in_dim, 8)).astype(np.float32)
    import jax.numpy as jnp

    out = np.asarray(initialize_first_conv_layer(jnp.asarray(ours0), pre, mode))
    # deterministic part: pretrained columns bit-match the reference
    np.testing.assert_allclose(out[:, :, :3, :], ref_w[:, :3].transpose(2, 3, 1, 0),
                               atol=0)
    if mode == "pretrained_pad_avg":
        # the averaged pad channels bit-match too (incl. the clamped slices)
        np.testing.assert_allclose(
            out[:, :, 3:, :], ref_w[:, 3:].transpose(2, 3, 1, 0), atol=1e-7
        )
    else:
        # random pad channels keep our original kaiming draw
        np.testing.assert_array_equal(out[:, :, 3:, :], ours0[:, :, 3:, :])


def test_first_conv_layer_reinit_and_dups_semantics():
    """reinit keeps the (already kaiming fan_out) random init; PAD_DUPS
    raises like the reference else-branch; the SliceParam DUPS bank matches
    the einops repeat+truncate (slice_param_convnext.py:99-106)."""
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.models.convnext import (
        initialize_first_conv_layer,
        pad_dups_param_bank,
    )

    rng = np.random.default_rng(8)
    stem = jnp.asarray(rng.normal(size=(4, 4, 5, 8)).astype(np.float32))
    pre = rng.normal(size=(8, 3, 4, 4)).astype(np.float32)
    assert initialize_first_conv_layer(stem, pre, "reinit_as_random") is stem
    with pytest.raises(NotImplementedError):
        initialize_first_conv_layer(stem, pre, "pretrained_pad_dups")

    bank = jnp.zeros((8, 7, 4, 4), jnp.float32)
    out = np.asarray(pad_dups_param_bank(bank, pre))
    # einops repeat "o i h w -> o (i d) h w", d = 7//3+1 = 3, truncate to 7:
    # [c0,c0,c0, c1,c1,c1, c2]
    expect = np.repeat(pre, 3, axis=1)[:, :7]
    np.testing.assert_array_equal(out, expect)


def test_apply_pretrained_convnext_glue():
    """apply_pretrained_convnext routes trunk keys through the converter and
    the stem through initialize_first_conv_layer on a mini tree."""
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.models.convnext import apply_pretrained_convnext

    rng = np.random.default_rng(9)
    params = {
        "backbone": {
            "stem_conv": jnp.asarray(rng.normal(size=(4, 4, 5, 8)).astype(np.float32)),
            "stem_bias": jnp.zeros((8,), jnp.float32),
            "trunk": {
                "stem_norm": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
            },
        },
        "proxies": jnp.zeros((3, 8)),
    }
    sd = {
        "stem.0.weight": torch.randn(8, 3, 4, 4),
        "stem.0.bias": torch.randn(8),
        "stem.1.weight": torch.randn(8),
        "stem.1.bias": torch.randn(8),
    }
    out = apply_pretrained_convnext(
        params, sd, "convnext_base", init_first_layer="pretrained_pad_avg"
    )
    np.testing.assert_allclose(
        np.asarray(out["backbone"]["stem_conv"])[:, :, :3, :],
        sd["stem.0.weight"].numpy().transpose(2, 3, 1, 0), atol=0,
    )
    np.testing.assert_array_equal(np.asarray(out["backbone"]["stem_bias"]),
                                  sd["stem.0.bias"].numpy())
    np.testing.assert_array_equal(np.asarray(out["backbone"]["trunk"]["stem_norm"]["scale"]),
                                  sd["stem.1.weight"].numpy())
    # untouched leaves keep identity
    assert out["proxies"] is params["proxies"]


def test_proxy_loss_matches_reference(ref_modules):
    loss_fn, _, _ = ref_modules
    from diverse_channel_vit_tpu.ops.losses import proxy_loss

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    proxies = rng.normal(size=(7, 16)).astype(np.float32)
    emb = rng.normal(size=(12, 16)).astype(np.float32)
    labels = rng.integers(0, 7, size=(12,))
    scale = 3.0
    ref = float(loss_fn.proxy_loss(
        torch.from_numpy(proxies), torch.from_numpy(emb),
        torch.from_numpy(labels), scale,
    ))
    ours = float(proxy_loss(jnp.asarray(proxies), jnp.asarray(emb),
                            jnp.asarray(labels), scale))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


@pytest.mark.parametrize("reverse_pos_pairs", [False, True])
@pytest.mark.parametrize("use_square", [False, True])
def test_tdl_matches_reference(ref_modules, reverse_pos_pairs, use_square):
    """Our O(N·D) TDL identity vs the reference's dense O(N^2) Gram form."""
    loss_fn, _, _ = ref_modules
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.ops.losses import orthogonal_projection_loss

    rng = np.random.default_rng(1)
    b, c, n, d = 3, 4, 5, 8
    feats = rng.normal(size=(b, c, n, d)).astype(np.float32)
    labels = np.repeat(np.arange(c), n)
    ref = float(loss_fn.ortho_proj_loss_fn_v2(
        torch.from_numpy(feats.reshape(b, c * n, d)),
        torch.from_numpy(labels),
        gamma_s=0.5, gamma_d=2.0,
        reverse_pos_pairs=reverse_pos_pairs, use_square=use_square,
    ))
    ours = float(orthogonal_projection_loss(
        jnp.asarray(feats), gamma_s=0.5, gamma_d=2.0,
        reverse_pos_pairs=reverse_pos_pairs, use_square=use_square,
    ))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)


def _transplant(ref_model, depth):
    """Reference ChannelViT state_dict -> our flax param tree."""
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    p = sd["patch_embed.proj.weight"]  # (D, 1, 1, p, p)
    d_model = p.shape[0]
    params = {
        "proj_kernel": p.reshape(d_model, -1).T,  # (p*p, D), row-major pixels
        "proj_bias": sd["patch_embed.proj.bias"],
        "channel_embed": sd["patch_embed.channel_embed.weight"],
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    for i in range(depth):
        r = f"blocks.{i}."
        # the reference fuses qkv in one Linear; our Attention keeps three
        # projections (wq/wk/wv) so the lane-packed kernel sees each GEMM's
        # natural layout — split the fused weight rows [q | k | v]
        w_qkv = sd[r + "attn.qkv.weight"]  # (3D, D)
        b_qkv = sd[r + "attn.qkv.bias"]
        params[f"block_{i}"] = {
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
                "fc1": {"kernel": sd[r + "mlp.fc1.weight"].T, "bias": sd[r + "mlp.fc1.bias"]},
                "fc2": {"kernel": sd[r + "mlp.fc2.weight"].T, "bias": sd[r + "mlp.fc2.bias"]},
            },
        }
    import jax.numpy as jnp
    import jax

    return jax.tree_util.tree_map(jnp.asarray, params)


@pytest.fixture()
def exact_gelu(monkeypatch):
    """torch nn.GELU is erf-exact; the repo defaults to the tanh approx for
    TPU speed (ops/activations.py) — pin exact for bit-parity tests."""
    from diverse_channel_vit_tpu.ops import activations

    monkeypatch.setattr(activations, "GELU_EXACT_DEFAULT", True)


@pytest.mark.parametrize("img", [32, 48])
def test_channelvit_forward_matches_reference(ref_modules, exact_gelu, img):
    """Transplanted weights + fixed input through both full forwards
    (reference ``channel_vit.py:139-302`` with xFormers off). img=48 also
    exercises the +0.1 bicubic pos-embed resample at a non-native size
    (the model is built at img_size=32)."""
    _, ref_cv, _ = ref_modules
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer

    from functools import partial

    c, depth, d_model, heads, patch = 3, 2, 64, 2, 16
    torch.manual_seed(0)
    ref_model = ref_cv.ChannelVisionTransformer(
        img_size=[32], patch_size=patch, in_chans=c, mapper={"train": [0, 1, 2]},
        embed_dim=d_model, depth=depth, num_heads=heads, qkv_bias=True,
        enable_sample=False,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),  # as the factories
    ).eval()

    ours = ChannelVisionTransformer(
        num_total_channels=c, img_size=32, patch_size=patch, embed_dim=d_model,
        depth=depth, num_heads=heads, attention_impl="xla",
    )
    params = _transplant(ref_model, depth)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, c, img, img)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x), "train").numpy()
    out, _ = ours.apply({"params": params}, jnp.asarray(x), jnp.arange(c), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4, rtol=1e-3)


def test_pos_embed_resample_matches_torch_bicubic():
    """The +0.1-scaled bicubic (a=-0.75, half-pixel) resample bit-matches
    torch F.interpolate — including the C>1 native-size non-identity quirk
    (``dichavit.py:534-541``)."""
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.models.channel_vit import interpolate_pos_embed

    rng = np.random.default_rng(3)
    side, dim = 14, 8
    pe = rng.normal(size=(1, side * side + 1, dim)).astype(np.float32)
    for h0 in (7, 14, 28):
        ours = np.asarray(interpolate_pos_embed(jnp.asarray(pe), h0, h0, num_channels=2))
        grid = torch.from_numpy(pe[0, 1:].reshape(1, side, side, dim)).permute(0, 3, 1, 2)
        t = torch.nn.functional.interpolate(
            grid, scale_factor=((h0 + 0.1) / side, (h0 + 0.1) / side), mode="bicubic"
        ).permute(0, 2, 3, 1).reshape(-1, dim).numpy()
        np.testing.assert_allclose(ours[0, 1:], t, atol=1e-5)
    # C == 1 at the native square grid skips the resample (reference skip)
    same = np.asarray(interpolate_pos_embed(jnp.asarray(pe), side, side, num_channels=1))
    np.testing.assert_array_equal(same, pe)


@pytest.mark.parametrize("strategy", ["avg_2", "avg_3", "replicate", "zero",
                                      "avg_2_not_in_chunk"])
def test_loo_synthesis_matches_reference(ref_modules, exact_gelu, strategy):
    """Leave-one-out novel-channel synthesis at eval (the trainer.py:408
    quirk): the reference's walking-cursor embedding construction
    (``channel_vit.py:89-136``) vs our plan+gather
    (``ops/novel_channels.py``), compared through the FULL forward.
    Channel 2 of the eval chunk is never trained; channel 3 exists only in
    the training chunk (the ``not_in_chunk`` bank)."""
    _, ref_cv, _ = ref_modules
    from functools import partial

    import jax.numpy as jnp

    from helper_classes.first_layer_init import NewChannelLeaveOneOut

    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.ops.novel_channels import (
        synthesis_plan,
        synthesize_rows,
    )

    mapper = {"train": [0, 1, 3], "test": [0, 1, 2]}
    c_total, depth, d_model, heads, patch, img = 4, 2, 64, 2, 16, 32
    torch.manual_seed(4)
    ref_model = ref_cv.ChannelVisionTransformer(
        img_size=[img], patch_size=patch, in_chans=c_total, mapper=mapper,
        embed_dim=d_model, depth=depth, num_heads=heads, qkv_bias=True,
        enable_sample=False,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()

    ours = ChannelVisionTransformer(
        num_total_channels=c_total, img_size=img, patch_size=patch,
        embed_dim=d_model, depth=depth, num_heads=heads, attention_impl="xla",
    )
    params = _transplant(ref_model, depth)

    x = np.random.default_rng(6).normal(size=(2, 3, img, img)).astype(np.float32)
    with torch.no_grad():
        want = ref_model(
            torch.from_numpy(x), "test", training_chunks="train",
            new_channel_init=NewChannelLeaveOneOut(strategy),
        ).numpy()

    plan = synthesis_plan(mapper, "test", "train", strategy)
    override = synthesize_rows(params["channel_embed"], plan)
    got, _ = ours.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(mapper["test"]),
        train=False, channel_embed_override=override,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_tps_warp_matches_reference(ref_modules):
    _, _, ref_tps = ref_modules
    from diverse_channel_vit_tpu.data import tps as our_tps

    rng = np.random.default_rng(4)
    h = w = 40
    img = rng.normal(size=(h, w)).astype(np.float64)
    src = np.array([[0, 0], [0, w], [h, 0], [h, w], [12, 20], [30, 9]], float)
    dst = src + np.concatenate([np.zeros((4, 2)), rng.uniform(-3, 3, (2, 2))])

    wx_ref, wy_ref = ref_tps._make_inverse_warp(src, dst, (0, 0, h - 1, w - 1), 10)
    wx, wy = our_tps._make_inverse_warp(src, dst, (0, 0, h - 1, w - 1), 10)
    np.testing.assert_allclose(wx, wx_ref, atol=1e-8)
    np.testing.assert_allclose(wy, wy_ref, atol=1e-8)

    ref_imgs = ref_tps.warp_images(src, dst, [img], (0, 0, h - 1, w - 1))
    from scipy import ndimage

    ours_img = ndimage.map_coordinates(img, np.stack([wx, wy]), order=1, mode="reflect")
    np.testing.assert_allclose(ours_img, ref_imgs[0], atol=1e-8)


def test_convnext_torch_weight_converter_parity(exact_gelu):
    """load_torch_convnext_state maps a timm-style state_dict correctly:
    the converted flax trunk matches a torch implementation of the same
    ConvNeXt stage (dwconv -> LN -> fc1 -> gelu -> fc2 -> gamma -> residual,
    + downsample) on a fixed input — the zero-egress substitute for testing
    against real timm weights."""
    import jax
    import jax.numpy as jnp
    import torch.nn.functional as F

    from diverse_channel_vit_tpu.models.convnext import (
        ConvNeXtTrunk,
        load_torch_convnext_state,
    )

    torch.manual_seed(1)
    depths, dims = (1, 1), (8, 16)
    # fabricate a timm-convnext-style state dict
    sd = {}
    sd["stem.1.weight"] = torch.randn(8)
    sd["stem.1.bias"] = torch.randn(8)
    for si, (d, dim) in enumerate(zip(depths, dims)):
        if si > 0:
            sd[f"stages.{si}.downsample.0.weight"] = torch.randn(dims[si - 1])
            sd[f"stages.{si}.downsample.0.bias"] = torch.randn(dims[si - 1])
            sd[f"stages.{si}.downsample.1.weight"] = torch.randn(dim, dims[si - 1], 2, 2) * 0.1
            sd[f"stages.{si}.downsample.1.bias"] = torch.randn(dim) * 0.1
        b = f"stages.{si}.blocks.0"
        sd[f"{b}.conv_dw.weight"] = torch.randn(dim, 1, 7, 7) * 0.1
        sd[f"{b}.conv_dw.bias"] = torch.randn(dim) * 0.1
        sd[f"{b}.norm.weight"] = torch.randn(dim)
        sd[f"{b}.norm.bias"] = torch.randn(dim)
        sd[f"{b}.mlp.fc1.weight"] = torch.randn(4 * dim, dim) * 0.1
        sd[f"{b}.mlp.fc1.bias"] = torch.randn(4 * dim) * 0.1
        sd[f"{b}.mlp.fc2.weight"] = torch.randn(dim, 4 * dim) * 0.1
        sd[f"{b}.mlp.fc2.bias"] = torch.randn(dim) * 0.1
        sd[f"{b}.gamma"] = torch.randn(dim) * 0.1

    trunk = ConvNeXtTrunk(depths=depths, dims=dims)
    x = np.random.default_rng(5).normal(size=(2, 12, 12, 8)).astype(np.float32)
    params = trunk.init(jax.random.key(0), jnp.asarray(x), train=False)["params"]
    params = load_torch_convnext_state(params, sd)
    ours = np.asarray(trunk.apply({"params": params}, jnp.asarray(x), train=False))

    # torch reimplementation of the same trunk (timm semantics, NCHW)
    def ln(t, w, b):  # channels-last LN over the C axis of NCHW
        t = t.permute(0, 2, 3, 1)
        t = F.layer_norm(t, (t.shape[-1],), w, b, eps=1e-6)
        return t.permute(0, 3, 1, 2)

    def block(t, p):
        y = F.conv2d(t, sd[p + ".conv_dw.weight"], sd[p + ".conv_dw.bias"],
                     padding=3, groups=t.shape[1])
        y = ln(y, sd[p + ".norm.weight"], sd[p + ".norm.bias"]).permute(0, 2, 3, 1)
        y = F.linear(y, sd[p + ".mlp.fc1.weight"], sd[p + ".mlp.fc1.bias"])
        y = F.gelu(y)
        y = F.linear(y, sd[p + ".mlp.fc2.weight"], sd[p + ".mlp.fc2.bias"])
        y = y * sd[p + ".gamma"]
        return t + y.permute(0, 3, 1, 2)

    with torch.no_grad():
        t = torch.from_numpy(x).permute(0, 3, 1, 2)
        t = ln(t, sd["stem.1.weight"], sd["stem.1.bias"])
        t = block(t, "stages.0.blocks.0")
        t = ln(t, sd["stages.1.downsample.0.weight"], sd["stages.1.downsample.0.bias"])
        t = F.conv2d(t, sd["stages.1.downsample.1.weight"],
                     sd["stages.1.downsample.1.bias"], stride=2)
        t = block(t, "stages.1.blocks.0")
        ref = t.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
