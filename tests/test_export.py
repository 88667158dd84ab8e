"""Flax -> torch checkpoint export (models/export.py): the reverse of the
weight-transplant direction the golden parity tests use. Proves a user of
the PyTorch reference can consume weights trained here — exact state_dict
roundtrip on the trunk, and a strict `load_state_dict` + forward-parity
check on the full DiChaViT wrapper (head + proxies + logit_scale)."""

import os
import sys
import types
from functools import partial

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")

C_TOTAL, IMG, PATCH, DIM, DEPTH, HEADS = 3, 32, 16, 64, 2, 2


@pytest.fixture(scope="module")
def ref_dichavit():
    """Reference dichavit module (third-party stubs scoped by ref_stubs)."""
    import ref_stubs

    return ref_stubs.load("models.dichavit")


class _Cfg(dict):
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


def _build_ref_trunk(ref_dichavit, seed=0):
    torch.manual_seed(seed)
    return ref_dichavit.ChannelVisionTransformer(
        config=_ref_cfg(), img_size=[IMG], patch_size=PATCH, in_chans=C_TOTAL,
        mapper={"train": list(range(C_TOTAL))}, embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, qkv_bias=True, enable_sample=False,
        use_channelvit_channels=True,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
    )


def _transplant_backbone(trunk, dim=DIM, depth=DEPTH):
    sd = {k: v.detach().numpy().copy() for k, v in trunk.state_dict().items()}
    p = sd["patch_embed.proj.weight"]
    params = {
        "proj_kernel": p.reshape(dim, -1).T,
        "proj_bias": sd["patch_embed.proj.bias"],
        "channel_embed": sd["patch_embed.channel_embed.weight"],
        "channel_emb_proxies": sd["patch_embed.channel_emb_proxies"],
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "norm": {"scale": sd["norm.weight"], "bias": sd["norm.bias"]},
    }
    for i in range(depth):
        r = f"blocks.{i}."
        w_qkv, b_qkv = sd[r + "attn.qkv.weight"], sd[r + "attn.qkv.bias"]
        params[f"block_{i}"] = {
            "norm1": {"scale": sd[r + "norm1.weight"], "bias": sd[r + "norm1.bias"]},
            "norm2": {"scale": sd[r + "norm2.weight"], "bias": sd[r + "norm2.bias"]},
            "attn": {
                "wq": {"kernel": w_qkv[:dim].T, "bias": b_qkv[:dim]},
                "wk": {"kernel": w_qkv[dim:2 * dim].T, "bias": b_qkv[dim:2 * dim]},
                "wv": {"kernel": w_qkv[2 * dim:].T, "bias": b_qkv[2 * dim:]},
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


def test_trunk_state_dict_roundtrip(ref_dichavit):
    """transplant(torch) -> export == the original state_dict, exactly."""
    from diverse_channel_vit_tpu.models.export import channelvit_model_params

    trunk = _build_ref_trunk(ref_dichavit)
    ours = _transplant_backbone(trunk)
    exported = channelvit_model_params(ours, prefix="")
    ref_sd = {k: v.detach().numpy() for k, v in trunk.state_dict().items()}
    assert set(exported) == set(ref_sd)
    for k in ref_sd:
        np.testing.assert_array_equal(exported[k], ref_sd[k], err_msg=k)
    # and torch accepts it strictly
    trunk.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in exported.items()},
                          strict=True)


def test_scan_layout_exports_identically(ref_dichavit):
    """The scan_blocks stacked layout de-stacks to the same state_dict."""
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.models.export import channelvit_model_params

    trunk = _build_ref_trunk(ref_dichavit)
    unrolled = _transplant_backbone(trunk)
    import jax

    per_block = [unrolled[f"block_{i}"] for i in range(DEPTH)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *per_block)
    scan_tree = {k: v for k, v in unrolled.items() if not k.startswith("block_")}
    scan_tree["blocks"] = {"block": stacked}
    a = channelvit_model_params(unrolled, prefix="")
    b = channelvit_model_params(scan_tree, prefix="")
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], np.asarray(b[k]), err_msg=k)


def test_full_wrapper_loads_and_matches_reference_forward(ref_dichavit, tmp_path):
    """Init OUR tiny-geometry wrapper, export with
    save_reference_checkpoint, strict-load into the reference DiChaViT
    (head + proxies + logit_scale), and match the eval logits."""
    import jax
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.export import save_reference_checkpoint
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier
    from diverse_channel_vit_tpu.ops import activations

    c, num_classes = 4, 7
    mapper = {"train": list(range(c))}
    cfg = _ref_cfg(
        pretrained_model_name="tiny", in_channel_names=list(range(c)),
        num_classes=num_classes, learnable_temp=True, enable_sample=False,
        use_channelvit_channels=True, patch_size=PATCH,
    )
    ref_model = ref_dichavit.DiChaViT(config=cfg, mapper=mapper).eval()

    backbone = ChannelVisionTransformer(
        num_total_channels=c, img_size=IMG, patch_size=PATCH, embed_dim=192,
        depth=12, num_heads=3, attention_impl="xla",
        proxy_loss_lambda=1e-3, ortho_loss_v1_lambda=1e-3,
    )
    ours = ChannelAdaptiveClassifier(
        backbone=backbone, embed_dim=192, num_classes=num_classes,
        with_head=True, learnable_temp=True,
    )
    x0 = jnp.zeros((1, c, IMG, IMG), jnp.float32)
    params = jax.jit(ours.init, static_argnames=("train",))(
        jax.random.key(3), x0, jnp.arange(c), train=False
    )["params"]

    path = str(tmp_path / "export.pt")
    save_reference_checkpoint(path, params, epoch=5, accuracy=0.5,
                              config={"model": "dichavit"})
    ckpt = torch.load(path, weights_only=False)
    assert ckpt["epoch"] == 5
    ref_model.load_state_dict(ckpt["model_params"], strict=True)

    # forward parity (exact-gelu to match torch's erf GELU)
    orig = activations.GELU_EXACT_DEFAULT
    activations.GELU_EXACT_DEFAULT = True
    try:
        rng = np.random.default_rng(11)
        x = rng.normal(size=(2, c, IMG, IMG)).astype(np.float32)
        out, _ = ours.apply({"params": params}, jnp.asarray(x), jnp.arange(c),
                            train=False)
        with torch.no_grad():
            ref_out = ref_model(torch.from_numpy(x), "train").numpy()
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4, rtol=1e-3)
    finally:
        activations.GELU_EXACT_DEFAULT = orig
