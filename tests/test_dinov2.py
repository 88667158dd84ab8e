"""DINOv2 feature backbone: torch-oracle parity for the zero-egress
re-implementation of the reference's ``dinov2_vits14_reg`` feature
extractor (``morphem/feature_extraction.py:34-44``, :181-183)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from diverse_channel_vit_tpu.models.dinov2 import (
    DinoV2ViT,
    config_from_state_dict,
    interpolate_pos_embed_dinov2,
    load_torch_dinov2_state,
    pad_to_patch_multiple,
    torch_bicubic_1d_aa,
)


@pytest.mark.parametrize("size_in,size_out", [(37, 16), (8, 16), (16, 16), (7, 29)])
def test_aa_bicubic_matches_torch(size_in, size_out):
    """The antialiased bicubic tables must bit-match torch F.interpolate
    (antialias=True) — including the PIL a=-0.5 kernel and the equal-size
    identity shortcut."""
    import torch.nn.functional as F

    sf = (size_out + 0.1) / size_in
    x = np.random.RandomState(0).randn(1, 3, size_in, size_in).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=(sf, sf),
                        mode="bicubic", antialias=True).numpy()
    idx, w = torch_bicubic_1d_aa(size_in, size_out, sf)
    g = jnp.asarray(x.transpose(0, 2, 3, 1))
    rows = jnp.einsum("botsd,ot->bosd", jnp.take(g, idx, axis=1), w)
    out = jnp.einsum("bhotd,ot->bhod", jnp.take(rows, idx, axis=2), w)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)


@pytest.mark.parametrize("g0,offset,antialias", [
    (5, 0.0, True),    # *_reg hub config: size-based + antialias
    (12, 0.0, True),
    (5, 0.1, False),   # plain hub config: +0.1 scale, no antialias
    (12, 0.1, False),
])
def test_pos_interp_matches_hub_formula(g0, offset, antialias):
    """interpolate_pos_embed_dinov2 vs a torch transcription of the hub's
    interpolate_pos_encoding (dinov2 vision_transformer.py) for both hub
    configurations."""
    import torch.nn.functional as F

    side, dim = 7, 6
    rng = np.random.RandomState(1)
    pos = rng.randn(1, 1 + side * side, dim).astype(np.float32)

    patch = torch.from_numpy(pos[:, 1:]).reshape(1, side, side, dim).permute(0, 3, 1, 2)
    kwargs = {"scale_factor": ((g0 + offset) / side,) * 2} if offset else {"size": (g0, g0)}
    ref_patch = F.interpolate(patch, mode="bicubic", antialias=antialias,
                              align_corners=False, **kwargs)
    ref = np.concatenate(
        [pos[:, :1], ref_patch.permute(0, 2, 3, 1).reshape(1, -1, dim).numpy()], axis=1)

    got = interpolate_pos_embed_dinov2(
        jnp.asarray(pos), g0, g0, offset=offset, antialias=antialias)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def _tiny_hf_model(num_registers=2):
    transformers = pytest.importorskip("transformers")
    Dinov2WithRegistersConfig = transformers.Dinov2WithRegistersConfig
    Dinov2WithRegistersModel = transformers.Dinov2WithRegistersModel

    cfg = Dinov2WithRegistersConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, patch_size=14, image_size=28,
        num_register_tokens=num_registers, layerscale_value=0.5,
    )
    torch.manual_seed(0)
    m = Dinov2WithRegistersModel(cfg).eval()
    # randomize the layerscale/pos params that init to constants
    with torch.no_grad():
        for n, p in m.named_parameters():
            if "lambda1" in n or "position_embeddings" in n:
                p.add_(torch.randn_like(p) * 0.3)
    return m


def test_dinov2_forward_matches_transformers():
    """Full-model parity: converted flax DinoV2ViT == HF
    Dinov2WithRegistersModel (the torch oracle for the hub architecture)
    at the native grid, cls + register + patch tokens."""
    m = _tiny_hf_model()
    sd = m.state_dict()
    cfg = config_from_state_dict(sd, num_heads=2)
    # NB: HF Dinov2 sizes its MLP from ``mlp_ratio`` (4), not intermediate_size
    assert cfg == dict(embed_dim=32, depth=2, num_heads=2, patch_size=14,
                       num_registers=2, mlp_ratio=4.0, pos_grid=2)

    model = DinoV2ViT(**cfg)
    x = np.random.RandomState(2).randn(3, 3, 28, 28).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))["params"]
    params = load_torch_dinov2_state(params, sd)
    out = model.apply({"params": params}, jnp.asarray(x))

    with torch.no_grad():
        ref = m(torch.from_numpy(x)).last_hidden_state.numpy()

    np.testing.assert_allclose(np.asarray(out["x_norm_clstoken"]), ref[:, 0],
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["x_norm_regtokens"]), ref[:, 1:3],
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["x_norm_patchtokens"]), ref[:, 3:],
                               atol=2e-5)


def test_hub_layout_state_dict_loads_identically():
    """The converter accepts the facebook hub key layout (cls_token /
    blocks.N.attn.qkv / ls1.gamma) and produces the same parameters as the
    HF layout."""
    m = _tiny_hf_model()
    sd_hf = m.state_dict()
    from diverse_channel_vit_tpu.models.dinov2 import _canon_hub_layout

    sd_hub = _canon_hub_layout({k: v.numpy() for k, v in sd_hf.items()})
    assert "cls_token" in sd_hub and "blocks.1.attn.qkv.weight" in sd_hub

    cfg = config_from_state_dict(sd_hub, num_heads=2)
    model = DinoV2ViT(**cfg)
    x = jnp.zeros((1, 3, 28, 28))
    params = model.init(jax.random.key(0), x)["params"]
    a = load_torch_dinov2_state(params, sd_hf)
    b = load_torch_dinov2_state(params, sd_hub)
    jax.tree_util.tree_map(
        lambda u, v: np.testing.assert_array_equal(np.asarray(u), np.asarray(v)), a, b)


def test_pad_to_patch_multiple_matches_reference():
    """pad_to_patch_multiple == the reference's create_pad
    (morphem/feature_extraction.py:94-119): odd pads put the extra pixel on
    the right/bottom."""
    import torch.nn.functional as F

    for (h, w, p) in [(30, 45, 14), (28, 28, 14), (10, 11, 7), (224, 224, 14)]:
        x = np.random.RandomState(0).randn(2, 3, h, w).astype(np.float32)
        new_w = ((w + p - 1) // p) * p
        pad_w = new_w - w
        pl = pr = pad_w // 2
        if pad_w % 2:
            pr += 1
        new_h = ((h + p - 1) // p) * p
        pad_h = new_h - h
        pt = pb = pad_h // 2
        if pad_h % 2:
            pb += 1
        ref = F.pad(torch.from_numpy(x), (pl, pr, pt, pb)).numpy()
        np.testing.assert_array_equal(pad_to_patch_multiple(x, p), ref)


def test_dinov2_jax_backbone_end_to_end(tmp_path):
    """jax_dinov2_backbone: load a tiny HF-layout checkpoint from disk, pad
    a non-multiple input, return finite deterministic cls features."""
    from diverse_channel_vit_tpu.evaluation.feature_extraction import (
        jax_dinov2_backbone,
    )

    m = _tiny_hf_model()
    path = tmp_path / "dinov2.pth"
    torch.save(m.state_dict(), path)

    run, dim = jax_dinov2_backbone(str(path), num_heads=2)
    assert dim == 32
    x = np.random.RandomState(3).randn(2, 3, 30, 30).astype(np.float32)
    feats = run(x)  # pads 30 -> 42 (3x3 grid), interpolates the 2x2 pos grid
    assert feats.shape == (2, 32)
    assert np.all(np.isfinite(feats))
    np.testing.assert_array_equal(feats, run(x))

    # padded-to-multiple input must equal torch on the same padded input
    xp = pad_to_patch_multiple(x, 14)
    with torch.no_grad():
        ref = m(torch.from_numpy(xp), interpolate_pos_encoding=True)
    # HF interpolates size-based + antialias == our *_reg default
    np.testing.assert_allclose(run(x), ref.last_hidden_state[:, 0].numpy(), atol=2e-5)


def test_feature_extraction_to_benchmark(tmp_path):
    """The reference's full pretrained-feature workflow, composed: CHAMMI
    fixture images -> dinov2_jax channel-replicated features -> MorphEm
    evaluate() (morphem/feature_extraction.py + evaluation.py roles).
    Features must be row-aligned with the chunk's enriched_meta."""
    import pandas as pd

    from scripts.make_chammi_fixture import main as make_fixture
    from diverse_channel_vit_tpu.evaluation.benchmark import evaluate
    from diverse_channel_vit_tpu.evaluation.feature_extraction import (
        get_save_features,
    )

    root = tmp_path / "data"
    make_fixture(str(root), 16)

    m = _tiny_hf_model()
    ckpt = tmp_path / "dinov2.pth"
    torch.save(m.state_dict(), ckpt)

    path = get_save_features(
        str(root), "morphem70k_v2.csv", "Allen", str(tmp_path / "feat"),
        model="dinov2_jax", weights=str(ckpt), img_size=28, batch_size=8,
        heads=2,
    )
    feats = np.load(path)
    meta = pd.read_csv(root / "Allen" / "enriched_meta.csv")
    assert feats.shape == (len(meta), 32 * 3)  # dim x 3 replicated channels
    assert np.isfinite(feats).all()

    res = evaluate(path, str(root / "Allen" / "enriched_meta.csv"),
                   None, None, "knn", True, "cosine")
    assert res["tasks"] == ["Task_one", "Task_two"]
    assert all(0.0 <= a <= 1.0 for a in res["accuracies"])
