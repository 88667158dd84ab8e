"""Torch -> flax checkpoint import (models/import_torch.py): the inverse of
models/export.py, productizing the transplant direction the golden parity
tests perform by hand. Proves a user of the PyTorch reference can bring
reference-trained weights here: exact export->import roundtrips (both block
layouts), forward parity against the reference DiChaViT through a real
``torch.save`` checkpoint (with its pickled config made unimportable to
exercise the tolerant loader), the trainer's ``model.pretrained`` warm
start, and the ``scripts/import_torch.py`` CLI into a serving bundle."""

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


def _tree_equal(a, b, path=""):
    assert isinstance(a, dict) == isinstance(b, dict), path
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
        for k in a:
            _tree_equal(a[k], b[k], f"{path}/{k}")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=path)


def test_import_inverts_export_trunk(ref_dichavit):
    """state_dict -> import == the hand transplant, and import(export(tree))
    is the identity on a reference-layout trunk."""
    from diverse_channel_vit_tpu.models.export import channelvit_model_params
    from diverse_channel_vit_tpu.models.import_torch import (
        channelvit_params_from_state_dict)

    trunk = _build_ref_trunk(ref_dichavit)
    sd = {k: v.detach().numpy().copy() for k, v in trunk.state_dict().items()}
    ours = channelvit_params_from_state_dict(sd, prefix="")
    # roundtrip through export: identical state_dict back
    exported = channelvit_model_params(ours, prefix="")
    assert set(exported) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(exported[k], sd[k], err_msg=k)
    # and import(export) is the identity on the flax tree
    _tree_equal(channelvit_params_from_state_dict(exported, prefix=""), ours)


def test_import_scan_layout(ref_dichavit):
    """scan_layout=True stacks block leaves on a leading depth axis and
    de-stacks back to the unrolled import."""
    from diverse_channel_vit_tpu.models.import_torch import (
        channelvit_params_from_state_dict)

    trunk = _build_ref_trunk(ref_dichavit)
    sd = {k: v.detach().numpy().copy() for k, v in trunk.state_dict().items()}
    unrolled = channelvit_params_from_state_dict(sd, prefix="")
    stacked = channelvit_params_from_state_dict(sd, prefix="", scan_layout=True)
    assert "blocks" in stacked and "block_0" not in stacked
    for i in range(DEPTH):
        import jax

        per = jax.tree_util.tree_map(lambda l: np.asarray(l)[i],
                                     stacked["blocks"]["block"])
        _tree_equal(per, unrolled[f"block_{i}"], f"block_{i}")


def test_module_prefix_and_bare_backbone(ref_dichavit):
    """DataParallel ``module.`` prefixes strip (trainer.py:1313-1317) and a
    bare backbone state dict imports without the wrapper prefix."""
    from diverse_channel_vit_tpu.models.import_torch import (
        channelvit_params_from_state_dict)

    trunk = _build_ref_trunk(ref_dichavit)
    sd = {k: v.detach().numpy().copy() for k, v in trunk.state_dict().items()}
    wrapped = {"module.feature_extractor." + k: v for k, v in sd.items()}
    _tree_equal(
        channelvit_params_from_state_dict(wrapped),
        channelvit_params_from_state_dict(sd, prefix=""),
    )


def _unimportable_config():
    """An object pickled by reference to a module that won't exist at load
    time — stands in for the reference checkpoint's omegaconf config."""
    mod = types.ModuleType("_ghost_cfg_mod")
    cls = type("GhostConfig", (), {"lr": 4e-4})
    cls.__module__ = "_ghost_cfg_mod"
    mod.GhostConfig = cls
    sys.modules["_ghost_cfg_mod"] = mod
    return cls()


def test_full_reference_checkpoint_forward_parity(ref_dichavit, tmp_path):
    """The reference trainer's own ``torch.save`` dict (trainer.py:1292-1306)
    -> load_reference_checkpoint -> our wrapper forward == the reference
    DiChaViT logits. The pickled config is made unimportable to exercise the
    tolerant loader."""
    import jax
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.import_torch import load_reference_checkpoint
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier
    from diverse_channel_vit_tpu.ops import activations

    c, num_classes = 4, 7
    mapper = {"train": list(range(c))}
    cfg = _ref_cfg(
        pretrained_model_name="tiny", in_channel_names=list(range(c)),
        num_classes=num_classes, learnable_temp=True, enable_sample=False,
        use_channelvit_channels=True, patch_size=PATCH,
    )
    torch.manual_seed(7)
    ref_model = ref_dichavit.DiChaViT(config=cfg, mapper=mapper).eval()

    path = str(tmp_path / "ref_ckpt.pt")
    torch.save(
        {
            "epoch": 42,
            "accuracy": 0.375,
            "config": _unimportable_config(),
            "optimizer_params": None,
            "model_params": ref_model.state_dict(),
            "scheduler_params": None,
            "scaler_params": None,
        },
        path,
    )
    del sys.modules["_ghost_cfg_mod"]

    params, meta = load_reference_checkpoint(path)
    assert meta == {"epoch": 42, "accuracy": 0.375}
    assert set(params) == {"backbone", "proxies", "logit_scale", "classifier_head"}

    backbone = ChannelVisionTransformer(
        num_total_channels=c, img_size=IMG, patch_size=PATCH, embed_dim=192,
        depth=12, num_heads=3, attention_impl="xla",
        proxy_loss_lambda=1e-3, ortho_loss_v1_lambda=1e-3,
    )
    ours = ChannelAdaptiveClassifier(
        backbone=backbone, embed_dim=192, num_classes=num_classes,
        with_head=True, learnable_temp=True,
    )
    # the imported tree must BE a valid param tree for the configured model
    from diverse_channel_vit_tpu.models.import_torch import validate_against_template

    template = jax.eval_shape(
        lambda r, x, cc: ours.init({"params": r, "dropout": r}, x, cc, train=False)["params"],
        jax.random.key(0), jax.ShapeDtypeStruct((1, c, IMG, IMG), jnp.float32),
        jnp.arange(c),
    )
    validate_against_template(template, params)

    orig = activations.GELU_EXACT_DEFAULT
    activations.GELU_EXACT_DEFAULT = True
    try:
        rng = np.random.default_rng(5)
        x = rng.normal(size=(2, c, IMG, IMG)).astype(np.float32)
        out, _ = ours.apply({"params": jax.tree_util.tree_map(np.asarray, params)},
                            jnp.asarray(x), jnp.arange(c), train=False)
        with torch.no_grad():
            ref_out = ref_model(torch.from_numpy(x), "train").numpy()
        np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4, rtol=1e-3)
    finally:
        activations.GELU_EXACT_DEFAULT = orig


def test_merge_into_template_warm_start():
    """Mismatched proxy width keeps fresh init; everything else loads."""
    from diverse_channel_vit_tpu.models.import_torch import merge_into_template

    template = {
        "backbone": {"cls_token": np.zeros((1, 1, 8), np.float32)},
        "proxies": np.zeros((5, 8), np.float32),
    }
    imported = {
        "backbone": {"cls_token": np.ones((1, 1, 8), np.float64)},
        "proxies": np.ones((7, 8), np.float32),  # different class count
    }
    merged, loaded, kept = merge_into_template(template, imported)
    assert loaded == ["backbone/cls_token"] and kept == ["proxies"]
    assert merged["backbone"]["cls_token"].dtype == np.float32
    np.testing.assert_array_equal(merged["backbone"]["cls_token"], 1.0)
    np.testing.assert_array_equal(merged["proxies"], 0.0)


def _export_tiny_checkpoint(tmp_path, cfg, mapper, num_classes):
    """Init OUR model for ``cfg`` and write it as a reference checkpoint —
    the CLI roundtrip source."""
    import jax
    import jax.numpy as jnp

    from diverse_channel_vit_tpu import models as model_zoo
    from diverse_channel_vit_tpu.models.export import save_reference_checkpoint

    model = model_zoo.build_model(cfg.model.name, cfg.model, mapper, num_classes,
                                  dtype=jnp.float32)
    cids = jnp.asarray(mapper[next(iter(mapper))])
    img = int(cfg.dataset.get("img_size", 224))
    x0 = jnp.zeros((1, len(cids), img, img), jnp.float32)
    params = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(9), x0, cids, train=False
    )["params"]
    path = str(tmp_path / "trained_ref.pt")
    save_reference_checkpoint(path, params, epoch=3, accuracy=0.5)
    return path, params


def test_cli_roundtrip_to_serving_bundle(tmp_path):
    """scripts/import_torch.py: reference checkpoint -> checkpoint dir that
    scripts/serve.py's loader consumes; restored params == the source."""
    import jax

    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.trainer import build_mapper

    overrides = [
        "model=dichavit",
        "++model.embed_dim=64", "++model.depth=2", "++model.num_heads=2",
        "++dataset.img_size=32", "++model.img_size=[32]",
        "++model.learnable_temp=True",
    ]
    cfg = load_config("jump_cp_cfg", list(overrides))
    icn = cfg.model.get("in_channel_names")
    if not icn or isinstance(icn, str):
        cfg.model.in_channel_names = cfg.dataset.in_channel_names
    mapper = build_mapper(cfg)
    num_classes = 5
    ckpt_path, src_params = _export_tiny_checkpoint(tmp_path, cfg, mapper, num_classes)

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import import_torch as cli

    out_dir = str(tmp_path / "bundle")
    cli.main([ckpt_path, out_dir, "-cn", "jump_cp_cfg", *overrides])

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from serve import load_serving_bundle

    model, params, cfg2 = load_serving_bundle(out_dir)
    flat_src = {"/".join(str(getattr(k, "key", k)) for k in p): np.asarray(l)
                for p, l in jax.tree_util.tree_flatten_with_path(src_params)[0]}
    flat_out = {"/".join(str(getattr(k, "key", k)) for k in p): np.asarray(l)
                for p, l in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert set(flat_src) == set(flat_out)
    for k in flat_src:
        np.testing.assert_allclose(flat_out[k], flat_src[k], atol=0, rtol=0,
                                   err_msg=k)
    # meta carried the reference bookkeeping through
    import json

    with open(os.path.join(out_dir, "model_last.meta.json")) as f:
        meta = json.load(f)
    assert meta["epoch"] == 3 and meta["accuracy"] == 0.5


def test_trainer_pretrained_warm_start(tmp_path, monkeypatch):
    """``++model.pretrained=<ref.pt>`` warm-starts the Trainer's state from
    a reference checkpoint (backbone loads; a different num_classes keeps
    the fresh proxy table)."""
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.trainer import Trainer, build_mapper

    overrides = [
        "model=dichavit",
        "++model.embed_dim=64", "++model.depth=2", "++model.num_heads=2",
        "++dataset.img_size=32", "++model.img_size=[32]",
        "++train.batch_size=4", "++train.num_epochs=1",
    ]
    cfg0 = load_config("synthetic_cfg", list(overrides))
    icn = cfg0.model.get("in_channel_names")
    if not icn or isinstance(icn, str):
        cfg0.model.in_channel_names = cfg0.dataset.in_channel_names
    mapper = build_mapper(cfg0)
    ckpt_path, src_params = _export_tiny_checkpoint(
        tmp_path, cfg0, mapper, num_classes=3)

    cfg = load_config("synthetic_cfg",
                      list(overrides) + [f"++model.pretrained={ckpt_path}"])
    trainer = Trainer(cfg)
    got = np.asarray(trainer.state.params["backbone"]["cls_token"])
    want = np.asarray(src_params["backbone"]["cls_token"])
    np.testing.assert_array_equal(got, want)
