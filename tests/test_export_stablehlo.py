"""AOT jax.export artifacts (models/export_stablehlo.py): the deserialized
StableHLO must reproduce the JAX eval forward — with channel ids as runtime
data — loadable through the jax-only path a serving host would use.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

C, IMG, PATCH = 4, 32, 16


def _build():
    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier

    backbone = ChannelVisionTransformer(
        num_total_channels=C, img_size=IMG, patch_size=PATCH, embed_dim=64,
        depth=2, num_heads=2, attention_impl="xla",
    )
    return ChannelAdaptiveClassifier(backbone=backbone, embed_dim=64,
                                     num_classes=5, with_head=True)


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    from diverse_channel_vit_tpu.models.export_stablehlo import save_stablehlo_model

    model = _build()
    x0 = jnp.zeros((2, C, IMG, IMG), jnp.float32)
    params = jax.jit(
        lambda r: model.init({"params": r}, x0, jnp.arange(C), train=False)["params"]
    )(jax.random.key(0))
    path = str(tmp_path_factory.mktemp("shlo") / "model")
    save_stablehlo_model(
        model, params, path, channel_ids=range(C), img_shape=(IMG, IMG),
        buckets=(1, 4), platforms=("cpu",),  # the test host's backend
        compute_dtype=jnp.float32,
    )
    return path, model, params


def test_stablehlo_matches_jax_forward(exported):
    from diverse_channel_vit_tpu.models.export_stablehlo import load_stablehlo_model

    path, model, params = exported
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["buckets"] == [1, 4]
    assert sorted(os.listdir(path)) == [
        "manifest.json", "serve_b1.jaxexport", "serve_b4.jaxexport"]

    call, m2 = load_stablehlo_model(path, bucket=4)
    assert m2 == manifest
    imgs = np.random.default_rng(0).normal(size=(4, C, IMG, IMG)).astype(np.float32)
    got = np.asarray(call(jnp.asarray(imgs), jnp.arange(C, dtype=jnp.int32)))
    want, _ = model.apply({"params": params}, jnp.asarray(imgs),
                          jnp.arange(C), train=False)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-5)
    assert got.shape == (4, 5)


def test_stablehlo_channel_ids_are_runtime_data(exported):
    """Reversed ids through the SAME artifact must equal the reversed-id
    JAX forward (ids are data, not baked constants)."""
    from diverse_channel_vit_tpu.models.export_stablehlo import load_stablehlo_model

    path, model, params = exported
    call, _ = load_stablehlo_model(path, bucket=1)
    imgs = np.random.default_rng(1).normal(size=(1, C, IMG, IMG)).astype(np.float32)
    rev = jnp.arange(C, dtype=jnp.int32)[::-1]
    got = np.asarray(call(jnp.asarray(imgs), rev))
    want, _ = model.apply({"params": params}, jnp.asarray(imgs), rev,
                          train=False)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-5)
    base, _ = model.apply({"params": params}, jnp.asarray(imgs),
                          jnp.arange(C), train=False)
    assert not np.allclose(np.asarray(want), np.asarray(base))


def test_stablehlo_cli_roundtrip(tmp_path):
    """scripts/export_stablehlo.py from a real checkpoint dir, then the
    jax-only load path."""
    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.trainer import Trainer

    cfg = load_config(
        "synthetic_cfg",
        [
            "train.num_epochs=1",
            "scheduler=none",
            "train.batch_size=16",
            "dataset.num_train_samples=32",
            "dataset.num_eval_samples=16",
            f"train.checkpoints={tmp_path}/ckpt",
            "hardware.num_workers=0",
            "model.attention_impl=xla",
            "++eval.skip_eval_for_debug=True",
            "++train.debug=True",
            "++train.save_model=last",
        ],
    )
    t = Trainer(cfg)
    t.train()
    # debug mode skips saving (reference parity) — save explicitly
    from diverse_channel_vit_tpu.training.checkpoint import save_checkpoint

    save_checkpoint(t.checkpoints, t.state, epoch=1, name="model_last",
                    config=t.cfg.to_dict())

    import sys

    sys.path.insert(0, "scripts")
    from export_stablehlo import main as export_main

    out = str(tmp_path / "shlo")
    export_main([t.checkpoints, out, "--buckets", "2", "--platforms", "cpu",
                 "--fp32"])

    from diverse_channel_vit_tpu.models.export_stablehlo import load_stablehlo_model

    call, manifest = load_stablehlo_model(out)
    assert manifest["buckets"] == [2]
    imgs = np.zeros((2, manifest["num_channels"], *manifest["img_shape"]),
                    np.float32)
    out_arr = np.asarray(call(jnp.asarray(imgs),
                              jnp.arange(manifest["num_channels"],
                                         dtype=jnp.int32)))
    assert out_arr.shape[0] == 2 and np.isfinite(out_arr).all()
