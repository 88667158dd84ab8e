"""SavedModel export (models/export_tf.py): the exported TF graph must
reproduce the JAX eval forward — including channel-subset requests, where
the ids are runtime data — and be loadable standalone via tf.saved_model.
"""

import numpy as np
import jax
import jax.numpy as jnp
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
    tf = pytest.importorskip("tensorflow")
    from diverse_channel_vit_tpu.models.export_tf import save_tf_serving_model

    model = _build()
    x0 = jnp.zeros((2, C, IMG, IMG), jnp.float32)
    params = jax.jit(
        lambda r: model.init({"params": r}, x0, jnp.arange(C), train=False)["params"]
    )(jax.random.key(0))
    path = str(tmp_path_factory.mktemp("sm") / "model")
    save_tf_serving_model(
        model, params, path, channel_ids=range(C), img_shape=(IMG, IMG),
        buckets=(1, 4), compute_dtype=jnp.float32,  # fp32 for exact parity on CPU
    )
    loaded = tf.saved_model.load(path)
    return loaded, model, params


def test_savedmodel_matches_jax_forward(exported):
    loaded, model, params = exported
    assert set(loaded.signatures.keys()) == {"serve_b1", "serve_b4"}
    imgs = np.random.default_rng(0).normal(size=(4, C, IMG, IMG)).astype(np.float32)
    got = loaded.signatures["serve_b4"](
        images=np.asarray(imgs), channel_ids=np.arange(C, dtype=np.int32)
    )["output"].numpy()
    want, _ = model.apply({"params": params}, jnp.asarray(imgs),
                          jnp.arange(C), train=False)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-5)
    assert got.shape == (4, 5)


def test_savedmodel_channel_subset_is_runtime_data(exported):
    """A k=C-length signature with DIFFERENT ids: ids are data, not baked."""
    loaded, model, params = exported
    tf = pytest.importorskip("tensorflow")
    from diverse_channel_vit_tpu.models.export_tf import save_tf_serving_model
    import tempfile, os

    # re-export a 2-channel signature and query two different id pairs
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m2")
        save_tf_serving_model(
            model, params, path, channel_ids=[0, 1], img_shape=(IMG, IMG),
            buckets=(1,), compute_dtype=jnp.float32,
        )
        loaded2 = tf.saved_model.load(path)
        img = np.random.default_rng(1).normal(size=(1, 2, IMG, IMG)).astype(np.float32)
        for cids in ([1, 3], [0, 2]):
            got = loaded2.signatures["serve_b1"](
                images=img, channel_ids=np.asarray(cids, np.int32)
            )["output"].numpy()
            want, _ = model.apply({"params": params}, jnp.asarray(img),
                                  jnp.asarray(cids), train=False)
            np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-5)
