"""Serving engine (serving.py): bucketed AOT compile + dynamic batching.

The reference stops at offline feature extraction; the engine adds the
deployment path. These tests pin the serving-path numerics to the plain
forward (padding to a bucket must not change any real row) and the
micro-batcher's request/response plumbing.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diverse_channel_vit_tpu.serving import ServingEngine

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
def engine():
    model = _build()
    x0 = jnp.zeros((2, C, IMG, IMG), jnp.float32)
    params = jax.jit(
        lambda r: model.init({"params": r}, x0, jnp.arange(C), train=False)["params"]
    )(jax.random.key(0))
    # fp32 activations on CPU so the parity check against the plain
    # forward is exact
    return ServingEngine(model, params, buckets=(1, 4, 8), max_wait_ms=20.0,
                         dtype=jnp.float32), model, params


def test_predict_matches_plain_forward(engine):
    eng, model, params = engine
    imgs = np.random.default_rng(1).normal(size=(3, C, IMG, IMG)).astype(np.float32)
    got = eng.predict(imgs, list(range(C)))
    want, _ = model.apply({"params": params}, jnp.asarray(imgs),
                          jnp.arange(C), train=False)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-5)
    assert got.shape == (3, 5)


def test_predict_channel_subset_and_split(engine):
    """k=2 subset request; 10 images split across the 8-bucket + 4-bucket."""
    eng, model, params = engine
    imgs = np.random.default_rng(2).normal(size=(10, 2, IMG, IMG)).astype(np.float32)
    cids = [1, 3]
    got = eng.predict(imgs, cids)
    want, _ = model.apply({"params": params}, jnp.asarray(imgs),
                          jnp.asarray(cids), train=False)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-5)


def test_warmup_compiles_all_buckets(engine):
    eng, _, _ = engine
    eng.warmup(range(C), (IMG, IMG))
    keys = {k[0] for k in eng._compiled if k[1] == tuple(range(C))}
    assert keys == {1, 4, 8}


def test_dynamic_batcher_roundtrip(engine):
    """Each submitted image gets ITS OWN row back, across mixed channel
    subsets in one queue."""
    eng, model, params = engine
    rng = np.random.default_rng(3)
    imgs_full = rng.normal(size=(6, C, IMG, IMG)).astype(np.float32)
    imgs_sub = rng.normal(size=(2, 2, IMG, IMG)).astype(np.float32)
    eng.start()
    try:
        futs = [eng.submit(im, range(C)) for im in imgs_full]
        futs += [eng.submit(im, [0, 2]) for im in imgs_sub]
        rows = [f.result(timeout=120) for f in futs]
    finally:
        eng.stop()
    want_full, _ = model.apply({"params": params}, jnp.asarray(imgs_full),
                               jnp.arange(C), train=False)
    want_sub, _ = model.apply({"params": params}, jnp.asarray(imgs_sub),
                              jnp.asarray([0, 2]), train=False)
    for row, want in zip(rows, list(np.asarray(want_full)) + list(np.asarray(want_sub))):
        np.testing.assert_allclose(row, want, atol=1e-5, rtol=1e-5)
    s = eng.stats.summary()
    assert s["n_images"] == 8 and s["p50_ms"] > 0


def test_dp_mesh_engine_matches_single_device(engine):
    """Multi-chip (data-parallel) serving: batch sharded over the mesh's
    data axis via shard_map, buckets rounded to shard multiples — outputs
    equal the single-device engine row-for-row."""
    from diverse_channel_vit_tpu.parallel import make_mesh

    single, model, params = engine
    mesh = make_mesh({"data": 8})
    eng = ServingEngine(model, params, buckets=(1, 4, 8), dtype=jnp.float32,
                        mesh=mesh)
    assert eng.buckets == [8] and eng.max_batch == 8  # rounded to dp=8

    rng = np.random.default_rng(17)
    imgs = rng.normal(size=(5, C, IMG, IMG)).astype(np.float32)
    want = single.predict(imgs, list(range(C)))
    got = eng.predict(imgs, list(range(C)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # channel subset + a batch above max_batch (splits into two programs)
    imgs2 = rng.normal(size=(11, 2, IMG, IMG)).astype(np.float32)
    want2 = single.predict(imgs2, [1, 3])
    got2 = eng.predict(imgs2, [1, 3])
    np.testing.assert_allclose(got2, want2, atol=1e-5, rtol=1e-5)


def test_http_server_roundtrip(engine):
    """HTTP front (serving_http.py): JSON batch, JSON single-image through
    the micro-batcher, npy body, stats and error paths."""
    import io
    import json
    import urllib.request

    from diverse_channel_vit_tpu.serving_http import ServingHTTPServer

    eng, model, params = engine
    rng = np.random.default_rng(7)
    imgs = rng.normal(size=(3, C, IMG, IMG)).astype(np.float32)
    want, _ = model.apply({"params": params}, jnp.asarray(imgs),
                          jnp.arange(C), train=False)

    with ServingHTTPServer(eng, port=0) as srv:
        base = f"http://127.0.0.1:{srv.port}"

        def post(path, data, headers):
            req = urllib.request.Request(base + path, data=data, headers=headers)
            with urllib.request.urlopen(req, timeout=120) as r:
                return r.headers.get("Content-Type"), r.read()

        # JSON batch -> synchronous bucketed path
        _, body = post("/v1/predict",
                       json.dumps({"channels": list(range(C)),
                                   "images": imgs.tolist()}).encode(),
                       {"Content-Type": "application/json"})
        got = np.asarray(json.loads(body)["outputs"], np.float32)
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-4, rtol=1e-4)

        # JSON single image -> dynamic micro-batcher
        _, body = post("/v1/predict",
                       json.dumps({"channels": list(range(C)),
                                   "images": imgs[0].tolist()}).encode(),
                       {"Content-Type": "application/json"})
        got1 = np.asarray(json.loads(body)["outputs"], np.float32)
        np.testing.assert_allclose(got1, np.asarray(want)[0], atol=1e-4, rtol=1e-4)

        # npy body in, npy body out
        buf = io.BytesIO(); np.save(buf, imgs)
        ctype, body = post("/v1/predict", buf.getvalue(),
                           {"Content-Type": "application/x-npy",
                            "X-Channels": ",".join(str(c) for c in range(C))})
        assert ctype == "application/x-npy"
        got_npy = np.load(io.BytesIO(body))
        np.testing.assert_allclose(got_npy, np.asarray(want), atol=1e-4, rtol=1e-4)

        # stats + health
        with urllib.request.urlopen(base + "/v1/stats", timeout=30) as r:
            s = json.loads(r.read())
        assert s["n_images"] >= 1
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert json.loads(r.read())["status"] == "ok"

        # malformed request -> 400, server survives
        try:
            post("/v1/predict", b"{bad json", {"Content-Type": "application/json"})
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
            assert r.status == 200


def test_stop_fails_stranded_futures(engine):
    """Requests still queued when the engine stops must not hang their
    clients: stop() drains the queue and fails the futures."""
    eng, _, _ = engine
    img = np.zeros((3, IMG, IMG), np.float32)
    fut = eng.submit(img, [0, 1, 2])  # collector never started
    eng.stop()
    with pytest.raises(RuntimeError, match="stopped"):
        fut.result(timeout=5)


def test_engine_scoped_int8_quantization():
    """`quantization="int8"` compiles THIS engine's programs with the AQT
    fused-MLP GEMMs (forward-only int8 serving) without touching the
    process-wide training default. Fused path forced on via the Pallas
    interpreter; geometry chosen so the fused gate admits it with NO padding
    (CPU never pads): 7 channels x 9 patches + CLS = 64 tokens, dim=128,
    dh=64. depth=2 because the LAST block serves through the CLS-readout
    dense branch (cls_only_readout) and bypasses the fused int8 MLP — block
    0 carries the AQT GEMMs."""
    from diverse_channel_vit_tpu.ops import fused_block as fb
    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier

    cq, img = 7, 48
    backbone = ChannelVisionTransformer(
        num_total_channels=cq, img_size=img, patch_size=PATCH, embed_dim=128,
        depth=2, num_heads=2, dtype=jnp.bfloat16,
    )
    model = ChannelAdaptiveClassifier(backbone=backbone, embed_dim=128,
                                      num_classes=5, with_head=True)
    x0 = jnp.zeros((2, cq, img, img), jnp.float32)
    params = jax.jit(
        lambda r: model.init({"params": r}, x0, jnp.arange(cq), train=False)["params"]
    )(jax.random.key(0))
    imgs = np.random.default_rng(7).normal(size=(2, cq, img, img)).astype(np.float32)

    assert fb.QUANTIZATION_DEFAULT == "none"
    fb.FORCE_ON_CPU = True
    try:
        dense = ServingEngine(model, params, buckets=(2,)).predict(
            imgs, list(range(cq)))
        q = ServingEngine(model, params, buckets=(2,), quantization="int8").predict(
            imgs, list(range(cq)))
    finally:
        fb.FORCE_ON_CPU = False
    # engine-scoped: the process default survives both compiles
    assert fb.QUANTIZATION_DEFAULT == "none"
    assert np.any(dense != q)  # int8 GEMMs actually engaged
    # forward-only per-GEMM quantisation error ~1e-2 (test_fused_block bounds)
    np.testing.assert_allclose(q, dense, atol=0.35, rtol=0.35)

    with pytest.raises(ValueError):
        ServingEngine(model, params, quantization="fp4")


def test_serve_cli_boots_from_checkpoint(tmp_path):
    """scripts/serve.py: a checkpoint directory alone (meta.json config +
    orbax tree) boots a ServingEngine whose outputs match the direct model
    forward, served over HTTP. No dataset files touched."""
    import importlib.util
    import json
    import os
    import urllib.request

    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.serving_http import ServingHTTPServer
    from diverse_channel_vit_tpu.trainer import Trainer

    cfg = load_config(
        "synthetic_cfg",
        [
            "train.num_epochs=1", "train.batch_size=16", "scheduler=none",
            "dataset.num_train_samples=32", "dataset.num_eval_samples=16",
            f"train.checkpoints={tmp_path}/ckpt", "hardware.num_workers=0",
            "model.attention_impl=xla",
        ],
    )
    t = Trainer(cfg)
    t.train()

    spec = importlib.util.spec_from_file_location(
        "serve_cli", os.path.join(os.path.dirname(__file__), "..", "scripts", "serve.py")
    )
    serve_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(serve_cli)

    model, params, scfg = serve_cli.load_serving_bundle(str(t.checkpoints))
    assert scfg.model.name == cfg.model.name

    nch = len(cfg.dataset.in_channel_names)
    imgs = np.random.default_rng(3).normal(size=(2, nch, 32, 32)).astype(np.float32)
    want, _ = model.apply(
        {"params": params}, jnp.asarray(imgs), jnp.arange(nch), train=False
    )

    eng = ServingEngine(model, params, buckets=(2,))
    got = eng.predict(imgs, list(range(nch)))
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-2, rtol=2e-2)

    srv = ServingHTTPServer(eng, port=0).start()
    try:
        body = json.dumps(
            {"channels": list(range(nch)), "images": imgs.tolist()}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/predict", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            out = json.loads(r.read())["outputs"]
        np.testing.assert_allclose(np.asarray(out), got, atol=1e-4, rtol=1e-4)
    finally:
        srv.stop()
