"""Flax ResNet-18/34 (models/resnet.py): torchvision-layout parity + the
``hcs_sampling=lowest_cosine_prob_resnet34`` DCS wiring (dichavit.py:162-167).

torchvision is absent in this env, so the oracle is a faithful torch
BasicBlock ResNet with torchvision's exact state_dict naming (conv1/bn1/
layerN.M.{conv,bn}{1,2}/downsample.{0,1}) — randomized weights AND running
stats so the frozen-BN folding is actually exercised.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn
import torch.nn.functional as F

from diverse_channel_vit_tpu.models.resnet import (
    RESNET18_LAYERS,
    RESNET34_LAYERS,
    ResNetFeatures,
    load_torch_resnet_state,
    per_channel_features,
)


class _TBasic(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = (
            nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                          nn.BatchNorm2d(cout))
            if (stride != 1 or cin != cout) else None
        )

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        sc = x if self.downsample is None else self.downsample(x)
        return F.relu(sc + y)


class _TResNet(nn.Module):
    def __init__(self, layers):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        dims = (64, 128, 256, 512)
        cin = 64
        for li, (n, d) in enumerate(zip(layers, dims)):
            blocks = []
            for bi in range(n):
                stride = 2 if (li > 0 and bi == 0) else 1
                blocks.append(_TBasic(cin, d, stride))
                cin = d
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.max_pool2d(x, 3, 2, 1)
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        return F.adaptive_avg_pool2d(x, 1).flatten(1)


def _randomize_bn_stats(model, gen):
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.num_features, generator=gen) * 0.2)
                m.running_var.copy_(torch.rand(m.num_features, generator=gen) + 0.5)
                m.weight.copy_(torch.randn(m.num_features, generator=gen) * 0.2 + 1)
                m.bias.copy_(torch.randn(m.num_features, generator=gen) * 0.2)


@pytest.mark.parametrize("layers", [RESNET18_LAYERS, RESNET34_LAYERS])
def test_resnet_matches_torch_replica(layers):
    import jax
    import jax.numpy as jnp

    gen = torch.Generator().manual_seed(0)
    torch.manual_seed(0)
    ref = _TResNet(layers).eval()
    _randomize_bn_stats(ref, gen)

    net = ResNetFeatures(layers=layers)
    params = jax.jit(
        lambda r: net.init(r, jnp.zeros((1, 3, 32, 32), jnp.float32))["params"]
    )(jax.random.key(0))
    params = load_torch_resnet_state(
        params, {k: v for k, v in ref.state_dict().items()})

    x = np.random.default_rng(3).normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(net.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_per_channel_features_matches_reference_loop():
    """per_channel_features folds channels into the batch; must equal the
    reference's per-channel python loop (dichavit.py:100-111)."""
    import jax
    import jax.numpy as jnp

    net = ResNetFeatures(layers=(1, 1, 1, 1))
    params = jax.jit(
        lambda r: net.init(r, jnp.zeros((1, 3, 16, 16), jnp.float32))["params"]
    )(jax.random.key(1))
    apply = lambda im: net.apply({"params": params}, im)

    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 3, 32, 32)),
                    jnp.float32)
    got = per_channel_features(apply, x)  # (2, 3, 512)
    for ci in range(3):
        one = jnp.broadcast_to(x[:, ci:ci + 1], (2, 3, 32, 32))
        np.testing.assert_allclose(np.asarray(got[:, ci]),
                                   np.asarray(apply(one)), atol=1e-5, rtol=1e-5)


def test_select_channels_resnet34_scoring():
    """The *_resnet34 path scores by backbone-feature cosine, not by
    channel embeddings; without a feature_fn it fails loud."""
    import jax
    import jax.numpy as jnp

    from diverse_channel_vit_tpu.training.steps import _select_channels

    params = {"backbone": {"channel_embed": jnp.zeros((4, 8), jnp.float32)}}
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 4, 8, 8)),
                    jnp.float32)
    cids = jnp.arange(4)

    def feature_fn(x):  # per-channel summary stats as stand-in features
        return jnp.stack([x.mean(axis=(2, 3)), x.std(axis=(2, 3))], axis=-1)

    xs, cs, override = _select_channels(
        params, x, cids, jax.random.key(0), k=2,
        method="lowest_cosine_prob_resnet34", temp=0.1, feature_fn=feature_fn)
    assert xs.shape == (2, 2, 8, 8) and cs.shape == (2,) and override is None
    assert len(set(np.asarray(cs).tolist())) == 2  # without replacement

    with pytest.raises(ValueError, match="resnet34"):
        _select_channels(params, x, cids, jax.random.key(0), k=2,
                         method="lowest_cosine_prob_resnet34", temp=0.1)


def test_trainer_resnet34_hcs_end_to_end(tmp_path):
    """`++model.hcs_sampling=lowest_cosine_prob_resnet34` through the config
    surface: a local torchvision-layout resnet34 checkpoint loads into the
    scorer and an epoch trains."""
    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.trainer import Trainer

    torch.manual_seed(2)
    gen = torch.Generator().manual_seed(2)
    ref = _TResNet(RESNET34_LAYERS).eval()
    _randomize_bn_stats(ref, gen)
    ckpt = tmp_path / "resnet34.pth"
    torch.save(ref.state_dict(), ckpt)

    cfg = load_config(
        "synthetic_cfg",
        [
            "train.num_epochs=1",
            "train.batch_size=8",
            "dataset.num_train_samples=16",
            "dataset.num_eval_samples=8",
            f"train.checkpoints={tmp_path}/ckpt",
            "hardware.num_workers=0",
            "hardware.mesh.data=1",
            "model.attention_impl=xla",
            "model.enable_sample=True",
            "++model.hcs_sampling=lowest_cosine_prob_resnet34",
            f"++model.resnet34_ckpt={ckpt}",
        ],
    )
    t = Trainer(cfg)
    assert t._hcs_feature_fn() is not None
    best = t.train()
    assert np.isfinite(best)
