"""SWA/SWAD and MIRO training-mode tests.

Cadence parity targets (reference ``trainer.py``):
- plain SWA: AveragedModel.update_parameters once per epoch past swa_start
  (:810-812); the main per-batch scheduler keeps stepping, so the effective
  lr remains the base schedule.
- SWAD: update per batch past swa_start (:957-959) with the main scheduler
  frozen (:938-940) and SWALR stepping per batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diverse_channel_vit_tpu.config import load_config
from diverse_channel_vit_tpu.trainer import Trainer


def _cfg(tmp_path, extra=()):
    return load_config("synthetic_cfg", [
        "train.num_epochs=3", "train.batch_size=8",
        "dataset.num_train_samples=32", "dataset.num_eval_samples=8",
        "hardware.num_workers=0", "model.attention_impl=xla",
        "optimizer.params.lr=0.001", "scheduler=none",
        "eval.every_n_epochs=10",
        f"train.checkpoints={tmp_path}",
        *extra,
    ])


def test_swa_averages_per_epoch_and_swaps(tmp_path):
    cfg = _cfg(tmp_path, ["train.swa=True", "train.swa_start=1", "train.swa_lr=0.001"])
    t = Trainer(cfg)
    t.train()
    # one average update per epoch past swa_start: epochs 2 and 3
    assert t.swa_n == t.total_epochs - t.swa_start
    # adopted weights are the average, not the last step's weights
    assert t.state.params is t.swa_params


def test_swa_keeps_base_lr_schedule(tmp_path):
    # the reference's per-batch timm scheduler overwrites SWALR's per-epoch
    # write, so plain SWA effectively trains at the base lr throughout
    cfg = _cfg(tmp_path, ["train.swa=True", "train.swa_start=1", "train.swa_lr=0.0123"])
    t = Trainer(cfg)
    big_step = (t.swa_start + 1) * t.updates_per_epoch
    assert np.isclose(float(t.lr_schedule(big_step)), 0.001)
    assert np.isclose(float(t.lr_schedule(0)), 0.001)


def test_swad_updates_per_batch(tmp_path):
    cfg = _cfg(tmp_path, ["train.swad=True", "train.swa_start=1", "train.swa_lr=0.001"])
    t = Trainer(cfg)
    t.train()
    # per-batch updates across epochs 2..3
    assert t.swa_n == (t.total_epochs - t.swa_start) * t.updates_per_epoch


def test_swad_lr_matches_torch_swalr_trace(tmp_path):
    torch = pytest.importorskip("torch")
    cfg = _cfg(tmp_path, ["train.swad=True", "train.swa_start=1", "train.swa_lr=0.0123"])
    t = Trainer(cfg)
    swa_step0 = t.swa_start * t.updates_per_epoch
    base_lr = float(t.lr_schedule(swa_step0 - 1))

    # the reference: main scheduler frozen at base_lr, SWALR steps per batch
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base_lr)
    swalr = torch.optim.swa_utils.SWALR(opt, swa_lr=0.0123)  # defaults: cos, 10
    torch_lrs = []
    for _ in range(15):
        # optimizer.step() uses the lr set by the previous SWALR.step()
        torch_lrs.append(opt.param_groups[0]["lr"])
        swalr.step()

    ours = [float(t.lr_schedule(swa_step0 + i)) for i in range(15)]
    np.testing.assert_allclose(ours, torch_lrs, rtol=1e-5)
    # before the boundary: base schedule
    assert np.isclose(float(t.lr_schedule(0)), base_lr)


def test_miro_regularizer_active(tmp_path):
    from diverse_channel_vit_tpu.training.miro import MIRO_KEY

    cfg = _cfg(tmp_path, ["train.miro=True", "train.miro_ld=0.1", "train.num_epochs=1",
                          "train.debug=True"])
    t = Trainer(cfg)
    assert t.miro_pre_params is not None
    assert MIRO_KEY in t.state.params
    # one VarianceEncoder bias per transformer block (the tap list)
    assert len(t.state.params[MIRO_KEY]) == int(t.model.backbone.depth)
    metrics = t.train_one_epoch(1)
    assert "miro_loss" in metrics
    assert np.isfinite(metrics["miro_loss"])


def test_miro_loss_decomposition_matches_reference_formula(tmp_path):
    """Per-tap vlb equals the reference's
    ``((f - pre_f)^2 / var + log var).mean()/2`` summed over taps
    (reference trainer.py:898-908), computed with a torch oracle."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from diverse_channel_vit_tpu.training.miro import (
        MIRO_KEY,
        forward_with_taps,
        miro_vlb,
    )

    cfg = _cfg(tmp_path, ["train.miro=True", "train.num_epochs=1", "train.debug=True"])
    t = Trainer(cfg)
    params = t.state.params
    model_params = {k: v for k, v in params.items() if k != MIRO_KEY}
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3, 32, 32)), jnp.float32)
    cids = jnp.arange(3)

    _, _, feats = forward_with_taps(t.model, model_params, x, cids, train=False)
    _, _, pre_feats = forward_with_taps(t.model, t.miro_pre_params, x, cids, train=False)
    assert set(feats) == set(params[MIRO_KEY])
    assert len(feats) == int(t.model.backbone.depth)  # one tap per block

    ours = float(miro_vlb(params[MIRO_KEY], feats, pre_feats))

    expected = 0.0
    for name in feats:
        f = torch.from_numpy(np.asarray(feats[name], np.float32))
        pre = torch.from_numpy(np.asarray(pre_feats[name], np.float32))
        b = torch.from_numpy(np.asarray(params[MIRO_KEY][name], np.float32))
        var = F.softplus(b) + 1e-5
        vlb = (f - pre).pow(2).div(var) + var.log()
        expected += float(vlb.mean() / 2.0)
    np.testing.assert_allclose(ours, expected, rtol=1e-4)

    # init: var == 0.1 exactly, as VarianceEncoder(init=0.1)
    b0 = np.asarray(list(params[MIRO_KEY].values())[0])
    np.testing.assert_allclose(
        np.log(1 + np.exp(b0)) + 1e-5, 0.1, rtol=1e-5
    )
