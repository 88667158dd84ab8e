"""SWA/SWAD and MIRO training-mode tests."""

import jax
import jax.numpy as jnp
import numpy as np

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


def test_swa_averages_and_swaps(tmp_path):
    cfg = _cfg(tmp_path, ["train.swa=True", "train.swa_start=1", "train.swa_lr=0.001"])
    t = Trainer(cfg)
    t.train()
    assert t.swa_n > 0
    # adopted weights are the average, not the last step's weights
    assert t.state.params is t.swa_params


def test_swa_lr_schedule_switches(tmp_path):
    cfg = _cfg(tmp_path, ["train.swa=True", "train.swa_start=1", "train.swa_lr=0.0123"])
    t = Trainer(cfg)
    big_step = (t.swa_start + 1) * t.updates_per_epoch
    assert np.isclose(float(t.lr_schedule(big_step)), 0.0123)
    assert not np.isclose(float(t.lr_schedule(0)), 0.0123)


def test_miro_regularizer_active(tmp_path):
    cfg = _cfg(tmp_path, ["train.miro=True", "train.miro_ld=0.1", "train.num_epochs=1",
                          "train.debug=True"])
    t = Trainer(cfg)
    assert t.miro_pre_params is not None
    assert "miro_var_b" in t.state.params
    metrics = t.train_one_epoch(1)
    assert "miro_loss" in metrics
    assert np.isfinite(metrics["miro_loss"])
