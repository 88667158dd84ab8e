"""Preemption-safe training: SIGTERM -> checkpoint at a step boundary ->
auto-resume on the next launch of the same (dataset, seed).

The reference has no failure-handling story (SURVEY §5); this is the
TPU-pool answer (spot VMs preempt with SIGTERM + grace window)."""

import os
import signal

import numpy as np
import pytest

from diverse_channel_vit_tpu.config import load_config
from diverse_channel_vit_tpu.trainer import Trainer
from diverse_channel_vit_tpu.training.preemption import PreemptionGuard


def _cfg(tmp_path, extra=()):
    return load_config(
        "synthetic_cfg",
        [
            "train.num_epochs=3",
            "scheduler=none",
            "train.batch_size=16",
            "dataset.num_train_samples=48",
            "dataset.num_eval_samples=32",
            f"train.checkpoints={tmp_path}/ckpt",
            "hardware.num_workers=0",
            "model.attention_impl=xla",
            "++eval.skip_eval_first_epoch=True",
            "++eval.only_eval_first_and_last=True",
            *extra,
        ],
    )


# ---------------------------------------------------------------- guard unit


def test_guard_catches_sigterm_and_restores():
    guard = PreemptionGuard()
    with guard:
        assert not guard.triggered
        os.kill(os.getpid(), signal.SIGTERM)  # would kill us if unhandled
        assert guard.triggered
    # handler restored (default disposition again)
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL


def test_guard_chains_previous_handler():
    seen = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: seen.append(s))
    try:
        with PreemptionGuard() as guard:
            os.kill(os.getpid(), signal.SIGTERM)
            assert guard.triggered
            assert seen == [signal.SIGTERM]
        assert signal.getsignal(signal.SIGTERM).__name__ == "<lambda>"
    finally:
        signal.signal(signal.SIGTERM, prev)


# ------------------------------------------------------------- trainer paths


def test_preempt_at_epoch_boundary_then_auto_resume(tmp_path, monkeypatch):
    cfg = _cfg(tmp_path)
    t1 = Trainer(cfg)

    orig = Trainer.train_one_epoch

    def epoch_then_sigterm(self, epoch, start_batch=0):
        out = orig(self, epoch, start_batch=start_batch)
        if epoch == 1:
            os.kill(os.getpid(), signal.SIGTERM)
        return out

    monkeypatch.setattr(Trainer, "train_one_epoch", epoch_then_sigterm)
    t1.train()
    monkeypatch.setattr(Trainer, "train_one_epoch", orig)

    assert os.path.isdir(os.path.join(t1.preempt_dir, "model_preempt"))
    # handlers restored on the preempted exit path too
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL

    t2 = Trainer(_cfg(tmp_path))  # same checkpoints root + seed
    assert t2.start_epoch == 2  # epoch 1 completed, resume at 2
    assert int(t2.state.step) == int(t1.state.step)
    np.testing.assert_array_equal(
        np.asarray(t1.state.params["backbone"]["channel_embed"]),
        np.asarray(t2.state.params["backbone"]["channel_embed"]),
    )
    # resumed run finishes cleanly and clears the stable-path checkpoint
    t2.train()
    assert not os.path.isdir(t2.preempt_dir)
    t3 = Trainer(_cfg(tmp_path))
    assert t3.start_epoch == 1  # fresh launch, nothing to shadow it


def test_preempt_mid_epoch_exact_resume(tmp_path, monkeypatch):
    """preempt + auto-resume == the uninterrupted run, bit for bit.

    HCS on (the stateful host k-draw stream must restore exactly) and SWAD
    on from epoch 2 (the per-batch running average must ride the
    checkpoint). The interrupted epoch re-enters at the exact batch."""
    hcs_swad = [
        "++model.enable_sample=True",
        "++model.hcs_sampling=lowest_cosine_prob",
        "++train.swad=True",
        "++train.swa_start=1",
    ]
    # reference run: 3 epochs x 3 batches, no interruption
    ta = Trainer(_cfg(tmp_path / "a", extra=hcs_swad))
    ta.train()

    # preempted run: SIGTERM lands after the 5th optimizer step
    # (epoch 2, batch 1), so batch index 2 of epoch 2 never runs
    tb = Trainer(_cfg(tmp_path / "b", extra=hcs_swad))
    orig = Trainer._train_one_batch_regular
    calls = {"n": 0}

    def batch_then_trigger(self, batch):
        out = orig(self, batch)
        calls["n"] += 1
        if calls["n"] == 5:
            self._preempt_guard.trigger()
        return out

    monkeypatch.setattr(Trainer, "_train_one_batch_regular", batch_then_trigger)
    tb.train()
    monkeypatch.setattr(Trainer, "_train_one_batch_regular", orig)
    assert int(tb.state.step) == 5

    # resume re-enters epoch 2 at batch 2 and finishes epochs 2-3
    tb2 = Trainer(_cfg(tmp_path / "b", extra=hcs_swad))
    assert tb2.start_epoch == 2
    assert tb2._resume_start_batch == 2
    assert tb2.swa_params is not None and tb2.swa_n == tb.swa_n > 0
    assert tb2.host_rng.bit_generator.state == tb.host_rng.bit_generator.state
    tb2.train()

    assert int(tb2.state.step) == int(ta.state.step) == 9
    # final params identical (both runs adopted their SWA average)
    import jax

    leaves_a = jax.tree_util.tree_leaves(ta.state.params)
    leaves_b = jax.tree_util.tree_leaves(tb2.state.params)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    # channel-usage counters carried across the preemption
    assert sum(tb2.channel_counter.values()) == sum(ta.channel_counter.values())
    assert not os.path.isdir(tb2.preempt_dir)  # cleared on clean finish


def test_preempt_mid_epoch_opt_out_drops_partial_epoch(tmp_path, monkeypatch):
    cfg = _cfg(tmp_path)
    t1 = Trainer(cfg)

    orig = Trainer._train_one_batch_regular

    def batch_then_trigger(self, batch):
        out = orig(self, batch)
        self._preempt_guard.trigger()  # programmatic preemption after batch 1
        return out

    monkeypatch.setattr(Trainer, "_train_one_batch_regular", batch_then_trigger)
    t1.train()

    # ++train.resume_mid_epoch=False: epoch 1 never completed -> saved as
    # "0 epochs done", re-run from scratch
    t2 = Trainer(_cfg(tmp_path, extra=["++train.resume_mid_epoch=False"]))
    assert t2.start_epoch == 1
    assert t2._resume_start_batch == 0
    # but the optimizer step taken before the SIGTERM is not lost
    assert int(t2.state.step) == int(t1.state.step) >= 1


def test_auto_resume_opt_out(tmp_path, monkeypatch):
    t1 = Trainer(_cfg(tmp_path))
    t1._preempt_guard = PreemptionGuard()
    t1._save_preempt(2)
    assert os.path.isdir(os.path.join(t1.preempt_dir, "model_preempt"))
    t2 = Trainer(_cfg(tmp_path, extra=["++train.auto_resume=False"]))
    assert t2.start_epoch == 1


@pytest.mark.slow
def test_preempt_resume_under_zero3(tmp_path, monkeypatch):
    """Preempt + auto-resume with ZeRO-3 param sharding: the orbax restore
    comes back committed to one device; _place_state_on_mesh must re-apply
    the zero3 placement or the jitted step dies — and the finished run must
    equal the uninterrupted zero3 run bit for bit."""
    z3 = ["++hardware.zero3=True"]
    ta = Trainer(_cfg(tmp_path / "a", extra=z3))
    ta.train()

    tb = Trainer(_cfg(tmp_path / "b", extra=z3))
    orig = Trainer._train_one_batch_regular
    calls = {"n": 0}

    def batch_then_trigger(self, batch):
        out = orig(self, batch)
        calls["n"] += 1
        if calls["n"] == 5:
            self._preempt_guard.trigger()
        return out

    monkeypatch.setattr(Trainer, "_train_one_batch_regular", batch_then_trigger)
    tb.train()
    monkeypatch.setattr(Trainer, "_train_one_batch_regular", orig)

    tb2 = Trainer(_cfg(tmp_path / "b", extra=z3))
    assert tb2.zero3
    # the resumed params live sharded again (not one-device committed)
    import jax

    n_dev = tb2.n_devices
    assert any(
        getattr(l, "addressable_shards", None) is not None
        and l.addressable_shards[0].data.size == l.size // n_dev
        for l in jax.tree_util.tree_leaves(tb2.state.params)
        if hasattr(l, "ndim") and l.ndim >= 1 and l.size >= n_dev
    ), "resumed params not zero3-sharded"
    tb2.train()

    assert int(tb2.state.step) == int(ta.state.step)
    for la, lb in zip(
        jax.tree_util.tree_leaves(ta.state.params),
        jax.tree_util.tree_leaves(tb2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_rss_watermark_recycling(tmp_path, monkeypatch):
    """``train.max_host_rss_gb`` (round 5, from the r4 soak finding): when
    host RSS crosses the cap at an epoch boundary the trainer saves the
    preemption checkpoint and re-execs itself; the relaunch auto-resumes
    bit-identically. The re-exec is stubbed; the loss trajectory of
    (recycled run 1 -> resumed run 2) must equal an uninterrupted run."""
    losses = {}

    orig = Trainer.train_one_epoch

    def recording_epoch(self, epoch, start_batch=0):
        out = orig(self, epoch, start_batch=start_batch)
        losses.setdefault(id(self), {})[epoch] = out["loss"]
        return out

    monkeypatch.setattr(Trainer, "train_one_epoch", recording_epoch)

    # uninterrupted baseline
    base = Trainer(_cfg(tmp_path, [f"train.checkpoints={tmp_path}/base"]))
    base.train()
    base_losses = losses[id(base)]

    # capped run: cap of 0 GB -> every epoch boundary is "over"
    recycled = []
    monkeypatch.setattr(Trainer, "_reexec", lambda self: recycled.append(True))
    t1 = Trainer(_cfg(tmp_path, ["++train.max_host_rss_gb=1e-9"]))
    t1.train()
    assert recycled == [True]  # recycled after epoch 1, then returned
    assert os.path.isdir(os.path.join(t1.preempt_dir, "model_preempt"))

    # "relaunch": auto-resume continues at epoch 2 with identical state
    t2 = Trainer(_cfg(tmp_path, ["++train.max_host_rss_gb=1e-9"]))
    assert t2.start_epoch == 2
    np.testing.assert_array_equal(
        np.asarray(t1.state.params["backbone"]["channel_embed"]),
        np.asarray(t2.state.params["backbone"]["channel_embed"]),
    )
    t2.train()
    # each epoch boundary under the cap recycles again (sawtooth) — run 2
    # covered epoch 2 then recycled; run 3 finishes
    t3 = Trainer(_cfg(tmp_path, ["++train.max_host_rss_gb=1e-9"]))
    assert t3.start_epoch == 3
    t3.train()
    got = {**losses[id(t1)], **losses[id(t2)], **losses[id(t3)]}
    assert set(got) == set(base_losses)
    for e in base_losses:
        np.testing.assert_allclose(got[e], base_losses[e], rtol=1e-6)


def test_rss_recycling_respects_auto_resume_opt_out(tmp_path, monkeypatch):
    called = []
    monkeypatch.setattr(Trainer, "_reexec", lambda self: called.append(True))
    t = Trainer(_cfg(tmp_path, ["++train.max_host_rss_gb=1e-9",
                                "++train.auto_resume=False"]))
    t.train()
    assert called == []  # recycling disabled without auto-resume
