"""Logging multiplexer (reference ``custom_log.py``): dict-metric protocol,
rank gating, and the zero-egress local wandb sink."""

import json
import os

from diverse_channel_vit_tpu.config import load_config
from diverse_channel_vit_tpu.logging_utils import DummyLogger, LocalWandb, MyLogging


def test_local_wandb_sink_writes_run_layout(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    cfg = load_config("synthetic_cfg", ["logging=wandb",
                                        "++logging.wandb.run_name=t1"])
    logger = MyLogging(cfg)
    # wandb lib is absent in this env -> the LocalWandb sink engages
    assert isinstance(logger.wandb, LocalWandb)
    logger.info({"loss": 1.5, "acc": 0.25})
    logger.info({"loss": 1.25})
    logger.info("plain message")  # strings are NOT metrics
    logger.finish()

    run_dir = logger.wandb.dir
    assert os.path.isfile(os.path.join(run_dir, "config.json"))
    rows = [json.loads(l) for l in open(os.path.join(run_dir, "wandb-history.jsonl"))]
    assert [r["_step"] for r in rows] == [0, 1]
    assert rows[0]["loss"] == 1.5 and rows[1]["loss"] == 1.25
    summary = json.load(open(os.path.join(run_dir, "wandb-summary.json")))
    assert summary == {"loss": 1.25, "acc": 0.25}  # last-seen values


def test_tensorboard_sink_writes_scalar_events(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = load_config("synthetic_cfg", ["logging=tensorboard",
                                        "++logging.wandb.run_name=tb1"])
    logger = MyLogging(cfg)
    assert logger.tb is not None and logger.wandb is None
    logger.info({"loss": 1.5, "acc": 0.25, "note": "skip-me"})        # counter step 0
    logger.info({"loss": 1.0, "step": 7})                             # explicit step key
    logger.info("plain message")
    logger.finish()

    from tensorboard.backend.event_processing.event_file_loader import EventFileLoader

    run_dir = logger.tb.dir
    files = [os.path.join(run_dir, f) for f in os.listdir(run_dir) if "tfevents" in f]
    assert files, f"no event file in {run_dir}"
    points = []  # (tag, step, value)
    for f in files:
        for ev in EventFileLoader(f).Load():
            for v in getattr(ev.summary, "value", []):
                if v.HasField("tensor"):
                    import tensorflow as tf

                    points.append((v.tag, ev.step, float(tf.make_ndarray(v.tensor))))
    got = {(t, s): val for t, s, val in points}
    assert got[("loss", 0)] == 1.5 and got[("acc", 0)] == 0.25
    assert got[("loss", 7)] == 1.0          # step key routed to the step axis
    assert not any(t == "note" for t, _ in got)  # strings skipped
    assert not any(t == "step" for t, _ in got)  # step axis key not re-logged


def test_stdout_logger_formats_dicts(capsys):
    cfg = load_config("synthetic_cfg", [])
    logger = MyLogging(cfg)
    logger.info({"loss": 2.0}, pref_msg="[e1]")
    out = capsys.readouterr().out
    assert "[e1] loss: 2.0" in out


def test_dummy_logger_swallows_everything():
    d = DummyLogger()
    d.info({"x": 1})
    d.log_config(None)
    d.finish()
