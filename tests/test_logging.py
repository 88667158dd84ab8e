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
