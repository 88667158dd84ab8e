"""Logging multiplexer.

Counterpart of ``custom_log.py``: ``MyLogging`` (:131-250) multiplexes wandb
metrics / python logging / stdout with a dict-message protocol (dicts are
metrics, strings are messages); ``DummyLogger`` (:88-127) swallows everything
on non-zero ranks. wandb is optional — absent or disabled it degrades to
stdout, keeping the zero-egress TPU pod case first-class.
"""

from __future__ import annotations

import json
import logging
import sys
from typing import Any, Dict, Optional, Union


class DummyLogger:
    """No-op logger for non-primary hosts (``custom_log.py:88-127``)."""

    def info(self, *a, **k):
        pass

    def log_config(self, *a, **k):
        pass

    def finish(self, *a, **k):
        pass


class LocalWandb:
    """wandb-compatible LOCAL run sink for zero-egress pods.

    Presents the ``log``/``finish`` surface ``MyLogging`` uses and writes the
    wandb on-disk layout a human (or sync tool) expects: per-run directory
    with ``config.json``, ``wandb-history.jsonl`` (one JSON line per
    ``log()`` call, ``_step``-stamped — wandb's history format) and a
    ``wandb-summary.json`` of last-seen values at ``finish()``. Makes
    ``logging/wandb.yaml`` functional without the library
    (reference role: ``custom_log.py:48-75``).
    """

    def __init__(self, project: str, run_name: Optional[str], config: Dict):
        import datetime
        import os

        stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
        name = run_name or f"run_{stamp}"
        self.dir = os.path.join("wandb_local", project, name)
        os.makedirs(self.dir, exist_ok=True)
        with open(os.path.join(self.dir, "config.json"), "w") as f:
            json.dump(config, f, default=str, indent=2)
        self._history = open(os.path.join(self.dir, "wandb-history.jsonl"), "a")
        self._step = 0
        self._summary: Dict[str, Any] = {}

    def log(self, metrics: Dict[str, Any]):
        row = {k: v for k, v in metrics.items()}
        row["_step"] = self._step
        self._step += 1
        self._history.write(json.dumps(row, default=float) + "\n")
        self._history.flush()
        self._summary.update(metrics)

    def finish(self):
        import os

        with open(os.path.join(self.dir, "wandb-summary.json"), "w") as f:
            json.dump(self._summary, f, default=float, indent=2)
        self._history.close()


class TensorBoardSink:
    """TensorBoard scalar sink (beyond reference — TPU-ecosystem native).

    jax.profiler traces (``train.profile_dir``) are already TensorBoard
    format; this adds the scalar half so one ``tensorboard --logdir`` shows
    both. Lazy tensorflow import (CPU graph writer only); numeric values in
    a dict message become ``tf.summary.scalar`` points. The step axis is an
    explicit ``step``/``num_updates``/``epoch`` key when the message carries
    one, else a per-sink counter.
    """

    STEP_KEYS = ("step", "num_updates", "epoch")

    def __init__(self, logdir: str):
        import tensorflow as tf  # noqa: PLC0415 — heavy, only when enabled

        self._tf = tf
        self.dir = logdir
        self.writer = tf.summary.create_file_writer(logdir)
        self._step = 0

    def log(self, metrics: Dict[str, Any]):
        step = None
        for k in self.STEP_KEYS:
            v = metrics.get(k)
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                step = int(v)
                break
        if step is None:
            step = self._step
        self._step = step + 1
        with self.writer.as_default():
            for k, v in metrics.items():
                if isinstance(v, bool) or k in self.STEP_KEYS:
                    continue
                try:
                    self._tf.summary.scalar(k.replace(" ", "_"), float(v), step=step)
                except (TypeError, ValueError):
                    continue  # non-scalar payloads (strings, arrays) are skipped
        self.writer.flush()

    def finish(self):
        self.writer.close()


class MyLogging:
    """stdout / python-logging / wandb(-local) / tensorboard metric
    multiplexer (``custom_log.py:131-250`` parity; dict messages log as
    metrics)."""

    def __init__(self, cfg, *, model=None, project_name: Optional[str] = None, op: str = "w"):
        self.cfg = cfg
        wandb_cfg = cfg.logging.get("wandb", {}) if hasattr(cfg, "logging") else {}
        self.use_wandb = bool(wandb_cfg.get("use_wandb", False))
        self.use_py_log = bool(cfg.logging.get("use_py_log", False)) if hasattr(cfg, "logging") else False
        self.wandb = None
        if self.use_wandb:
            project = project_name or wandb_cfg.get("project_name") or "dichavit_tpu"
            config = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
            try:
                import wandb

                self.wandb = wandb
                wandb.init(project=project, name=wandb_cfg.get("run_name"), config=config)
            except Exception:  # zero-egress pod: local wandb-layout jsonl sink
                self.wandb = LocalWandb(project, wandb_cfg.get("run_name"), config)
                print(f"[logging] wandb library unavailable; writing local run to {self.wandb.dir}")
        self.tb = None
        if hasattr(cfg, "logging") and bool(cfg.logging.get("tensorboard", False)):
            import datetime
            import os

            base = str(cfg.logging.get("tensorboard_dir", "tb_logs"))
            run = (wandb_cfg.get("run_name") if isinstance(wandb_cfg, dict) or hasattr(wandb_cfg, "get") else None) or (
                "run_" + datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
            )
            self.tb = TensorBoardSink(os.path.join(base, str(run)))
            print(f"[logging] tensorboard scalars -> {self.tb.dir}")
        self.py_logger = None
        if self.use_py_log:
            self.py_logger = logging.getLogger("diverse_channel_vit_tpu")
            if not self.py_logger.handlers:
                h = logging.StreamHandler(sys.stdout)
                h.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(message)s"))
                self.py_logger.addHandler(h)
                self.py_logger.setLevel(logging.INFO)

    def info(self, msg: Union[str, Dict[str, Any]], sep: str = ", ", padding_space: bool = False, pref_msg: str = ""):
        """Dict messages are metrics; strings are plain log lines
        (``custom_log.py:162-179``)."""
        if isinstance(msg, dict):
            if self.use_wandb and self.wandb is not None:
                self.wandb.log(msg)
            if self.tb is not None:
                self.tb.log(msg)
            line = pref_msg + " " + sep.join(f"{k}: {v}" for k, v in msg.items())
            self._emit(line.strip())
        else:
            self._emit(pref_msg + msg)

    def _emit(self, line: str):
        if self.py_logger is not None:
            self.py_logger.info(line)
        else:
            print(line, flush=True)

    def log_config(self, cfg):
        try:
            self._emit("config: " + json.dumps(cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg), default=str))
        except Exception:
            self._emit(f"config: {cfg}")

    def finish(self, msg_str: str = ""):
        if msg_str:
            self._emit(msg_str)
        if self.use_wandb and self.wandb is not None:
            self.wandb.finish()
        if self.tb is not None:
            self.tb.finish()
