"""Real-TPU soak run (VERDICT r3 item 2): hours / >=10k steps through main.py.

Drives the real CLI end-to-end on the flagship-geometry synthetic task with
eval cadence, SWA and checkpoints ON, induces one SIGTERM mid-run and lets
the preemption guard + auto-resume take over on relaunch, and records:

- steps/hour drift (per-epoch wall times from the trainer's own logs)
- host RSS curve (polled every 30 s from /proc)
- HBM live/high-water line (``++train.log_memory=True`` epoch telemetry)

Artifacts: OUT_DIR/soak_log_{1,2}.txt (full trainer stdout), OUT_DIR/rss.jsonl,
OUT_DIR/soak_report.json. Run WITHOUT JAX_PLATFORMS (needs the chip):

    python scripts/soak_run.py [OUT_DIR] [--epochs 100] [--preempt-epoch 30]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# img 128 (not 224): this dev host feeds the chip through a ~50 MB/s
# tunnel, so the soak would be transfer-bound into many hours at 224; at
# 128 px the full ViT-S step still exercises every production path
# (fused kernels, flash, SWA, eval, checkpoints) at ~10k steps / ~1.5 h
CMD = [
    sys.executable, os.path.join(REPO, "main.py"), "-cn", "synthetic_cfg",
    "++model.img_size=[128]", "++model.patch_size=16",
    "++model.pretrained_model_name=small",
    "++dataset.img_size=128", "++dataset.num_train_samples=6400",
    "++dataset.num_eval_samples=512",
    "++train.batch_size=64", "++train.seed=123",
    "++train.swa=True", "++train.swa_start=50",
    "++train.save_model=last", "++train.log_memory=True",
    "++train.verbose_batches=100",
    "++eval.every_n_epochs=10", "++optimizer.params.lr=0.0004",
    "++scheduler.params.warmup_t=3", "++hardware.num_workers=0",
]


_CHILD = {"proc": None}


def _forward_term(signum, frame):
    """If the wrapper itself is terminated (outer timeout/operator), pass
    SIGTERM to the trainer so its preemption guard checkpoints and exits —
    never leave an orphaned main.py holding the chip."""
    proc = _CHILD["proc"]
    if proc is not None and proc.poll() is None:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=300)
        except subprocess.TimeoutExpired:
            proc.kill()
    raise SystemExit(143)


signal.signal(signal.SIGTERM, _forward_term)


def launch(out_dir: str, epochs: int, log_path: str):
    cmd = CMD + [f"++train.num_epochs={epochs}",
                 f"++train.checkpoints={out_dir}/ck"]
    log = open(log_path, "w")
    proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                            cwd=REPO, env=dict(os.environ))
    _CHILD["proc"] = proc
    return proc, log


def monitor(proc, rss_f, preempt_after_epoch, log_path):
    """Poll RSS every 30 s; SIGTERM once the log shows the target epoch."""
    sent = False
    while proc.poll() is None:
        try:
            with open(f"/proc/{proc.pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        rss_f.write(json.dumps(
                            {"t": time.time(),
                             "rss_mb": int(line.split()[1]) // 1024}) + "\n")
                        rss_f.flush()
                        break
        except OSError:
            pass
        if preempt_after_epoch and not sent:
            with open(log_path, errors="replace") as f:
                txt = f.read()
            done = re.findall(r"epoch (\d+) done in", txt)
            if done and int(done[-1]) >= preempt_after_epoch:
                print(f"[soak] SIGTERM at epoch {done[-1]}", flush=True)
                proc.send_signal(signal.SIGTERM)
                sent = True
        time.sleep(30)
    return proc.returncode


def parse_report(out_dir: str, logs):
    epoch_times, hbm_peak, rss_at_epoch = [], [], []
    for lp in logs:
        with open(lp, errors="replace") as f:
            for line in f:
                m = re.search(r"epoch (\d+) done in ([\d.]+)s", line)
                if m:
                    epoch_times.append((int(m.group(1)), float(m.group(2))))
                m = re.search(r"mem/hbm_peak_mb ([\d.]+)", line)
                if m:
                    hbm_peak.append(float(m.group(1)))
                m = re.search(r"mem/host_rss_mb ([\d.]+)", line)
                if m:
                    rss_at_epoch.append(float(m.group(1)))
    report = {"epochs_completed": len(epoch_times)}
    if len(epoch_times) >= 20:
        head = [t for _, t in epoch_times[2:12]]   # skip compile epochs
        tail = [t for _, t in epoch_times[-10:]]
        report["epoch_s_first10"] = round(sum(head) / len(head), 2)
        report["epoch_s_last10"] = round(sum(tail) / len(tail), 2)
        report["drift_pct"] = round(
            100 * (report["epoch_s_last10"] / report["epoch_s_first10"] - 1), 2)
    if hbm_peak:
        report["hbm_peak_mb_first"] = hbm_peak[0]
        report["hbm_peak_mb_last"] = hbm_peak[-1]
    if rss_at_epoch:
        report["host_rss_mb_first"] = rss_at_epoch[0]
        report["host_rss_mb_last"] = rss_at_epoch[-1]
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="/tmp/soak")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--preempt-epoch", type=int, default=30)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rss_f = open(os.path.join(args.out, "rss.jsonl"), "w")

    t0 = time.time()
    log1 = os.path.join(args.out, "soak_log_1.txt")
    proc, lf = launch(args.out, args.epochs, log1)
    rc1 = monitor(proc, rss_f, args.preempt_epoch, log1)
    lf.close()
    print(f"[soak] phase 1 exited rc={rc1} after {time.time()-t0:.0f}s", flush=True)

    # relaunch the SAME command: the preemption checkpoint auto-resumes
    log2 = os.path.join(args.out, "soak_log_2.txt")
    proc, lf = launch(args.out, args.epochs, log2)
    rc2 = monitor(proc, rss_f, None, log2)
    lf.close()
    print(f"[soak] phase 2 exited rc={rc2} after {time.time()-t0:.0f}s", flush=True)

    report = parse_report(args.out, [log1, log2])
    report["wall_hours"] = round((time.time() - t0) / 3600, 2)
    report["preempt_resume"] = {"rc_preempted": rc1, "rc_final": rc2}
    with open(log2, errors="replace") as f:
        report["resumed"] = "auto-resume" in f.read()
    if not report["resumed"]:
        print("[soak] WARNING: phase 2 log shows no auto-resume — the "
              "preemption checkpoint was not picked up", flush=True)
    with open(os.path.join(args.out, "soak_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
