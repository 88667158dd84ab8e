"""Full-loop fixture parity: the reference's own Trainer.train() vs ours.

Converts step-level trajectory parity into PRODUCT-level parity (VERDICT r3
item 1): the torch reference Trainer runs end-to-end on the CHAMMI fixture
(scripts/run_reference_fixture.py, in a subprocess with functional stubs),
then THIS framework's Trainer runs the identical workload — same fixture,
same recipe hyperparameters, transplanted initial weights, and the
reference run's own recorded batch schedule replayed through our trainer's
mixed-chunk step — and the two products are compared:

- per-step, per-chunk train losses (main proxy loss + extra diversity loss)
- the effective lr and weight decay each update trained with
- per-epoch MorphEm eval: the full feature-dump -> kNN -> CHAMMI-score
  pipeline output on both sides (reference ``trainer.py:560-731`` +
  ``morphem/benchmark.py:31`` vs our ``evaluation/benchmark.py``)

Usage: python scripts/run_fullloop_parity.py [WORKDIR] [--epochs 3]
Prints one JSON report line and writes WORKDIR/parity_report.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

IMG, N_PER_CHUNK, BATCH, SEED = 64, 48, 12, 7
CHUNK_ORDER = ("Allen", "HPA", "CP")


def _run_reference(fixture: str, out: str, epochs: int,
                   sample: bool = False) -> dict:
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPLBACKEND="Agg")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/run_reference_fixture.py"),
         fixture, out, "--epochs", str(epochs), "--batch", str(BATCH),
         "--img", str(IMG), "--seed", str(SEED)]
        + (["--sample"] if sample else []),
        env=env, capture_output=True, text=True, timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(f"reference run failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}")
    with open(os.path.join(out, "record.json")) as f:
        return json.load(f)


class ReplayLoader:
    """Feeds the reference run's recorded batch schedule through our
    trainer's mixed-chunk step — items rebuilt with OUR deterministic
    pipeline (fold -> normalize at native resolution), which is bit-equal
    to the reference's patched eval transform."""

    def __init__(self, schedule, root: str):
        from diverse_channel_vit_tpu.data.morphem70k import SingleCellDataset

        self._sched = schedule
        self._epoch = 1
        self._ds = SingleCellDataset(
            root, file_name="morphem70k_v2.csv", chunk_name="morphem70k",
            is_train=False, img_size=IMG)
        self._row = {p: i for i, p in enumerate(self._ds.file_paths)}

    def set_epoch(self, epoch: int):
        if 1 <= epoch <= len(self._sched):
            self._epoch = int(epoch)

    def close(self):
        pass

    def __len__(self):
        return len(self._sched[0])

    def _build(self, rows):
        import numpy as np

        batch = {}
        for chunk in CHUNK_ORDER:
            sel = [r for r in rows if r["chunk"] == chunk]
            if not sel:
                continue
            ex = [self._ds.get_example(self._row[r["file_path"]]) for r in sel]
            batch[chunk] = {
                "image": np.stack([e["image"] for e in ex]),
                "label": np.asarray([e["label"] for e in ex], np.int32),
            }
        return batch

    def iter_batches(self, start: int = 0):
        for rows in self._sched[self._epoch - 1][start:]:
            yield self._build(rows)

    def __iter__(self):
        return self.iter_batches(0)


def _run_ours(fixture: str, out: str, rec: dict, epochs: int,
              sample: bool = False) -> dict:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from diverse_channel_vit_tpu.compile_cache import enable, honor_env_platform

    enable()
    honor_env_platform()

    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.trainer import SHUFFLE_ALL, Trainer

    cfg = load_config("chammi_cfg", [
        "dataset=morphem70k_v2_12channels",
        f"++dataset.root_dir={fixture}", "++dataset.file_name=morphem70k_v2.csv",
        f"++dataset.img_size={IMG}", f"++model.img_size=[{IMG}]",
        "++model.patch_size=16", "++model.pretrained_model_name=tiny",
        # recipe knobs, matched to run_reference_fixture.build_cfg
        "++model.enable_sample=False", "++model.hcs_sampling=none",
        "++model.temperature=0.07", "++model.proxy_loss_lambda=0.1",
        "++model.ortho_loss_v1_lambda=1.0", "++model.gamma_s=0.5",
        "++model.gamma_d=2.0", "++model.reverse_pos_pairs=True",
        "++train.extra_loss_lambda=1", "++train.tps_prob=0.0",
        f"++train.num_epochs={epochs}", f"++train.batch_size={BATCH}",
        f"++train.seed={SEED}", "++train.use_amp=False",
        "++train.dtype=float32",
        "++optimizer.params.lr=0.00004", "++optimizer.params.weight_decay=5.0e-5",
        "++scheduler.params.warmup_t=3", "++hardware.num_workers=0",
        "++hardware.mesh.data=1", "++model.attention_impl=xla",
        f"++model.pretrained={os.path.join(out, 'init_model.pt')}",
        f"++train.checkpoints={out}/ours_ck", "++train.save_model=none",
        f"++eval.root_dir={fixture}", f"++eval.feature_dir={out}/ours_feat",
        f"++eval.dest_dir={out}/ours_res", "++eval.every_n_epochs=1",
        "++eval.clean_up=False",
    ])
    trainer = Trainer(cfg)
    replay = ReplayLoader(rec["schedule"], fixture)
    assert len(replay) == trainer.updates_per_epoch, (
        f"steps/epoch mismatch: replay {len(replay)} vs trainer "
        f"{trainer.updates_per_epoch} — lr/wd schedules would diverge")
    trainer.train_loaders[SHUFFLE_ALL].close()
    trainer.train_loaders[SHUFFLE_ALL] = replay

    if sample:
        # Force the reference's realized HCS draws (shared-draw strategy):
        # mirror _train_one_batch_morphem, but each chunk's microbatch is
        # sliced to the recorded subset and the grad step compiled for
        # exactly those global channel ids (k=None disables our own draw).
        import jax
        import numpy as np

        from diverse_channel_vit_tpu.trainer import tree_add

        di = {"i": 0}

        def forced_morphem(batch):
            grads = None
            out = {}
            rng = trainer.state.step_rng()
            for ci, (chunk, sub) in enumerate(batch.items()):
                full = list(trainer._chunk_channel_ids(chunk))
                forced = [int(g) for g in rec["draws"][di["i"]]]
                di["i"] += 1
                pos = np.asarray([full.index(g) for g in forced])
                sub = {"image": sub["image"][:, pos], "label": sub["label"]}
                gstep = trainer._get_grad_step(tuple(forced), None, chunk=chunk)
                g, metrics = gstep(trainer.state.params, sub,
                                   jax.random.fold_in(rng, ci))
                grads = g if grads is None else tree_add(grads, g)
                for k_, v in metrics.items():
                    if k_ == "sampled_channels":
                        continue
                    out[f"{chunk}/{k_}"] = float(v)
            trainer.state, gnorm = trainer._apply_step(trainer.state, grads)
            out["grad_norm"] = float(gnorm)
            out["loss"] = sum(v for k_, v in out.items() if k_.endswith("/loss"))
            return out

        trainer._train_one_batch_morphem = forced_morphem

    ours = {"steps": [], "evals": []}
    orig_batch = trainer._train_one_batch_morphem

    def rec_batch(batch):
        m = orig_batch(batch)
        ours["steps"].append({
            "metrics": {k: float(v) for k, v in m.items()
                        if k != "sampled_channels"},
            # effective lr of the update just taken: optax's schedule count
            # is pre-increment, so update i (1-based) used lr(i-1)
            "lr": float(trainer.lr_schedule(trainer.state.step - 1)),
        })
        return m

    trainer._train_one_batch_morphem = rec_batch

    ours["evals"].append({"epoch": 0,
                          "scores": _f(trainer.evaluate_model(0))})
    for e in range(1, epochs + 1):
        trainer.train_one_epoch(e)
        ours["evals"].append({"epoch": e,
                              "scores": _f(trainer.evaluate_model(e))})
    return ours


def _f(d):
    return {k: float(v) for k, v in d.items()
            if isinstance(v, (int, float)) or getattr(v, "ndim", None) == 0}


def _chunk_of_labels(labels):
    """The reference's global 14-class vocabulary: CP 0-3, Allen 4-9, HPA
    10-13 (``datasets/morphem70k.py:103-118``)."""
    lo = min(labels)
    return "CP" if lo <= 3 else ("Allen" if lo <= 9 else "HPA")


def compare(rec: dict, ours: dict, epochs: int) -> dict:
    # ---- per-chunk main losses: fold the reference's flat proxy-call log
    # into steps using the recorded schedule's chunk composition ----------
    ref_calls = list(rec["chunk_losses"])
    ref_extras = list(rec["extras"])
    step_rows = [s for epoch in rec["schedule"] for s in epoch]
    main_diffs, total_diffs, lr_diffs, wd_diffs = [], [], [], []
    rows = []
    ci = 0
    for si, srows in enumerate(step_rows):
        if si >= len(ours["steps"]):
            break
        present = [c for c in CHUNK_ORDER
                   if any(r["chunk"] == c for r in srows)]
        om = ours["steps"][si]["metrics"]
        for c in present:
            call, extra = ref_calls[ci], ref_extras[ci]
            ci += 1
            assert _chunk_of_labels(call["labels"]) == c == extra["chunk"], (
                si, c, extra["chunk"])
            d_main = abs(call["loss"] - om[f"{c}/main_loss"])
            d_total = abs(call["loss"] + extra["extra"] - om[f"{c}/loss"])
            main_diffs.append(d_main)
            total_diffs.append(d_total)
            rows.append({"step": si, "chunk": c, "ref_main": call["loss"],
                         "ours_main": om[f"{c}/main_loss"], "d_main": d_main,
                         "d_total": d_total})
        rstep = rec["steps"][si]
        lr_diffs.append(abs(rstep["lr"] - ours["steps"][si]["lr"]))
        wd_diffs.append(abs(rstep["wd"] - 5.0e-5))  # constant-wd recipe

    # ---- eval scores: rebuild the reference's per-dataset sub-scores from
    # our per-task f1 keys (same formula, trainer.py:711-731) -------------
    def _ours_subscores(s):
        import numpy as np

        g = lambda d, t: s.get(f"knn_cosine/{d}/{t}/f1", np.nan)
        return {
            "allen_score": g("Allen", "Task_two"),
            "hpa_score": float(np.nanmean([g("HPA", "Task_two"),
                                           g("HPA", "Task_three")])),
            "cp_score": float(np.nanmean([g("CP", "Task_two"),
                                          g("CP", "Task_three"),
                                          g("CP", "Task_four")])),
            "chammi_score": s.get("knn_cosine/chammi_score", np.nan),
        }

    evals = []
    for re_, oe in zip(rec["evals"], ours["evals"]):
        row = {"epoch": oe["epoch"]}
        osub = _ours_subscores(oe["scores"])
        for name in ("allen_score", "hpa_score", "cp_score", "chammi_score"):
            rk = f"score/{name.replace('chammi', 'final')}/None"
            if rk in re_["scores"]:
                row[name] = {"ref": re_["scores"][rk], "ours": osub[name],
                             "d": abs(re_["scores"][rk] - osub[name])}
        evals.append(row)
    final = evals[-1] if evals else {}
    return {
        "n_steps": len(ours["steps"]),
        "n_chunk_losses": len(main_diffs),
        "max_d_main_loss": max(main_diffs) if main_diffs else None,
        "max_d_total_loss": max(total_diffs) if total_diffs else None,
        "max_d_lr": max(lr_diffs) if lr_diffs else None,
        "max_d_wd": max(wd_diffs) if wd_diffs else None,
        "evals": evals,
        "final_score_delta": final.get("chammi_score", {}).get("d"),
        "per_chunk": rows,
    }


def run(workdir: str, epochs: int = 3, reuse_ref: bool = False,
        sample: bool = False) -> dict:
    fixture = os.path.join(workdir, "fixture")
    refdir = os.path.join(workdir, "ref_sample" if sample else "ref")
    if not os.path.exists(os.path.join(fixture, "morphem70k_v2.csv")):
        from scripts.make_chammi_fixture import main as make_fixture

        make_fixture(fixture, n=N_PER_CHUNK, img=IMG)
    if reuse_ref and os.path.exists(os.path.join(refdir, "record.json")):
        with open(os.path.join(refdir, "record.json")) as f:
            rec = json.load(f)
    else:
        rec = _run_reference(fixture, refdir, epochs, sample=sample)
    if sample:
        n_calls = len(rec["chunk_losses"])
        assert rec["meta"]["n_draws"] == n_calls, (
            "HCS draw count != train forward count — the random.sample hook "
            "no longer aligns", rec["meta"], n_calls)
    ours = _run_ours(fixture, refdir, rec, epochs, sample=sample)
    report = compare(rec, ours, epochs)
    name = "parity_report_sample.json" if sample else "parity_report.json"
    with open(os.path.join(workdir, name), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "per_chunk"}))
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/fullloop_parity")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--reuse-ref", action="store_true")
    ap.add_argument("--sample", action="store_true",
                    help="HCS sampling ON: reference draws live, ours forced")
    args = ap.parse_args()
    run(args.workdir, args.epochs, args.reuse_ref, args.sample)
