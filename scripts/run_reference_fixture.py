"""Run the ACTUAL torch reference Trainer end-to-end on the CHAMMI fixture.

Product-level parity harness (VERDICT r3 item 1): this executes the
reference's own ``Trainer.train()`` (``/root/reference/trainer.py:326-383``)
— its loop, optimizer, scheduler, eval dispatch and the full MorphEm
benchmark pipeline (``trainer.py:560-731``, ``morphem/benchmark.py:31``) —
on the miniature CHAMMI fixture, with third-party gaps filled by the
functional stubs in ``ref_runtime_stubs.py``.

Determinism forcing (the "matched config/seed" idealization; stochastic
augmentation/sampling parity is pinned separately in the golden suites):
- train transforms are patched to the deterministic eval pipeline
  (fold -> normalize at native resolution; ``get_data_transform`` patch),
- ``enable_sample=False`` / ``hcs_sampling=none`` (no channel draws),
- dropout/drop-path 0, tps_prob 0, num_workers 0, fixed seeds.

Recorded artifacts (OUT_DIR):
- ``init_model.pt``     the reference model's INITIAL state_dict (the JAX
                        side warm-starts from this via models/import_torch)
- ``record.json``       per-step batch schedule (row file_paths per chunk),
                        per-step loss dicts + lr/wd, per-chunk main losses,
                        per-epoch MorphEm scores
- ``snapshots/``        the reference benchmark's own feature dumps + CSVs

Usage: python scripts/run_reference_fixture.py FIXTURE_ROOT OUT_DIR \
           [--epochs 3] [--batch 12] [--img 32] [--seed 7]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.ref_runtime_stubs import RefCfg, _cfg, install


def build_cfg(root: str, out: str, *, epochs: int, batch: int, img: int,
              seed: int) -> RefCfg:
    """The CHAMMI DiChaViT recipe (``train_scripts.sh:2``) shrunk to the
    fixture: tiny geometry, sampling/augs forced deterministic."""
    return _cfg(dict(
        tag=None,
        train=dict(
            batch_strategy="random_instance", resume_train=False,
            resume_model=None, use_amp=False, checkpoints=os.path.join(out, "ck"),
            save_model="none", clip_grad_norm=None, batch_size=batch,
            num_epochs=epochs, verbose_batches=1, seed=seed, debug=False,
            adaptive_interface_epochs=0, adaptive_interface_lr=None,
            swa=False, swad=False, swa_lr=0.05, swa_start=5,
            miro=False, miro_lr_mult=10.0, miro_ld=0.01,
            tps_prob=0.0, ssl=False, ssl_lambda=0.0, training_chunks=None,
            extra_loss_lambda=1.0, plot_attn=False,
        ),
        model=dict(
            name="dichavit", pretrained=False, pretrained_model_name="tiny",
            in_dim=None, num_classes=None, pooling="avg", temperature=0.07,
            learnable_temp=False, unfreeze_last_n_layers=-1,
            unfreeze_first_layer=True, init_first_layer=None,
            reset_last_n_unfrozen_layers=False, enable_sample=False,
            in_channel_names="FILL_LATER", new_channel_inits=[None],
            use_channelvit_channels=True, patch_size=16,
            orthogonal_channel_emb_init=True, dropout_tokens_hcs="none",
            freeze_channel_emb=False, keep_rate=None, block_type="block",
            hcs_sampling="none", hcs_sampling_temp=0.1,
            proxy_loss_lambda=0.1, ortho_loss_v1_lambda=1.0,
            drop_path_rate=0.0, gamma_s=0.5, gamma_d=2.0,
            reverse_pos_pairs=True, use_square=False,
        ),
        scheduler=dict(
            name="cosine", convert_to_batch=False,
            params=dict(t_initial="FILL_LATER", lr_min=1.0e-6, cycle_mul=1.0,
                        cycle_decay=0.5, cycle_limit=1, warmup_t=3,
                        warmup_lr_init=1.0e-5, warmup_prefix=False,
                        t_in_epochs=True, noise_range_t=None, noise_pct=0.67,
                        noise_std=1.0, noise_seed=42, k_decay=1.0,
                        initialize=True),
        ),
        optimizer=dict(
            name="adamw",
            params=dict(lr=0.00004, betas=[0.9, 0.999], eps=1.0e-08,
                        weight_decay=5.0e-5, amsgrad=False),
        ),
        dataset=dict(name="morphem70k", img_size=img, root_dir=root,
                     file_name="morphem70k_v2.csv",
                     in_channel_names=list(range(12))),
        data_chunk=dict(chunks=[
            {"Allen": ["nucleus", "membrane", "protein"]},
            {"HPA": ["microtubules", "protein", "nucleus", "er"]},
            {"CP": ["nucleus", "er", "rna", "golgi", "mito"]},
        ]),
        logging=dict(
            wandb=dict(use_wandb=False, log_freq=10000, num_images_to_log=0,
                       project_name="parity", run_name=None),
            use_py_log=False, scc_jobid=None,
        ),
        hardware=dict(num_workers=0, device="cpu", multi_gpus=None),
        eval=dict(
            batch_size=32,
            dest_dir=os.path.join(out, "snapshots", "results"),
            feature_dir=os.path.join(out, "snapshots", "features"),
            root_dir=root, meta_csv_file="FILL_LATER",
            classifiers=["knn"], classifier="PLACE_HOLDER",
            feature_file="features.npy", use_gpu=False,
            knn_metric="PLACE_HOLDER", knn_metrics=["cosine"],
            clean_up=False, umap=False, only_eval_first_and_last=False,
            skip_eval_for_debug=False, every_n_epochs=1,
            eval_subset_channels=False, channel_combinations=None,
        ),
        attn_pooling=dict(),
    ))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("out")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--img", type=int, default=32)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--sample", action="store_true",
                    help="enable_sample=True: the HCS draw (random.randint + "
                         "random.sample, channel_vit.py:79-86) runs LIVE in "
                         "every training forward; realized subsets are "
                         "recorded for forced replay")
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    install()

    import torch

    torch.set_num_threads(max(1, os.cpu_count() or 1))
    torch.manual_seed(args.seed)

    import importlib

    du = importlib.import_module("datasets.dataset_utils")
    m70k = importlib.import_module("datasets.morphem70k")
    dichavit_mod = importlib.import_module("models.dichavit")
    # expose the factory on the `models` anchor for getattr(models, name)
    sys.modules["models"].dichavit = dichavit_mod.dichavit
    sys.modules["models"].model_utils = importlib.import_module("models.model_utils")
    trainer_mod = importlib.import_module("trainer")

    rec = {"schedule": [], "steps": [], "chunk_losses": [], "evals": [],
           "draws": []}

    # ---- HCS sampling mode: record the realized channel draws ------------
    # With enable_sample=True and hcs_sampling="none" the DiChaViT forward
    # draws Cin_new = random.randint(1, Cin) then
    # random.sample(cur_channels, k=Cin_new) (dichavit.py:130-136, mirroring
    # channel_vit.py:79-86). Wrapping the module's `random` binding records
    # each realized subset (global channel ids, in order) without touching
    # the sampling logic.
    if args.sample:
        import random as _random
        import types as _types

        rnd = _types.SimpleNamespace(**{k: getattr(_random, k) for k in dir(_random)
                                        if not k.startswith("_")})

        def rec_sample(pop, k):
            v = _random.sample(pop, k)
            rec["draws"].append([int(c) for c in v])
            return v

        rnd.sample = rec_sample
        dichavit_mod.random = rnd

    # ---- deterministic transforms: eval pipeline for train AND eval ------
    orig_gdt = du.get_data_transform

    def det_transform(dataset, img_size, tps_prob, ssl_flag):
        tv = sys.modules["torchvision"].transforms
        mean_stds = du.get_mean_std_dataset("morphem70k")
        if dataset == "morphem70k":
            evald = {c: tv.Compose([tv.Resize(img_size), tv.CenterCrop(img_size),
                                    tv.Normalize(*mean_stds[c])])
                     for c in ("CP", "Allen", "HPA")}
            return evald, evald
        mean, std = mean_stds[dataset]
        ev = tv.Compose([tv.Resize(img_size), tv.CenterCrop(img_size),
                         tv.Normalize(mean, std)])
        return ev, ev

    du.get_data_transform = det_transform

    # ---- record the train batch schedule ---------------------------------
    orig_getitem = m70k.SingleCellDataset.__getitem__

    def rec_getitem(self, idx):
        log = getattr(self, "_parity_log", None)
        if log is not None:
            log.append(int(idx))
        return orig_getitem(self, idx)

    m70k.SingleCellDataset.__getitem__ = rec_getitem

    # ---- record per-chunk main losses (label range identifies the chunk) -
    orig_proxy = trainer_mod.proxy_loss

    def rec_proxy(proxies, feats, y, scale):
        loss = orig_proxy(proxies, feats, y, scale)
        labels = y.detach().cpu().numpy().tolist()
        rec["chunk_losses"].append({"labels": labels, "loss": float(loss)})
        return loss

    trainer_mod.proxy_loss = rec_proxy

    # ---- record extra (ortho+channel-proxy) loss per chunk ---------------
    extras = []
    orig_fwd = dichavit_mod.DiChaViT.forward

    def rec_fwd(self, x, chunk_name, *a, **k):
        out = orig_fwd(self, x, chunk_name, *a, **k)
        if self.training and isinstance(out, tuple):
            extras.append({"chunk": chunk_name, "extra": float(out[1])})
        return out

    dichavit_mod.DiChaViT.forward = rec_fwd

    # ---- record per-step loss dict + lr/wd -------------------------------
    orig_batch = trainer_mod.Trainer.train_one_batch_morphem70k

    def rec_batch(self, batch, num_updates, epoch):
        loss_dict = orig_batch(self, batch, num_updates=num_updates, epoch=epoch)
        rec["steps"].append({
            "epoch": epoch, "num_updates": num_updates,
            "loss_dict": {k: float(v) for k, v in loss_dict.items()},
            "lr": float(self.current_lr), "wd": float(self.current_wd),
        })
        return loss_dict

    trainer_mod.Trainer.train_one_batch_morphem70k = rec_batch

    # ---- pandas>=3 compat: None in the benchmark's task table becomes NaN,
    # so the reference's `leave_out != None` guard (evaluation.py:119) fires
    # for Allen and crashes. Normalize to the intended None.
    bench_mod = importlib.import_module("morphem.benchmark")
    orig_evaluate = bench_mod.evaluate

    def evaluate_compat(features_path, df_path, leave_out, leaveout_label,
                        *a, **k):
        if not isinstance(leave_out, str):
            leave_out, leaveout_label = None, None
        return orig_evaluate(features_path, df_path, leave_out,
                             leaveout_label, *a, **k)

    bench_mod.evaluate = evaluate_compat

    # ---- record the per-epoch MorphEm scores -----------------------------
    orig_eval = trainer_mod.Trainer.eval_morphem70k

    def rec_eval(self, epoch, new_channel_init, eval_chunks=None):
        scores = orig_eval(self, epoch=epoch, new_channel_init=new_channel_init,
                           eval_chunks=eval_chunks)
        rec["evals"].append({"epoch": epoch,
                             "scores": {k: float(v) for k, v in scores.items()}})
        return scores

    trainer_mod.Trainer.eval_morphem70k = rec_eval

    cfg = build_cfg(args.root, args.out, epochs=args.epochs, batch=args.batch,
                    img=args.img, seed=args.seed)
    if args.sample:
        cfg.model.enable_sample = True
        # the draw order must be deterministic given the seed so re-runs of
        # this recorder are reproducible (replay uses the RECORDED draws
        # either way)
        import random as _r

        _r.seed(args.seed * 7919)
    trainer = trainer_mod.Trainer(cfg)
    torch.save({"model_params": trainer.model.state_dict()},
               os.path.join(args.out, "init_model.pt"))

    # tag the SHUFFLE_ALL train set for schedule recording
    train_set = trainer.train_loaders[trainer.shuffle_all].dataset
    idx_log = []
    train_set._parity_log = idx_log

    trainer.train()

    # fold the flat idx stream into per-step row groups
    steps_per_epoch = len(trainer.train_loaders[trainer.shuffle_all])
    rows = [{"file_path": train_set.metadata.loc[i, "file_path"],
             "chunk": train_set.metadata.loc[i, "chunk"],
             "label": train_set.metadata.loc[i, "label"]} for i in idx_log]
    b = args.batch
    for e in range(args.epochs):
        base = e * len(train_set)
        epoch_rows = rows[base: base + len(train_set)]
        rec["schedule"].append([
            [r for r in epoch_rows[s * b:(s + 1) * b]]
            for s in range(steps_per_epoch)
        ])
    rec["extras"] = extras
    rec["meta"] = dict(epochs=args.epochs, batch=args.batch, img=args.img,
                       seed=args.seed, steps_per_epoch=steps_per_epoch,
                       n_train_rows=len(train_set), sample=bool(args.sample),
                       n_draws=len(rec["draws"]))
    with open(os.path.join(args.out, "record.json"), "w") as f:
        json.dump(rec, f)
    print(json.dumps({"ok": True, "steps": len(rec["steps"]),
                      "evals": len(rec["evals"]),
                      "final": rec["evals"][-1]["scores"] if rec["evals"] else {}}))


if __name__ == "__main__":
    main()
