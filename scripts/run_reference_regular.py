"""Run the ACTUAL torch reference Trainer end-to-end on a JUMP-CP fixture —
the REGULAR path, with stochastic channel sampling ON.

Product-level parity, VERDICT r4 item 2: the round-4 harness covered only
the CHAMMI mixed-chunk path with sampling forced off. This runs the
reference's own ``Trainer.train()`` through the code paths that remained
piece-tested only:

- ``train_one_batch_regular``   (``/root/reference/trainer.py:963-1028``)
- ``eval_regular``              (``:386-472``)
- ``eval_subset_channels``      (``:475-545`` — incl. its break-after-first
                                quirk)
- the DCS channel draw inside ``forward`` with ``enable_sample=True`` +
  ``hcs_sampling=lowest_cosine_prob`` (``models/dichavit.py:122-216``) —
  the per-step REALIZED channel subsets are recorded (in order) and the
  JAX side replays them as forced subsets, per the shared-draw forcing
  strategy.
- the wd cosine schedule (``weight_decay_end``, ``trainer.py:217-228``)
  through the regular per-batch update.

Determinism forcing: train transform patched to the eval normalize
(albumentations is absent; its stub raises if touched), dropout/drop-path
0, num_workers 0, fixed seeds. The HCS draw itself stays STOCHASTIC — that
is the point — and is recorded, not forced.

Recorded artifacts (OUT_DIR): ``init_model.pt``, ``record.json``
(schedule of data IDs per step, realized channel draws per step, per-step
loss dicts + lr/wd, per-epoch eval_regular accuracies, the final
eval_subset_channels table).

Usage: python scripts/run_reference_regular.py FIXTURE_ROOT OUT_DIR \
           [--epochs 2] [--batch 8] [--img 32] [--seed 5]
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
    """The JUMP-CP DiChaViT recipe (``train_scripts.sh:5``) shrunk to the
    fixture: tiny geometry, deterministic transforms, sampling ON."""
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
            reset_last_n_unfrozen_layers=False, enable_sample=True,
            in_channel_names="FILL_LATER", new_channel_inits=[None],
            use_channelvit_channels=True, patch_size=8,
            orthogonal_channel_emb_init=True, dropout_tokens_hcs="none",
            freeze_channel_emb=False, keep_rate=None, block_type="block",
            hcs_sampling="lowest_cosine_prob", hcs_sampling_temp=1000.0,
            proxy_loss_lambda=0.001, ortho_loss_v1_lambda=0.001,
            drop_path_rate=0.0, gamma_s=1.0, gamma_d=4.0,
            reverse_pos_pairs=True, use_square=False,
        ),
        scheduler=dict(
            name="cosine", convert_to_batch=False,
            params=dict(t_initial=epochs, lr_min=1.0e-6, cycle_mul=1.0,
                        cycle_decay=0.5, cycle_limit=1, warmup_t=1,
                        warmup_lr_init=1.0e-5, warmup_prefix=False,
                        t_in_epochs=True, noise_range_t=None, noise_pct=0.67,
                        noise_std=1.0, noise_seed=42, k_decay=1.0,
                        initialize=True),
        ),
        optimizer=dict(
            name="adamw",
            params=dict(lr=0.0004, betas=[0.9, 0.999], eps=1.0e-08,
                        weight_decay=0.04, weight_decay_end=0.4,
                        amsgrad=False),
        ),
        dataset=dict(name="jump_cp", img_size=img, root_dir=root,
                     file_name=None, in_channel_names=list(range(8))),
        data_chunk=dict(chunks=[
            {"jump_cp": {"train": list(range(8)), "valid": list(range(8)),
                         "test": list(range(8))}},
        ]),
        logging=dict(
            wandb=dict(use_wandb=False, log_freq=10000, num_images_to_log=0,
                       project_name="parity", run_name=None),
            use_py_log=False, scc_jobid=None,
        ),
        hardware=dict(num_workers=0, device="cpu", multi_gpus=None),
        eval=dict(
            batch_size=16,
            dest_dir=os.path.join(out, "results"),
            feature_dir=os.path.join(out, "features"),
            root_dir=root, meta_csv_file=None,
            classifiers=["knn"], classifier="PLACE_HOLDER",
            feature_file="features.npy", use_gpu=False,
            knn_metric="PLACE_HOLDER", knn_metrics=["cosine"],
            clean_up=False, umap=False, only_eval_first_and_last=False,
            skip_eval_for_debug=False, every_n_epochs=1,
            eval_subset_channels=True, channel_combinations=None,
        ),
        attn_pooling=dict(),
    ))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("out")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img", type=int, default=32)
    ap.add_argument("--seed", type=int, default=5)
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    install()

    import numpy as np
    import torch

    torch.set_num_threads(max(1, os.cpu_count() or 1))
    torch.manual_seed(args.seed)

    import importlib

    du = importlib.import_module("datasets.dataset_utils")
    jcp = importlib.import_module("datasets.jump_cp")
    dichavit_mod = importlib.import_module("models.dichavit")
    sys.modules["models"].dichavit = dichavit_mod.dichavit
    sys.modules["models"].model_utils = importlib.import_module("models.model_utils")
    trainer_mod = importlib.import_module("trainer")

    rec = {"schedule": [], "draws": [], "steps": [], "evals": [],
           "subset_sweep": None}

    # ---- deterministic transforms: normalize-only on both train and eval
    # (the reference eval CellAugmentation is normalize+ToTensor; its train
    # pipeline needs albumentations, which is absent here) -----------------
    mean, std = du.get_mean_std_dataset("jump_cp")
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)

    def det_transform(img_hwc):
        out = (np.asarray(img_hwc, np.float32) - mean_a) / std_a
        return torch.from_numpy(out.transpose(2, 0, 1))

    def det_gdt(dataset, img_size, tps_prob, ssl_flag):
        assert dataset == "jump_cp", dataset
        return det_transform, det_transform

    du.get_data_transform = det_gdt

    # ---- record the train batch schedule (data IDs per __getitem__) ------
    orig_getitem = jcp.JUMPCP.__getitem__

    def rec_getitem(self, idx):
        log = getattr(self, "_parity_log", None)
        if log is not None:
            log.append(int(self.data_id[idx]))
        return orig_getitem(self, idx)

    jcp.JUMPCP.__getitem__ = rec_getitem

    # ---- record the realized DCS channel draws, in order -----------------
    # The sampler's last act per training forward is
    # ``counter = Counter(cur_channels)`` (dichavit.py:214) — patching the
    # module-global Counter captures the selected GLOBAL channel ids in
    # selection order without touching the sampling logic itself.
    import collections

    def rec_counter(arg=(), *a, **k):
        lst = list(arg)
        rec["draws"].append([int(c) for c in lst])
        return collections.Counter(lst, *a, **k)

    dichavit_mod.Counter = rec_counter

    # ---- record per-step loss dict + lr/wd -------------------------------
    orig_batch = trainer_mod.Trainer.train_one_batch_regular

    def rec_batch(self, batch, num_updates, epoch):
        loss_dict = orig_batch(self, batch, num_updates=num_updates, epoch=epoch)
        rec["steps"].append({
            "epoch": epoch, "num_updates": num_updates,
            "loss_dict": {k: float(v) for k, v in loss_dict.items()},
            "lr": float(self.current_lr), "wd": float(self.current_wd),
        })
        return loss_dict

    trainer_mod.Trainer.train_one_batch_regular = rec_batch

    # ---- record eval_regular + the subset sweep --------------------------
    orig_eval = trainer_mod.Trainer.eval_regular

    def rec_eval(self, epoch):
        res = orig_eval(self, epoch=epoch)
        rec["evals"].append({"epoch": epoch,
                             "scores": {k: (float(v) if v is not None else None)
                                        for k, v in (res or {}).items()}})
        return res

    trainer_mod.Trainer.eval_regular = rec_eval

    orig_subset = trainer_mod.Trainer.eval_subset_channels

    def rec_subset(self):
        res = orig_subset(self)
        rec["subset_sweep"] = {str(k): [float(a) for a in v]
                               for k, v in (res or {}).items()}
        return res

    trainer_mod.Trainer.eval_subset_channels = rec_subset

    cfg = build_cfg(args.root, args.out, epochs=args.epochs, batch=args.batch,
                    img=args.img, seed=args.seed)
    trainer = trainer_mod.Trainer(cfg)
    torch.save({"model_params": trainer.model.state_dict()},
               os.path.join(args.out, "init_model.pt"))

    train_loader = trainer.train_loaders[trainer.shuffle_all]
    train_set = train_loader.dataset
    idx_log = []
    train_set._parity_log = idx_log

    trainer.train()

    # fold the flat data-id stream into per-step groups. drop_last=True:
    # the batch sampler never emits the trailing partial batch, so exactly
    # steps_per_epoch*b __getitem__ calls happen per epoch.
    steps_per_epoch = len(train_loader)
    b = args.batch
    per_epoch = steps_per_epoch * b
    for e in range(args.epochs):
        ids = idx_log[e * per_epoch:(e + 1) * per_epoch]
        rec["schedule"].append([ids[s * b:(s + 1) * b]
                                for s in range(steps_per_epoch)])
    rec["meta"] = dict(epochs=args.epochs, batch=args.batch, img=args.img,
                       seed=args.seed, steps_per_epoch=steps_per_epoch,
                       n_train_rows=len(train_set),
                       n_draws=len(rec["draws"]))
    with open(os.path.join(args.out, "record.json"), "w") as f:
        json.dump(rec, f)
    print(json.dumps({"ok": True, "steps": len(rec["steps"]),
                      "draws": len(rec["draws"]),
                      "evals": len(rec["evals"]),
                      "subset": rec["subset_sweep"]}))


if __name__ == "__main__":
    main()
