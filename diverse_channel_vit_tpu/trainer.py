"""Trainer — the run orchestrator.

Counterpart of the reference's monolithic ``Trainer`` (``trainer.py:58-1347``):
builds loaders/model/optimizer/schedules/logger in ``__init__``, then runs the
epoch loop with periodic evaluation and checkpointing. Differences are all
TPU-idiomatic:

- per-batch work is one jitted step (see ``training/steps.py``); the Python
  loop only feeds host batches and draws the HCS channel-count ``k``
- the HCS draw (``Cin_new ~ U[1, C]``, ``channel_vit.py:79-82``) happens on
  the host from a seeded generator — under multi-host SPMD every host draws
  the same k, fixing the reference's DDP nondeterminism (SURVEY §2.6)
- one compiled specialization per (chunk, k); shapes inside are static
- data parallelism = mesh sharding, not DDP wrappers
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import models as model_zoo
from .data import (
    get_classes,
    get_train_val_test_loaders,
    make_random_instance_train_loader,
)
from .logging_utils import DummyLogger, MyLogging
from .parallel import make_mesh, shard_batch, shard_params
from .training import (
    create_train_state,
    make_eval_step,
    make_lr_schedule,
    make_optimizer,
)
from .training.checkpoint import (
    load_checkpoint,
    load_meta,
    load_tree,
    save_checkpoint,
    save_tree,
    wait_for_checkpoints,
)
from .training.state import param_count
from .training.steps import (
    make_apply_step,
    make_grad_step,
    make_train_step,
    proxy_logits,
    tree_add,
)
from .models.wrappers import model_scale
from .utils.misc import AverageMeter, Timer, set_seeds

SHUFFLE_ALL = "SHUFFLE_ALL"


def _host_rss_gb() -> Optional[float]:
    """This process's resident set size in GB (None off-Linux)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 2**20
    except OSError:
        pass
    return None


def _default(val, fallback):
    return fallback if val is None else val


def _load_torch_state_dict(path: str) -> dict:
    """Load a local torch checkpoint into a plain {name: tensor} dict.
    Accepts raw state dicts and the common ``{"state_dict"|"model": ...}``
    wrappers; strips ``module.`` (DataParallel) prefixes."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    return {k.removeprefix("module."): v for k, v in obj.items()}


def build_mapper(cfg) -> dict:
    """chunk -> global-channel-id mapper from config alone (no dataset IO).

    Counterpart of the reference's hard-coded CHAMMI channel maps
    (``trainer.py:128-150``); single-chunk datasets read the split dict out
    of ``data_chunk.chunks[0]``. Shared by the Trainer and offline
    consumers (``scripts/serve.py`` boots a ServingEngine from a checkpoint
    meta.json without any dataset on disk)."""
    name = cfg.dataset.name
    if name == "morphem70k":
        if len(cfg.dataset.in_channel_names) == 12:
            return {"Allen": [0, 1, 2], "HPA": [3, 4, 5, 6], "CP": [7, 8, 9, 10, 11]}
        return {"Allen": [5, 2, 6], "HPA": [3, 6, 5, 0], "CP": [5, 0, 7, 1, 4]}
    entry = cfg.data_chunk.chunks[0]
    entry = entry if isinstance(entry, dict) else entry.to_dict()
    first_chunk = next(iter(entry))
    return dict(entry[first_chunk])


class Trainer:
    def __init__(self, cfg):
        self.cfg = cfg
        self.debug = bool(cfg.train.get("debug", False))
        self.seed = int(_default(cfg.train.get("seed"), 1234))
        self.host_rng = set_seeds(self.seed)
        self.dataset_name = cfg.dataset.name
        self.logger = MyLogging(cfg) if jax.process_index() == 0 else DummyLogger()

        # -- mesh / precision --------------------------------------------
        mesh_cfg = cfg.hardware.get("mesh")
        mesh_cfg = mesh_cfg.to_dict() if hasattr(mesh_cfg, "to_dict") else mesh_cfg
        self.mesh = make_mesh(mesh_cfg)
        self.n_devices = self.mesh.devices.size
        dtype_name = cfg.train.get("dtype", "bfloat16")
        if cfg.train.get("use_amp", False):
            dtype_name = "bfloat16"  # AMP flag parity: bf16 compute on TPU
        self.dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
        from .ops.activations import set_gelu_exact
        from .ops.fused_block import set_fused_block

        set_gelu_exact(bool(cfg.model.get("gelu_exact", False)))
        set_fused_block(bool(cfg.model.get("fused_block", True)))
        from .ops.fused_block import set_quantization

        set_quantization(str(cfg.model.get("quantization", "none")))
        from .ops.attention import set_tp_attention

        if any(sz > 1 for ax, sz in dict(self.mesh.shape).items()
               if ax not in ("data", "dcn")):
            # tensor parallelism shards the dense GEMMs via GSPMD inside the
            # shard_map body, and GSPMD cannot partition Mosaic kernels.
            # The flash kernel stays on: it runs under an inner shard_map
            # over the model axis (heads are embarrassingly parallel —
            # ops/attention.py:set_tp_attention), falling back to XLA
            # attention per-call when heads don't divide tp. The fused MLP
            # stays on too ("mlp" mode): ln_mlp_sharded takes the Megatron
            # fc1/fc2 split inside its own inner shard_map with one psum
            # where the unfused path puts its fc2 all-reduce. Only
            # attend_project (weights in-kernel, unsharded) yields to the
            # unfused attention core.
            if cfg.model.get("fused_block", True):
                set_fused_block("mlp")
            set_tp_attention(self.mesh)
            self.logger.info(
                "non-data mesh axes active (model TP / expert EP): fused "
                "attention core off, fused MLP in sharded ('mlp') mode; "
                "flash attention runs per shard via an inner shard_map "
                "(XLA fallback when num_heads %% tp != 0)"
            )
        else:
            set_tp_attention(None)
        # ZeRO-1 optimizer-state sharding over the data axis
        # (parallel/zero.py); a no-op without a >1 data axis. ZeRO-3 adds
        # parameter sharding (persistent state -> (P+2P)/N) and implies the
        # zero1 moment sharding.
        data_gt1 = dict(self.mesh.shape).get("data", 1) > 1
        self.zero3 = bool(cfg.hardware.get("zero3", False)) and data_gt1
        self.zero1 = (
            bool(cfg.hardware.get("zero1", False)) or self.zero3
        ) and data_gt1

        # -- chunk -> channel-id mapper (trainer.py:128-150) ---------------
        self.all_chunks = []
        for entry in cfg.data_chunk.chunks:
            entry = entry if isinstance(entry, dict) else entry.to_dict()
            self.all_chunks.extend(entry.keys())
        self.mapper = self._build_mapper()

        # auto-size the eval batch to the accelerator's memory when unset
        # (reference trainer.py:93-105: 512 at 14 GB, scaled and rounded to
        # a power of 2; depthwise models cap at 128)
        if not cfg.eval.get("batch_size"):
            if "depthwise" not in str(cfg.model.name):
                mem_gb = 16.0
                try:
                    stats = jax.devices()[0].memory_stats() or {}
                    mem_gb = stats.get("bytes_limit", 16 << 30) / (1 << 30)
                except Exception:
                    pass
                ebs = 2 ** int(math.log2(max(int(512 * mem_gb / 14), 1)))
            else:
                ebs = 128
            try:
                cfg.eval.batch_size = ebs
            except Exception:
                pass

        # -- data ----------------------------------------------------------
        self.train_loaders: Dict[str, object] = {}
        self.val_loaders: Dict[str, object] = {}
        self.test_loaders: Dict[str, object] = {}
        self._build_dataset()

        # -- classes -------------------------------------------------------
        train_classes, _ = get_classes(
            self.dataset_name,
            cfg.dataset.get("file_name") or "",
            training_chunks=self._training_chunk_list(),
            root_dir=cfg.dataset.get("root_dir") or "",
        )
        if train_classes is None:
            self.num_classes = int(cfg.dataset.get("num_classes", 10))
        else:
            self.num_classes = len(train_classes)
        self.classes = train_classes

        # -- model ---------------------------------------------------------
        # the reference fills model.in_channel_names from the dataset at
        # runtime (main.py:32-33); YAML placeholders like "FILL_LATER" are
        # strings — len("FILL_LATER") silently sized the channel tables once,
        # so anything non-list counts as unset
        icn = cfg.model.get("in_channel_names")
        if not icn or isinstance(icn, str):
            cfg.model.in_channel_names = cfg.dataset.in_channel_names
        n_total = len(cfg.model.in_channel_names)
        max_id = max((max(ids) for ids in self.mapper.values() if len(ids)), default=0)
        if max_id >= n_total:
            raise ValueError(
                f"mapper channel id {max_id} out of range for "
                f"{n_total} in_channel_names — check dataset/model config"
            )
        attn_pooling = cfg.get("attn_pooling")
        if attn_pooling is not None and hasattr(attn_pooling, "to_dict"):
            attn_pooling = attn_pooling.to_dict()
        self.model = model_zoo.build_model(
            cfg.model.name, cfg.model, self.mapper, self.num_classes, dtype=self.dtype,
            attn_pooling=attn_pooling,
        )
        self.miro = bool(cfg.train.get("miro", False))
        self.miro_ld = float(cfg.train.get("miro_ld", 0.01) or 0.01)
        self.learnable_temp = bool(cfg.model.get("learnable_temp", False))
        self.temperature = float(cfg.model.get("temperature", 0.11111))
        self.extra_loss_lambda = float(cfg.train.get("extra_loss_lambda", 0.0) or 0.0)
        self.hcs_enabled = bool(cfg.model.get("enable_sample", False))
        self.hcs_method = cfg.model.get("hcs_sampling", "none") or "none"
        self.hcs_temp = float(cfg.model.get("hcs_sampling_temp", 0.1) or 0.1)
        # CHAMMI trains with the proxy loss, single-chunk classification with
        # CE on the head (trainer.py:156, :913, :994-999)
        self.loss_type = "proxy" if self.dataset_name in ("morphem70k",) else "ce"

        # -- schedules / optimizer ------------------------------------------
        train_iter = self.train_loaders[SHUFFLE_ALL if SHUFFLE_ALL in self.train_loaders else self.all_chunks[0]]
        self.updates_per_epoch = max(1, len(train_iter))
        self.total_epochs = int(cfg.train.num_epochs)
        total_steps = self.total_epochs * self.updates_per_epoch
        opt_params = cfg.optimizer.get("params", {})
        opt_params = opt_params.to_dict() if hasattr(opt_params, "to_dict") else dict(opt_params or {})
        base_lr = float(opt_params.get("lr", 1e-3))
        sched_params = cfg.scheduler.get("params", {})
        sched_params = sched_params.to_dict() if hasattr(sched_params, "to_dict") else dict(sched_params or {})
        self.lr_schedule = make_lr_schedule(
            cfg.scheduler.get("name", "none"),
            base_lr,
            sched_params,
            num_epochs=self.total_epochs,
            steps_per_epoch=self.updates_per_epoch,
            convert_to_batch=bool(cfg.scheduler.get("convert_to_batch", False)),
        )
        # SWA/SWAD (trainer.py:242-244, :810-812, :938-940, :957-959).
        # Cadence parity with the reference:
        # - plain SWA: AveragedModel.update_parameters once per EPOCH past
        #   swa_start; the main timm scheduler keeps stepping per batch, so
        #   SWALR's per-epoch lr write is overwritten on the next batch —
        #   the effective lr stays the base schedule.
        # - SWAD: update per BATCH past swa_start; the main scheduler is
        #   frozen (step_update skipped, trainer.py:938-940) and SWALR steps
        #   per batch, cosine-annealing from the frozen lr to swa_lr over
        #   its default anneal_epochs=10 steps, then constant.
        self.swa = bool(cfg.train.get("swa", False))
        self.swad = bool(cfg.train.get("swad", False))
        self.swa_start = int(cfg.train.get("swa_start", 5) or 5)
        if self.swad:
            base_sched = self.lr_schedule
            swa_lr = float(cfg.train.get("swa_lr", 0.05) or 0.05)
            # the loop runs epochs 1..num_epochs with updates past
            # `epoch > swa_start`, so the freeze boundary is the last step
            # of epoch swa_start
            swa_step0 = self.swa_start * self.updates_per_epoch
            anneal_steps = 10  # torch SWALR default anneal_epochs

            def swad_sched(step):
                # SWALR steps AFTER the optimizer step (trainer.py:957-959),
                # so batch `swa_step0 + t` trains at anneal(t), anneal(0)=0
                step = jnp.asarray(step)
                lr0 = base_sched(jnp.minimum(step, swa_step0 - 1))
                t = jnp.clip((step - swa_step0) / anneal_steps, 0.0, 1.0)
                alpha = 0.5 * (1.0 - jnp.cos(jnp.pi * t))  # SWALR cos anneal
                annealed = (1.0 - alpha) * base_sched(swa_step0 - 1) + alpha * swa_lr
                return jnp.where(step >= swa_step0, annealed, lr0)

            self.lr_schedule = swad_sched
        self.swa_params = None
        self.swa_n = 0
        self.channel_counter: Dict[int, int] = {}
        if int(cfg.train.get("adaptive_interface_epochs", 0) or 0) > 0:
            # parity: the reference raises the same (trainer.py:338-339)
            raise NotImplementedError("currently turn this off: 'adaptive_interface_epochs > 0'")
        self.tx = make_optimizer(
            cfg.optimizer.get("name", "adamw"),
            opt_params,
            lr_schedule=self.lr_schedule,
            total_steps=total_steps,
            clip_grad_norm=cfg.train.get("clip_grad_norm"),
        )
        if self.miro:
            # MIRO encoders train at lr * miro_lr_mult (trainer.py:1233-1239)
            import optax

            from .training.miro import MIRO_KEY

            mult = float(cfg.train.get("miro_lr_mult", 10.0) or 10.0)
            boosted = optax.chain(self.tx, optax.scale(mult))
            self.tx = optax.multi_transform(
                {"base": self.tx, "miro": boosted},
                lambda params: jax.tree_util.tree_map_with_path(
                    lambda p, _: "miro" if any(
                        getattr(k, "key", None) == MIRO_KEY for k in p
                    ) else "base",
                    params,
                ),
            )

        # -- state -----------------------------------------------------------
        chunk0 = self.all_chunks[0]
        cids0 = self._chunk_channel_ids(chunk0 if self.dataset_name == "morphem70k" else "train")
        img_size = int(cfg.dataset.get("img_size", 224))
        sample = jnp.zeros((2, len(cids0), img_size, img_size), jnp.float32)
        self.state = create_train_state(
            self.model,
            self.tx,
            rng=jax.random.key(self.seed),
            sample_input=sample,
            sample_channel_ids=jnp.asarray(cids0),
        )
        # pretrained ConvNeXt trunk from a LOCAL torch checkpoint — the
        # zero-egress stand-in for the reference's timm
        # ``create_model(pretrained=True)`` + ``intialize_first_conv_layer``
        # (``convnext_base.py:14-33``). ``model.pretrained`` may be a path
        # string, or True with ``model.pretrained_ckpt`` set.
        pre = cfg.model.get("pretrained")
        ckpt_path = pre if isinstance(pre, str) else (
            cfg.model.get("pretrained_ckpt") if pre else None
        )
        if ckpt_path and "convnext" in str(cfg.model.name):
            from .models.convnext import apply_pretrained_convnext

            sd = _load_torch_state_dict(ckpt_path)
            params = apply_pretrained_convnext(
                dict(self.state.params), sd, str(cfg.model.name),
                init_first_layer=cfg.model.get("init_first_layer"),
                mapper=self.mapper,
            )
            self.state = self.state.replace(
                params=params, opt_state=self.tx.init(params)
            )
            self.logger.info(f"loaded pretrained ConvNeXt weights from {ckpt_path}")
        elif ckpt_path:
            # warm start from a reference-trained torch checkpoint
            # (ChannelViT family): the migration counterpart of the
            # reference's own ``_load_model`` (``trainer.py:1308-1328``).
            # Matching leaves load; mismatched ones (e.g. a new task's
            # proxy/head width) keep their fresh init.
            from .models.import_torch import (load_reference_checkpoint,
                                              merge_into_template)

            imported, _ = load_reference_checkpoint(
                ckpt_path, scan_layout=bool(cfg.model.get("scan_blocks", False))
            )
            params, loaded, kept = merge_into_template(
                dict(self.state.params), imported
            )
            if not loaded:
                raise ValueError(
                    f"model.pretrained={ckpt_path}: no leaf of the torch "
                    f"checkpoint fits model {cfg.model.name!r} — wrong "
                    "model/geometry?"
                )
            self.state = self.state.replace(
                params=params, opt_state=self.tx.init(params)
            )
            msg = f"imported {len(loaded)} leaves from torch checkpoint {ckpt_path}"
            if kept:
                msg += f"; kept fresh init for {len(kept)}: {sorted(kept)[:6]}" + (
                    " ..." if len(kept) > 6 else ""
                )
            self.logger.info(msg)
        # selective training (model_utils.py:21-42 freeze helpers)
        freeze_other = bool(cfg.model.get("freeze_other", False))
        last_n = cfg.model.get("unfreeze_last_n_layers", -1)
        last_n = -1 if last_n is None else int(last_n)
        if freeze_other or last_n >= 0:
            from .training.freeze import build_trainable_labels, masked_optimizer

            labels = build_trainable_labels(
                self.state.params,
                freeze_other=freeze_other,
                unfreeze_last_n_layers=last_n,
                unfreeze_first_layer=bool(cfg.model.get("unfreeze_first_layer", True)),
            )
            self.tx = masked_optimizer(self.tx, labels, unfreeze_last_n_layers=max(0, last_n))
            self.state = self.state.replace(tx=self.tx, opt_state=self.tx.init(self.state.params))
        if self.n_devices > 1:
            if any(self.mesh.shape.get(ax, 1) > 1 for ax in ("model", "expert")):
                from .parallel import apply_param_shardings

                sharded = apply_param_shardings(self.state.params, self.mesh)
                self.state = self.state.replace(
                    params=sharded, opt_state=self.tx.init(sharded)
                )
            else:
                self.state = self.state.replace(
                    params=shard_params(self.state.params, self.mesh),
                    opt_state=shard_params(self.state.opt_state, self.mesh),
                )
            if self.zero3:
                from .parallel.zero import apply_zero3

                self.state = self.state.replace(
                    params=apply_zero3(self.state.params, self.mesh)
                )
            if self.zero1:
                from .parallel.zero import apply_zero1

                self.state = self.state.replace(
                    opt_state=apply_zero1(self.state.opt_state, self.mesh)
                )
        self.logger.info(f"model {cfg.model.name}: {param_count(self.state.params):,} params, "
                         f"{self.n_devices} devices, dtype {dtype_name}")
        self.miro_pre_params = None
        if self.miro:
            from .training.miro import MIRO_KEY, init_encoders

            # frozen copy of the init params = the reference's pre_featurizer.
            # Deep copy: the live state's buffers get donated by the train
            # step, which would invalidate an aliased snapshot.
            self.miro_pre_params = jax.tree_util.tree_map(jnp.copy, self.state.params)
            if self.n_devices > 1:
                # shard_map closure captures must be replicated over the
                # manual data axis (params may be zero3-sharded by now)
                self.miro_pre_params = shard_params(self.miro_pre_params, self.mesh)
            # per-tap VarianceEncoder biases (get_shapes equivalent), stored
            # beside the model tree so they checkpoint/optimize uniformly
            encoders = init_encoders(self.model, self.state.params, sample, jnp.asarray(cids0))
            params = dict(self.state.params)
            params[MIRO_KEY] = encoders
            self.state = self.state.replace(params=params, opt_state=self.tx.init(params))
            if self.n_devices > 1:
                self._place_state_on_mesh()  # fresh opt state: re-place (+ zero1)

        # -- step caches -----------------------------------------------------
        self._train_steps: Dict = {}
        self._grad_steps: Dict = {}
        self._apply_step = make_apply_step(mesh=self.mesh, zero1=self.zero1,
                                           zero3=self.zero3)
        self._eval_steps: Dict = {}

        # -- checkpoints -------------------------------------------------------
        self.checkpoints = os.path.join(
            cfg.train.get("checkpoints", "checkpoints"), self.dataset_name,
            time.strftime("%Y-%b-%d-%H-%M-%S") + f"--seed{self.seed}",
        )
        self.start_epoch = 1
        if cfg.train.get("resume_train") and cfg.train.get("resume_model"):
            self.state, last_epoch = load_checkpoint(
                os.path.dirname(cfg.train.resume_model), self.state,
                name=os.path.basename(cfg.train.resume_model),
            )
            self.start_epoch = last_epoch + 1
            self._place_state_on_mesh()
            self.logger.info(f"resumed from {cfg.train.resume_model} at epoch {last_epoch}")
        # preemption recovery (training/preemption.py): the regular run dirs
        # are timestamped, so the SIGTERM checkpoint lives at a stable
        # (dataset, seed) path that the next launch finds automatically
        self.preempt_dir = os.path.join(
            cfg.train.get("checkpoints", "checkpoints"), self.dataset_name,
            f"preempt--seed{self.seed}",
        )
        self._preempt_guard = None
        self._epoch_interrupted = False
        self._interrupted_at_batch = 0
        self._resume_start_batch = 0
        if (
            cfg.train.get("auto_resume", True)
            and self.start_epoch == 1
            and os.path.isdir(os.path.join(self.preempt_dir, "model_preempt"))
        ):
            self.state, last_epoch = load_checkpoint(
                self.preempt_dir, self.state, name="model_preempt"
            )
            self.start_epoch = last_epoch + 1
            meta = load_meta(self.preempt_dir, "model_preempt")
            # exact mid-epoch resume: re-enter the interrupted epoch at the
            # batch the SIGTERM landed on. Everything downstream is a pure
            # function of restored state: batch order = f(seed, epoch),
            # per-example augmentation rng = f(seed, epoch, index), step rng
            # = fold_in(base_rng, state.step), and the stateful host
            # generator (HCS k-draws, synthesis plans) restores its exact
            # bit-generator state — so preempt+resume is bit-identical to
            # the uninterrupted run.
            if (
                meta.get("resume_epoch") is not None
                and cfg.train.get("resume_mid_epoch", True)
            ):
                self.start_epoch = int(meta["resume_epoch"])
                self._resume_start_batch = int(meta.get("resume_batch", 0))
            if meta.get("host_rng_state") is not None:
                self.host_rng.bit_generator.state = meta["host_rng_state"]
            for c, n in (meta.get("channel_counter") or {}).items():
                self.channel_counter[int(c)] = int(n)
            if meta.get("swa_n"):
                swa = load_tree(self.preempt_dir, "model_preempt_swa",
                                self.state.params)
                if swa is not None:
                    if self.n_devices > 1:
                        swa = shard_params(swa, self.mesh)
                    self.swa_params, self.swa_n = swa, int(meta["swa_n"])
            self._place_state_on_mesh()
            mid = (
                f", re-entering epoch {self.start_epoch} at batch "
                f"{self._resume_start_batch}" if self._resume_start_batch else ""
            )
            self.logger.info(
                f"auto-resumed from preemption checkpoint at epoch {last_epoch}"
                f"{mid} ({self.preempt_dir})"
            )

    def _place_state_on_mesh(self):
        """Orbax-restored arrays come back *committed* to one device; re-apply
        the placement a fresh state gets (replicated, or TP param shardings —
        the TP regexes match mu/nu leaves too since they share param paths),
        else the jitted step sees incompatible committed devices."""
        if self.n_devices <= 1:
            return
        if any(self.mesh.shape.get(ax, 1) > 1 for ax in ("model", "expert")):
            from .parallel import apply_param_shardings

            params = apply_param_shardings(self.state.params, self.mesh)
            opt_state = apply_param_shardings(self.state.opt_state, self.mesh)
        else:
            params = shard_params(self.state.params, self.mesh)
            opt_state = shard_params(self.state.opt_state, self.mesh)
        if self.zero3:
            from .parallel.zero import apply_zero3

            params = apply_zero3(params, self.mesh)
        if self.zero1:
            from .parallel.zero import apply_zero1

            opt_state = apply_zero1(opt_state, self.mesh)
        aux = shard_params(
            {"step": self.state.step, "base_rng": self.state.base_rng}, self.mesh
        )
        self.state = self.state.replace(
            params=params, opt_state=opt_state,
            step=aux["step"], base_rng=aux["base_rng"],
        )

    # ------------------------------------------------------------------
    # setup helpers
    # ------------------------------------------------------------------

    def _build_mapper(self) -> dict:
        mapper = build_mapper(self.cfg)
        if self.dataset_name != "morphem70k":
            # single-chunk datasets train on the lone "train" split
            self.cfg.train.training_chunks = "train"
        return mapper

    def _training_chunk_list(self):
        tc = self.cfg.train.get("training_chunks")
        if tc in (None, "train"):
            return None
        return [c for c in str(tc).split("_") if c]

    def _chunk_channel_ids(self, chunk_or_split: str):
        return list(self.mapper[chunk_or_split])

    def _build_dataset(self):
        cfg = self.cfg
        num_hosts, host_id = jax.process_count(), jax.process_index()
        # CHAMMI feature extraction indexes features.npy by the FULL csv, so
        # its eval loaders replicate over hosts; accuracy-style evals stay
        # host-sharded and reduce (correct, total) via _reduce_eval_counts —
        # the torchmetrics-allreduce role (reference trainer.py:437-449)
        eval_hosts, eval_host = (
            (1, 0) if self.dataset_name == "morphem70k" else (num_hosts, host_id)
        )
        for chunk in self.all_chunks:
            tr, va, te = get_train_val_test_loaders(
                cfg, chunk, self.seed,
                num_hosts=num_hosts, host_id=host_id,
                eval_num_hosts=eval_hosts, eval_host_id=eval_host,
                tps_prob=cfg.train.get("tps_prob", 0.0) or 0.0,
            )
            self.train_loaders[chunk] = tr
            if va is not None:
                self.val_loaders[chunk] = va
            self.test_loaders[chunk] = te
        mixed = make_random_instance_train_loader(
            cfg, self.seed, num_hosts=num_hosts, host_id=host_id,
            training_chunks=self._training_chunk_list(),
        )
        if mixed is not None:
            self.train_loaders[SHUFFLE_ALL] = mixed

    # ------------------------------------------------------------------
    # step-fn caches (one compiled specialization per (chunk, k))
    # ------------------------------------------------------------------

    def _draw_k(self, c: int) -> Optional[int]:
        """HCS channel-count draw Cin_new ~ U[1, C] (``channel_vit.py:79-82``)."""
        if not self.hcs_enabled:
            return None
        return int(self.host_rng.integers(1, c + 1))

    def _get_train_step(self, channel_ids, k, chunk=None):
        key = (tuple(channel_ids), k, chunk)
        if key not in self._train_steps:
            from .models.wrappers import bind_chunk

            self._train_steps[key] = make_train_step(
                bind_chunk(self.model, chunk) if chunk else self.model,
                channel_ids=channel_ids,
                k=k,
                hcs_method=self.hcs_method,
                hcs_temp=self.hcs_temp,
                patch_size=int(self.cfg.model.get("patch_size", 16) or 16),
                loss_type=self.loss_type,
                extra_loss_lambda=self.extra_loss_lambda,
                learnable_temp=self.learnable_temp,
                temperature=self.temperature,
                miro_pre_params=self.miro_pre_params,
                miro_ld=self.miro_ld if self.miro else 0.0,
                augment_fn=self._device_augment_fn(),
                donate=bool(self.cfg.train.get("donate_state", True)),
                mesh=self.mesh,
                feature_fn=self._hcs_feature_fn(),
                zero1=self.zero1,
                zero3=self.zero3,
            )
        return self._train_steps[key]

    def _get_grad_step(self, channel_ids, k, chunk=None):
        key = (tuple(channel_ids), k, chunk)
        if key not in self._grad_steps:
            from .models.wrappers import bind_chunk

            self._grad_steps[key] = make_grad_step(
                bind_chunk(self.model, chunk) if chunk else self.model,
                channel_ids=channel_ids,
                k=k,
                hcs_method=self.hcs_method,
                hcs_temp=self.hcs_temp,
                patch_size=int(self.cfg.model.get("patch_size", 16) or 16),
                loss_type=self.loss_type,
                extra_loss_lambda=self.extra_loss_lambda,
                learnable_temp=self.learnable_temp,
                temperature=self.temperature,
                miro_pre_params=self.miro_pre_params,
                miro_ld=self.miro_ld if self.miro else 0.0,
                augment_fn=self._device_augment_fn(),
                mesh=self.mesh,
                feature_fn=self._hcs_feature_fn(),
            )
        return self._grad_steps[key]

    def _device_augment_fn(self):
        """On-device JUMP-CP augmentation when the loader ships raw crops."""
        if self.dataset_name != "jump_cp" or not self.cfg.train.get("device_augment", False):
            return None
        train_ds = self.train_loaders[self.all_chunks[0]].dataset
        if not getattr(train_ds, "device_augment", False):
            return None
        from .data.normalization import get_mean_std_dataset
        from .ops.augment import jumpcp_train_augment

        mean, std = get_mean_std_dataset("jump_cp")
        mean = jnp.asarray(mean, jnp.float32)
        std = jnp.asarray(std, jnp.float32)
        img_size = int(self.cfg.dataset.get("img_size", 224))

        def fn(key, imgs):
            return jumpcp_train_augment(key, imgs, mean, std, img_size=img_size)

        return fn

    def _hcs_feature_fn(self):
        """Frozen ResNet-34 channel scorer for ``hcs_sampling=*_resnet34``
        (``dichavit.py:68-79``, ``:162-167``): per-channel RGB-replicated
        embeddings feed the DCS cosine scoring inside the jitted step. The
        reference downloads timm's pretrained resnet34; on zero-egress
        hosts a local torchvision-layout checkpoint comes in through
        ``++model.resnet34_ckpt`` (random init + a loud log otherwise)."""
        if not (self.hcs_method or "").endswith("_resnet34"):
            return None
        if getattr(self, "_resnet34_fn", None) is None:
            from .models.resnet import (
                RESNET34_LAYERS,
                ResNetFeatures,
                load_torch_resnet_state,
                per_channel_features,
            )

            net = ResNetFeatures(layers=RESNET34_LAYERS, dtype=self.dtype)
            sample = jnp.zeros((1, 3, 32, 32), jnp.float32)
            rparams = jax.jit(lambda r: net.init(r, sample))(
                jax.random.key(self.seed))["params"]
            ckpt = self.cfg.model.get("resnet34_ckpt")
            if ckpt:
                rparams = load_torch_resnet_state(
                    rparams, _load_torch_state_dict(str(ckpt)))
                self.logger.info(f"hcs resnet34 scorer: weights from {ckpt}")
            else:
                self.logger.info(
                    "hcs resnet34 scorer: model.resnet34_ckpt unset — "
                    "random-init backbone (provide a local torchvision "
                    "resnet34 state dict for reference-equivalent sampling)"
                )

            def fn(x, _net=net, _p=rparams):
                return per_channel_features(
                    lambda im: _net.apply({"params": _p}, im), x)

            self._resnet34_fn = fn
        return self._resnet34_fn

    def _get_eval_step(self, chunk=None):
        if chunk not in self._eval_steps:
            from .models.wrappers import bind_chunk

            # Multi-host eval runs HOST-LOCAL (mesh=None): the accuracy eval
            # loaders stride the dataset per host and _reduce_eval_counts
            # allgather-sums the (correct, total) pairs — sharding each
            # host's different batch over the one global mesh would be
            # incoherent. Single-host keeps the mesh fast path.
            self._eval_steps[chunk] = make_eval_step(
                bind_chunk(self.model, chunk) if chunk else self.model,
                mesh=self.mesh if jax.process_count() == 1 else None,
            )
        return self._eval_steps[chunk]

    @property
    def _default_chunk(self):
        """Chunk identity to bind on the single-chunk (non-CHAMMI) paths.

        Chunk-identity models (SharedConvNeXt stems, SliceParam class
        embeddings) key on *mapper* chunk names — a CHAMMI concept. On
        single-chunk datasets the mapper keys are splits, and the dataset's
        chunk label ('synthetic', 'jump_cp_8', ...) is NOT a mapper key, so
        bind nothing and let chunk_name() fall back to the first mapper key."""
        return self.all_chunks[0] if self.dataset_name == "morphem70k" else None

    # kept for external callers (evaluation glue): chunk-agnostic default
    @property
    def _eval_step(self):
        return self._get_eval_step(self._default_chunk)

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def train(self):
        timer = Timer()
        best_acc = 0.0
        best_epoch = 0
        from .training.preemption import PreemptionGuard

        try:
            self._preempt_guard = PreemptionGuard().install()
        except ValueError:
            # signal.signal outside the main thread — run unguarded
            self._preempt_guard = PreemptionGuard()
        # optional JAX profiler trace of the first post-compile epoch
        # (SURVEY §5: the TPU answer to the reference's ad-hoc timers)
        profile_dir = self.cfg.train.get("profile_dir")
        if profile_dir:
            jax.profiler.start_trace(str(profile_dir))
        # pre-training evaluation (trainer.py:329-333)
        if (
            not self.debug
            and not self.cfg.eval.get("skip_eval_first_epoch", False)
            and not self.cfg.eval.get("only_eval_first_and_last", False)
            and self.start_epoch == 1
        ):
            eval0 = self.evaluate_model(0)
            self.logger.info({f"eval/{k}": v for k, v in eval0.items()} | {"epoch": 0},
                             pref_msg="[eval 0]")
        if not self.debug and not self.cfg.eval.get("skip_eval_first_epoch", False):
            pass  # reference evaluates before training only in some modes
        for epoch in range(self.start_epoch, self.total_epochs + 1):
            self._epoch_interrupted = False
            start_batch = self._resume_start_batch if epoch == self.start_epoch else 0
            train_metrics = self.train_one_epoch(epoch, start_batch=start_batch)
            if self._preempt_guard.triggered:
                # an interrupted epoch resumes EXACTLY where it stopped:
                # the checkpoint records (epoch, batch index) and the host
                # RNG state; the next launch re-enters the epoch at that
                # batch (loaders skip the prefix without fetching it), so
                # preempt+resume reproduces the uninterrupted run bit for
                # bit. ``++train.resume_mid_epoch=False`` restores the
                # simpler drop-partial-epoch behaviour.
                completed = epoch - 1 if self._epoch_interrupted else epoch
                self._save_preempt(
                    completed,
                    resume_epoch=epoch if self._epoch_interrupted else None,
                    resume_batch=self._interrupted_at_batch
                    if self._epoch_interrupted
                    else None,
                )
                wait_for_checkpoints()  # plus any in-flight async epoch save
                if profile_dir:
                    jax.profiler.stop_trace()
                self._preempt_guard.restore()
                self.logger.finish(
                    f"preempted during epoch {epoch}; checkpoint saved for auto-resume"
                )
                return best_acc
            self.logger.info({f"train/{k}": v for k, v in train_metrics.items()}
                             | {"epoch": epoch, "lr": float(self.lr_schedule(self.state.step))},
                             pref_msg=f"[epoch {epoch}/{self.total_epochs}]")
            if self.cfg.train.get("log_memory", False):
                # soak/production telemetry: device HBM (live + session
                # high-water) and host RSS, once per epoch
                mem = {}
                try:
                    stats = jax.local_devices()[0].memory_stats() or {}
                    for src, dst in (("bytes_in_use", "hbm_mb"),
                                     ("peak_bytes_in_use", "hbm_peak_mb")):
                        if src in stats:
                            mem[f"mem/{dst}"] = round(stats[src] / 2**20, 1)
                except Exception:
                    pass
                rss = _host_rss_gb()
                if rss is not None:
                    mem["mem/host_rss_mb"] = round(rss * 1024, 1)
                if mem:
                    self.logger.info(mem)
            if self.channel_counter:
                self.logger.info({f"channel_usage/{c}": n for c, n in sorted(self.channel_counter.items())})
            every_n = int(self.cfg.eval.get("every_n_epochs", 1) or 1)
            is_last = epoch == self.total_epochs
            if (epoch % every_n == 0 or is_last) and not (
                self.debug and self.cfg.eval.get("skip_eval_for_debug", False)
            ):
                if self.cfg.eval.get("only_eval_first_and_last", False) and not (
                    epoch == 1 or is_last
                ):
                    pass
                else:
                    eval_metrics = self.evaluate_model(epoch)
                    acc = eval_metrics.get("accuracy", 0.0)
                    if acc > best_acc:
                        best_acc, best_epoch = acc, epoch  # BestResult tracker
                    self.logger.info(
                        {f"eval/{k}": v for k, v in eval_metrics.items()} | {"epoch": epoch},
                        pref_msg=f"[eval {epoch}]",
                    )
            self._maybe_save(epoch, best_acc)
            self.logger.info(
                f"epoch {epoch} done in {timer.lap():.1f}s, ETA {timer.eta(epoch - self.start_epoch + 1, self.total_epochs - self.start_epoch + 1):.0f}s"
            )
            if self._should_recycle(epoch):
                # host-RSS watermark recycling (train.max_host_rss_gb —
                # SURVEY §5 failure detection, r4 soak finding): the axon
                # tunnel client retains host memory 1:1 with transferred
                # bytes and only a process exit releases it. The proven
                # preempt/auto-resume machinery makes recycling free: save
                # the stable-path checkpoint, re-exec this process, and the
                # relaunch resumes bit-identically at the next epoch.
                self._save_preempt(epoch)
                wait_for_checkpoints()
                if profile_dir:
                    jax.profiler.stop_trace()
                self._preempt_guard.restore()
                self.logger.finish(
                    f"host RSS over train.max_host_rss_gb after epoch "
                    f"{epoch} — recycling the process (auto-resume will "
                    f"continue at epoch {epoch + 1})"
                )
                self._reexec()
                return best_acc  # reached only when _reexec is stubbed
        if profile_dir:
            jax.profiler.stop_trace()
            self.logger.info(f"profiler trace written to {profile_dir}")
        if (self.swa or self.swad) and self.swa_params is not None:
            # adopt the averaged weights (trainer.py:1334-1336; no BN to refresh)
            self.state = self.state.replace(params=self.swa_params)
            self.logger.info(f"adopted SWA weights (averaged over {self.swa_n} updates)")
        self._preempt_guard.restore()
        wait_for_checkpoints()  # commit any in-flight async epoch saves
        if jax.process_index() == 0:
            # clean finish: the stable-path SIGTERM checkpoint must not
            # shadow the next fresh launch of this (dataset, seed)
            shutil.rmtree(self.preempt_dir, ignore_errors=True)
        self.logger.finish(f"training done: best_acc={best_acc:.4f} (epoch {best_epoch})")
        return best_acc

    def _should_recycle(self, epoch: int) -> bool:
        """True when host RSS exceeds ``train.max_host_rss_gb`` at this
        epoch boundary and recycling is safe: single-process (re-exec of
        one host would desync a multi-host job), auto_resume on (else the
        relaunch would start over), and not the final epoch."""
        cap = self.cfg.train.get("max_host_rss_gb")
        if not cap or epoch >= self.total_epochs or self.debug:
            return False
        if not self.cfg.train.get("auto_resume", True):
            return False
        if jax.process_count() > 1:
            if not getattr(self, "_warned_recycle_multihost", False):
                self._warned_recycle_multihost = True
                self.logger.info(
                    "train.max_host_rss_gb ignored: multi-host job (re-exec "
                    "of one process would desync the group)"
                )
            return False
        rss = _host_rss_gb()
        if rss is None or rss <= float(cap):
            return False
        self.logger.info(
            f"host RSS {rss:.2f} GB > train.max_host_rss_gb={float(cap):g}"
        )
        return True

    def _reexec(self):  # pragma: no cover — exercised via the stubbed test
        """Replace this process with a fresh launch of the same command.
        Flushes Python-side buffers first; the preemption checkpoint has
        already been committed by the caller."""
        sys.stdout.flush()
        sys.stderr.flush()
        os.execv(sys.executable, [sys.executable] + sys.argv)

    def _save_preempt(self, last_completed_epoch: int, *, resume_epoch=None,
                      resume_batch=None):
        """SIGTERM checkpoint to the stable preempt path (process 0 only);
        the next launch of the same (dataset, seed) auto-resumes from it.
        Alongside the TrainState, the sidecar records everything needed for
        EXACT mid-epoch continuation: the interruption point, the host RNG
        bit-generator state (HCS k-draws), the channel-usage counters, and
        the SWA running average when active."""
        if jax.process_index() != 0 or self.debug:
            return
        extra = {
            "resume_epoch": None if resume_epoch is None else int(resume_epoch),
            "resume_batch": None if resume_batch is None else int(resume_batch),
            "host_rng_state": self.host_rng.bit_generator.state,
            "channel_counter": {str(c): int(n) for c, n in self.channel_counter.items()},
            "swa_n": int(self.swa_n),
        }
        save_checkpoint(
            self.preempt_dir, self.state, epoch=max(int(last_completed_epoch), 0),
            config=self.cfg.to_dict() if hasattr(self.cfg, "to_dict") else None,
            name="model_preempt", extra_meta=extra,
        )
        if self.swa_params is not None:
            save_tree(self.preempt_dir, "model_preempt_swa", self.swa_params)
        where = (
            f"mid-epoch at (epoch {resume_epoch}, batch {resume_batch})"
            if resume_epoch is not None
            else f"last completed epoch {last_completed_epoch}"
        )
        self.logger.info(
            f"preemption checkpoint saved ({where}) -> {self.preempt_dir}"
        )

    def _swa_update(self):
        """AveragedModel.update_parameters equal-average (``trainer.py:810-812``)."""
        n = self.swa_n
        if self.swa_params is None:
            # deep copy — the live params' buffers are donated each step
            self.swa_params = jax.tree_util.tree_map(jnp.copy, self.state.params)
        else:
            self.swa_params = jax.tree_util.tree_map(
                lambda avg, p: avg + (p - avg) / (n + 1.0), self.swa_params, self.state.params
            )
        self.swa_n = n + 1

    def train_one_epoch(self, epoch: int, start_batch: int = 0) -> Dict[str, float]:
        self._cur_epoch = epoch
        loader_key = SHUFFLE_ALL if SHUFFLE_ALL in self.train_loaders else self.all_chunks[0]
        loader = self.train_loaders[loader_key]
        loader.set_epoch(epoch)
        from .data.loaders import prefetch

        # device transfer happens inside the prefetch thread so it overlaps
        # the running step — host->device bandwidth is the bottleneck on
        # tunneled/dev hosts (measured ~50 MB/s here; a 64x8x224^2 f32 batch
        # is 102 MB). Images ship in the compute dtype (bf16 halves bytes;
        # the model casts on entry anyway). start_batch > 0 re-enters a
        # preempted epoch at its interruption point (the loaders skip the
        # prefix without fetching it).
        host_iter = (
            loader.iter_batches(start_batch)
            if start_batch and hasattr(loader, "iter_batches")
            else iter(loader)
        )
        loader_iter = prefetch(map(self._to_device, host_iter), depth=2)
        meters: Dict[str, AverageMeter] = {}
        max_batches = 3 if self.debug else math.inf
        n_images = 0
        t_start = time.perf_counter()
        t_first_step_done = None  # exclude the first step (compile) from imgs/sec
        for i, batch in enumerate(loader_iter, start=start_batch):
            if i >= max_batches:
                break
            if self._preempt_guard is not None and self._preempt_guard.triggered:
                # step boundaries are the only safe interruption points —
                # a jitted step must run to completion. Batch i has not run
                # yet: the resumed epoch starts exactly here.
                self._epoch_interrupted = True
                self._interrupted_at_batch = i
                break
            if loader_key == SHUFFLE_ALL:
                metrics = self._train_one_batch_morphem(batch)
                n_images += sum(b["image"].shape[0] for b in batch.values())
            else:
                metrics = self._train_one_batch_regular(batch)
                n_images += batch["image"].shape[0]
            if t_first_step_done is None:
                t_first_step_done = time.perf_counter()
                n_warmup = n_images
            if self.swad and epoch > self.swa_start:
                # SWAD averages per batch (trainer.py:957-959)
                self._swa_update()
            for k, v in metrics.items():
                if k == "sampled_channels":
                    # HCS/DCS channel-usage histogram (trainer.py:796-804)
                    for c in np.asarray(v).ravel().tolist():
                        self.channel_counter[int(c)] = self.channel_counter.get(int(c), 0) + 1
                    continue
                meters.setdefault(k, AverageMeter(k)).update(float(v))
            if (i + 1) % int(self.cfg.train.get("verbose_batches", 50)) == 0:
                self.logger.info(
                    {k: round(m.avg, 5) for k, m in meters.items()},
                    pref_msg=f"  [e{epoch} b{i + 1}/{len(loader)}]",
                )
        if self.swa and not self.swad and epoch > self.swa_start:
            # plain SWA averages once per epoch (trainer.py:810-812)
            self._swa_update()
        self._log_pooling_weights()
        out = {k: m.avg for k, m in meters.items()}
        if t_first_step_done is not None and n_images > n_warmup:
            steady = time.perf_counter() - t_first_step_done
            if steady > 0:
                out["imgs_per_sec_per_chip"] = (
                    (n_images - n_warmup) / steady / max(self.n_devices, 1)
                )
        return out

    def _log_pooling_weights(self):
        """Depthwise models' per-channel pooling weights, once per epoch
        (reference ``trainer.py:816-820``). Covers the DepthwiseConvNeXt
        ``weighted_sum_pooling`` table(s) and DepthwiseViT's
        ``channel_weights``."""
        logged = {}

        def visit(path, leaf):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            tail = name.rsplit("/", 1)[-1]
            if tail.startswith("weighted_sum_pooling") or tail == "channel_weights":
                for i, w in enumerate(np.asarray(leaf).ravel().tolist()):
                    logged[f"weights/{tail}/w_{i}"] = round(float(w), 5)

        jax.tree_util.tree_map_with_path(visit, self.state.params)
        if logged:
            self.logger.info(logged)

    def _device_batch(self, batch):
        img = batch["image"]
        if self.dtype == jnp.bfloat16 and getattr(img, "dtype", None) == np.float32:
            img = img.astype(jnp.bfloat16)
        b = {"image": img, "label": batch["label"]}
        if self.n_devices > 1:
            return shard_batch(b, self.mesh)
        return jax.tree_util.tree_map(jnp.asarray, b)

    def _to_device(self, batch):
        """Move a (possibly per-chunk nested) host batch onto the device."""
        if "image" in batch:
            return self._device_batch(batch)
        return {k: self._device_batch(v) for k, v in batch.items()}

    def _train_one_batch_regular(self, batch) -> Dict[str, float]:
        cids = self._chunk_channel_ids("train")
        k = self._draw_k(len(cids))
        step = self._get_train_step(cids, k, chunk=self._default_chunk)
        rng = self.state.step_rng()
        self.state, metrics = step(self.state, batch, rng)
        # ONE host readback for the whole metrics dict: per-scalar float()
        # costs one tunnel round-trip each on remote-TPU hosts (measured
        # ~1 s/step of pure sync at 8 metrics on the axon tunnel)
        metrics = jax.device_get(metrics)
        return {
            k_: (v if k_ == "sampled_channels" else float(v))
            for k_, v in metrics.items()
        }

    def _train_one_batch_morphem(self, batch) -> Dict[str, float]:
        """Per-chunk grad microbatches + one update (``trainer.py:824-931``)."""
        grads = None
        out: Dict[str, float] = {}
        rng = self.state.step_rng()
        for ci, (chunk, sub) in enumerate(batch.items()):
            cids = self._chunk_channel_ids(chunk)
            k = self._draw_k(len(cids))
            gstep = self._get_grad_step(cids, k, chunk=chunk)
            g, metrics = gstep(self.state.params, sub, jax.random.fold_in(rng, ci))
            grads = g if grads is None else tree_add(grads, g)
            metrics = jax.device_get(metrics)  # one readback per microbatch
            for k_, v in metrics.items():
                if k_ == "sampled_channels":
                    # global channel ids from every chunk feed one counter
                    # (reference trainer.py:796-804 logs the mixed loader's)
                    prev = out.get("sampled_channels")
                    arr = np.asarray(v).ravel()
                    out["sampled_channels"] = (
                        arr if prev is None else np.concatenate([prev, arr])
                    )
                    continue
                out[f"{chunk}/{k_}"] = float(v)
        self.state, gnorm = self._apply_step(self.state, grads)
        out["grad_norm"] = float(gnorm)
        out["loss"] = sum(v for k_, v in out.items() if k_.endswith("/loss"))
        return out

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------

    def plot_attention(self, epoch: int) -> Optional[str]:
        """``train.plot_attn`` consumer: save the last layer's CLS-attention
        per channel as a figure + .npy for one eval batch. (The reference
        declares the flag, ``config.py:80``, but never consumes it; the
        materialization here uses the dense-capture path, vit.py
        ``attention_maps``.)"""
        from .models.vit import attention_maps

        loader = self._eval_loader_for("valid") or self._eval_loader_for("test")
        if loader is None:
            return None
        batch = next(iter(loader))
        x = jnp.asarray(batch["image"][:8])
        split = "valid" if self._eval_loader_for("valid") is not None else "test"
        cids = jnp.asarray(self._chunk_channel_ids(split if split in self.mapper else "train"))
        probs = attention_maps(self.model, self.state.params, x, cids)  # (B, H, N, N)
        cls_attn = np.asarray(probs[:, :, 0, 1:])  # (B, H, N-1)
        out_dir = os.path.join(self.checkpoints, "attn")
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, f"cls_attn_epoch{epoch}.npy"), cls_attn)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            c = len(cids)
            hw = cls_attn.shape[-1] // c
            side = int(math.sqrt(hw))
            mean_attn = cls_attn.mean(axis=(0, 1)).reshape(c, side, side)
            fig, axes = plt.subplots(1, c, figsize=(2.2 * c, 2.4))
            for ci, ax in enumerate(np.atleast_1d(axes)):
                ax.imshow(mean_attn[ci])
                ax.set_title(f"ch {int(cids[ci])}", fontsize=8)
                ax.axis("off")
            path = os.path.join(out_dir, f"cls_attn_epoch{epoch}.png")
            fig.tight_layout()
            fig.savefig(path, dpi=110)
            plt.close(fig)
            return path
        except Exception as e:
            self.logger.info(f"plot_attn figure failed: {e}")
            return None

    def evaluate_model(self, epoch: int) -> Dict[str, float]:
        if self.cfg.train.get("plot_attn", False):
            try:
                self.plot_attention(epoch)
            except Exception as e:  # diagnostics never fail the run
                self.logger.info(f"plot_attn failed: {e}")
        if self.dataset_name == "morphem70k":
            from .evaluation.morphem_eval import eval_morphem70k

            # loop novel-channel strategies when training on a chunk subset
            # (trainer.py:547-560)
            tc = self.cfg.train.get("training_chunks")
            ncis = list(self.cfg.model.get("new_channel_inits") or [None])
            if tc in (None, "train") or set(str(tc).split("_")) >= set(self.all_chunks):
                ncis = [None]
            results: Dict[str, float] = {}
            for nci in ncis:
                res = eval_morphem70k(self, epoch, new_channel_init=nci)
                prefix = "" if nci is None else f"{nci}/"
                results.update({f"{prefix}{k}": v for k, v in res.items()})
            if "accuracy" not in results and ncis and ncis[0] is not None:
                first = results.get(f"{ncis[0]}/accuracy")
                if first is not None:
                    results["accuracy"] = first
            return results
        results = self.eval_regular(epoch)
        if self.cfg.eval.get("eval_subset_channels", False):
            results.update(self.eval_subset_channels())
        return results

    # per-channel parameter table used for novel-channel synthesis
    # (reference: channel_vit.py:89-136 on channel_embed, hyper_vit.py:169-233
    # on z embeddings, depthwise_convnext.py:200-295 on the depthwise bank)
    OVERRIDE_TABLES = {
        "dichavit": ("channel_embed",),
        "channelvit_adapt": ("channel_embed",),
        "depthwisevit_adapt": ("channel_embed",),
        "hypervit_adapt": ("conv1_emb",),
        "templatemixingvit": ("conv1_coefs",),
        "hyperconvnext": ("conv1_emb",),
        "templatemixingconvnext": ("conv1_coefs",),
        "depthwiseconvnext": ("conv1depthwise_param_bank",),
    }

    def _synthesis_override(self, split: str, new_channel_init):
        """Build the (C, ...) per-channel override for a LOO strategy, or
        None when the model has no synthesizable table / strategy is None."""
        if new_channel_init in (None, "as_is"):
            return None
        keys = self.OVERRIDE_TABLES.get(self.cfg.model.name)
        if keys is None:
            return None
        from .ops.novel_channels import synthesis_plan, synthesize_rows

        table = self.state.params["backbone"]
        for k in keys:
            table = table[k]
        if self.cfg.model.name == "depthwiseconvnext":
            kpc = int(self.cfg.model.get("kernels_per_channel") or 64)
            table = table.reshape(-1, kpc, 3, 3)
        training_chunks = self.cfg.train.get("training_chunks") or "train"
        plan = synthesis_plan(self.mapper, split, training_chunks, str(new_channel_init),
                              rng=self.host_rng)
        return synthesize_rows(table, plan)

    def _dynamic_bank(self):
        """Exemplar bank for DYNAMIC_INPUT_CORR_* synthesis: (A, C_train, H, W)
        images of the training channels, drawn from the first train batch
        (the reference expects ``self.bank`` provided externally,
        ``channel_vit_adapt.py:154-156``; building it from training data is
        the natural in-framework source)."""
        if getattr(self, "_dyn_bank", None) is not None:
            return self._dyn_bank
        from .ops.novel_channels import flatten_training_channels

        training_chunks = self.cfg.train.get("training_chunks") or "train"
        first_chunk = training_chunks.split("_")[0]
        loader = self.train_loaders.get(first_chunk) or next(iter(self.train_loaders.values()))
        if hasattr(loader, "loaders"):  # MixedChunkLoader
            loader = loader.loaders[first_chunk]
        batch = next(iter(loader))
        imgs = np.asarray(batch["image"])[:8]  # up to 8 exemplars
        # the bank's channel axis must align 1:1 with the training-channel
        # list; loaders already select exactly those channels, but guard
        # against wider images (e.g. full-channel debug loaders)
        n_train = len(flatten_training_channels(
            self.mapper, self.cfg.train.get("training_chunks") or "train"
        ))
        if imgs.shape[1] > n_train:
            imgs = imgs[:, :n_train]
        self._dyn_bank = jnp.asarray(imgs)
        return self._dyn_bank

    def _dynamic_override_for_batch(self, split: str, strategy: str, x: jax.Array):
        """Per-sample (B, C, D) override for dynamic_input_corr_{1..6}."""
        from .ops.novel_channels import dynamic_input_corr, flatten_training_channels

        variant = int(str(strategy)[-1])
        training_chunks = self.cfg.train.get("training_chunks") or "train"
        training_channels = flatten_training_channels(self.mapper, training_chunks)
        ce = self.state.params["backbone"]["channel_embed"]
        bank = self._dynamic_bank()
        b = x.shape[0]
        rows = []
        proj_fn = None
        if variant in (5, 6):
            kern = self.state.params["backbone"]["proj_kernel"]
            p = int(self.cfg.model.get("patch_size", 16) or 16)
            from .ops.patch_embed import per_channel_patch_embed

            proj_fn = lambda xx: per_channel_patch_embed(xx, kern, None, patch_size=p)
        for i, c in enumerate(self._chunk_channel_ids(split)):
            if c in training_channels:
                rows.append(jnp.broadcast_to(ce[c], (b, ce.shape[1])))
            else:
                rows.append(dynamic_input_corr(
                    variant, x, i, bank, ce, training_channels, proj_fn=proj_fn
                ))
        return jnp.stack(rows, axis=1)  # (B, C, D)

    def eval_regular(self, epoch: int) -> Dict[str, float]:
        """Accuracy per eval split x novel-channel init (``trainer.py:386-472``):
        splits whose channels match train run once; others run once per
        strategy in ``model.new_channel_inits`` with synthesized embeddings."""
        results: Dict[str, float] = {}
        ncis = list(self.cfg.model.get("new_channel_inits") or [None])
        splits = [s for s in self.mapper if s != "train"]
        for split in splits:
            loader = self._eval_loader_for(split)
            if loader is None:
                continue
            for i, nci in enumerate(ncis):
                if i > 0 and list(self.mapper["train"]) == list(self.mapper[split]):
                    break
                if split == "valid":
                    nci = None  # single pass for validation (trainer.py:466)
                acc = self._eval_split(split, loader, nci)
                key = f"{split}/accuracy" if nci is None else f"{split}/{nci}/accuracy"
                results[key] = acc
                if split == "valid":
                    break
        if results:
            results["accuracy"] = float(np.mean(list(results.values())))
        return results

    def _eval_loader_for(self, split: str):
        if split == "valid":
            return next(iter(self.val_loaders.values()), None)
        for loader in self.test_loaders.values():
            if isinstance(loader, dict):
                if split in loader:
                    return loader[split]
            elif split.startswith("test"):
                return loader
        return None

    def _eval_split(self, split: str, loader, new_channel_init) -> float:
        cids = jnp.asarray(self._chunk_channel_ids(split) if split in self.mapper
                           else self._chunk_channel_ids("train"))
        dynamic = str(new_channel_init).startswith("dynamic_input_corr")
        override = None if dynamic else self._synthesis_override(split, new_channel_init)
        eval_step = self._get_eval_step(self._default_chunk)
        max_batches = 3 if self.debug else math.inf
        correct, total = 0, 0
        for i, batch in enumerate(loader):
            if i >= max_batches:
                break
            x = jnp.asarray(batch["image"])
            if dynamic:
                override = self._dynamic_override_for_batch(split, new_channel_init, x)
            out = eval_step(self.state.params, x, cids, override)
            if self.loss_type == "proxy":
                scale = model_scale(self.state.params, self.learnable_temp, self.temperature)
                logits = proxy_logits(self.state.params["proxies"], out, scale)
            else:
                logits = out
            pred = np.asarray(jnp.argmax(logits, axis=-1))
            valid = batch.get("valid", np.ones(len(pred), bool))
            correct += int(((pred == batch["label"]) & valid).sum())
            total += int(valid.sum())
        correct, total = self._reduce_eval_counts(correct, total)
        return correct / max(total, 1)

    @staticmethod
    def _reduce_eval_counts(correct: int, total: int):
        """Sum host-local (correct, total) across all hosts — eval loaders
        stride the dataset per host, so the global accuracy needs the global
        counts (the reference's torchmetrics allreduce, trainer.py:437-449)."""
        if jax.process_count() == 1:
            return correct, total
        from jax.experimental import multihost_utils

        counts = multihost_utils.process_allgather(np.asarray([correct, total]))
        summed = counts.sum(axis=0)
        return int(summed[0]), int(summed[1])

    def eval_subset_channels(self, max_subsets: Optional[int] = None) -> Dict[str, float]:
        """Channel-robustness sweep: accuracy over C-choose-n channel subsets
        for n = C..1 (``trainer.py:475-545``; the reference breaks after the
        first n below C — reproduced via ``break`` below)."""
        import itertools

        results: Dict[str, float] = {}
        split = next((s for s in self.mapper if s.startswith("test")), "test")
        loader = self._eval_loader_for(split)
        if loader is None:
            return results
        full = self._chunk_channel_ids(split if split in self.mapper else "train")
        eval_step = self._get_eval_step(self._default_chunk)
        max_batches = 3 if self.debug else math.inf
        c = len(full)
        for n in range(c, 0, -1):
            accs = []
            combos = list(itertools.combinations(range(c), n))
            if max_subsets:
                combos = combos[:max_subsets]
            for combo in combos:
                cids = jnp.asarray([full[i] for i in combo])
                correct, total = 0, 0
                for i, batch in enumerate(loader):
                    if i >= max_batches:
                        break
                    x = jnp.asarray(batch["image"])[:, list(combo)]
                    out = eval_step(self.state.params, x, cids)
                    logits = out if self.loss_type != "proxy" else proxy_logits(
                        self.state.params["proxies"], out,
                        model_scale(self.state.params, self.learnable_temp, self.temperature),
                    )
                    pred = np.asarray(jnp.argmax(logits, axis=-1))
                    valid = batch.get("valid", np.ones(len(pred), bool))
                    correct += int(((pred == batch["label"]) & valid).sum())
                    total += int(valid.sum())
                correct, total = self._reduce_eval_counts(correct, total)
                accs.append(correct / max(total, 1))
            results[f"subset_{n}/mean"] = float(np.mean(accs))
            results[f"subset_{n}/std"] = float(np.std(accs))
            if n < c:
                break  # trainer.py:540
        return results

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------

    def _maybe_save(self, epoch: int, accuracy: float):
        if jax.process_index() != 0 or self.debug:
            return
        policy = self.cfg.train.get("save_model", "last")
        if policy in (None, "none", "~"):
            return
        if policy == "best":
            # parity: the reference raises too (trainer.py:364-365)
            raise NotImplementedError("save_model='best' not implemented yet")
        if policy == "last" and epoch != self.total_epochs:
            return
        if isinstance(policy, str) and policy.startswith("every"):
            n = int(policy.split("-")[-1]) if "-" in policy else 1
            if epoch % n != 0 and epoch != self.total_epochs:
                return
        name = "model_last" if policy == "last" else f"model_epoch{epoch}"
        save_checkpoint(
            self.checkpoints, self.state, epoch=epoch, accuracy=accuracy,
            config=self.cfg.to_dict() if hasattr(self.cfg, "to_dict") else None,
            name=name,
            # async: the save returns once the arrays are copied off-device
            # (donation-safe) and commits on a background thread while the
            # next epoch trains; train() waits before finishing
            wait=not bool(self.cfg.train.get("async_checkpoint", False)),
        )
