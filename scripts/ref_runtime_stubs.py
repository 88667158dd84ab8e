"""Functional third-party stubs to run the reference Trainer END-TO-END.

`tests/ref_stubs.py` installs inert import-time stubs scoped to a single
module import (enough for transplant/golden tests). Running the reference's
own ``Trainer.train()`` (``/root/reference/trainer.py:326-383``) needs the
stubbed surface to actually WORK at runtime:

- ``omegaconf``       OmegaConf.update/to_yaml/to_container + ListConfig
- ``timm.scheduler``  CosineLR/MultiStepLR shims delegating to this repo's
                      timm-parity schedule functions (value parity with the
                      real timm is pinned in tests/test_training.py)
- ``timm.optim``      AdamW == torch.optim.AdamW (the reference's timm AdamW
                      is the same decoupled update — tests/test_trajectory_parity.py)
- ``torchvision``     ToTensor/Normalize/Compose/… on torch tensors
- ``skimage.io``      imread via PIL
- ``faiss``           brute-force IndexFlatL2/IndexFlatIP (numpy)
- ``wandb``/``torchmetrics``/``umap`` inert (config keeps them off)

Everything here is import-side machinery for the PARITY HARNESS; it is not
part of the shipped framework.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REF = "/root/reference"


# ---------------------------------------------------------------------------
# attr-style config (the OmegaConf role for MyConfig trees)
# ---------------------------------------------------------------------------


class RefCfg(dict):
    """dict with attribute get/set — what the reference reads cfg as."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            return None

    def __setattr__(self, k, v):
        self[k] = v

    def get(self, k, default=None):  # OmegaConf .get parity
        return dict.get(self, k, default)

    def __deepcopy__(self, memo):
        import copy

        return RefCfg({k: copy.deepcopy(v, memo) for k, v in self.items()})


def _cfg(d):
    return RefCfg({k: (_cfg(v) if isinstance(v, dict) else v) for k, v in d.items()})


# ---------------------------------------------------------------------------
# stub modules
# ---------------------------------------------------------------------------


def _mk_omegaconf():
    om = types.ModuleType("omegaconf")

    class ListConfig(list):
        pass

    class OmegaConf:
        @staticmethod
        def update(cfg, path, value, force_add=False):
            parts = path.split(".")
            node = cfg
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = value

        @staticmethod
        def to_yaml(cfg, resolve=False):
            import pprint

            return pprint.pformat(cfg)

        @staticmethod
        def to_container(cfg, resolve=False):
            def conv(x):
                if isinstance(x, dict):
                    return {k: conv(v) for k, v in x.items()}
                if isinstance(x, (list, tuple)):
                    return [conv(v) for v in x]
                return x

            return conv(cfg)

    om.MISSING = "???"
    om.OmegaConf = OmegaConf
    om.ListConfig = ListConfig
    om.DictConfig = RefCfg
    return {"omegaconf": om}


def _mk_wandb():
    wb = types.ModuleType("wandb")

    def _noop(*a, **k):
        return None

    for name in ("init", "login", "log", "watch", "save", "finish"):
        setattr(wb, name, _noop)
    wb.Settings = lambda *a, **k: None
    wb.Table = lambda *a, **k: None
    wb.Image = lambda *a, **k: None
    wb.run = None
    wb.config = types.SimpleNamespace(update=_noop)
    de = types.ModuleType("dotenv")
    de.load_dotenv = _noop
    return {"wandb": wb, "dotenv": de}


def _mk_torchmetrics():
    tm = types.ModuleType("torchmetrics")
    cls = types.ModuleType("torchmetrics.classification")

    class Accuracy:  # only reached under DDP, which the harness never uses
        def __init__(self, *a, **k):
            raise NotImplementedError("torchmetrics stub: DDP-only path")

    cls.Accuracy = Accuracy
    tm.classification = cls
    return {"torchmetrics": tm, "torchmetrics.classification": cls}


def _mk_timm():
    """timm.scheduler shims with the reference trainer's calling convention:
    ``step(epoch)`` pre-epoch (t_in_epochs) / ``step_update(n)`` post-update
    (``trainer.py:346-348``, ``:939``). Values come from this repo's
    timm-parity schedule functions evaluated at raw ``t`` (``t_in_epochs=
    False, steps_per_epoch=1`` turns them into plain ``t -> value`` maps)."""
    sys.path.insert(0, "/root/repo")
    from diverse_channel_vit_tpu.training.schedules import (
        timm_cosine_schedule, timm_multistep_schedule)

    _DROP = ("noise_range_t", "noise_pct", "noise_std", "noise_seed", "initialize")

    class _Sched:
        def __init__(self, optimizer, value_fn, t_in_epochs):
            self.optimizer = optimizer
            self._fn = value_fn
            self._t_in_epochs = t_in_epochs
            # timm initialize=True: param groups start at value(0)
            # (warmup_lr_init when warmup_t > 0, else base)
            self._write(0)

        def _write(self, t):
            v = float(self._fn(int(t)))
            for g in self.optimizer.param_groups:
                g["lr"] = v

        def step(self, epoch, metric=None):
            if self._t_in_epochs:
                self._write(epoch)

        def step_update(self, num_updates, metric=None):
            if not self._t_in_epochs:
                self._write(num_updates)

        def state_dict(self):
            return {}

        def load_state_dict(self, sd):
            pass

    class CosineLRScheduler(_Sched):
        def __init__(self, optimizer, **cfg):
            cfg = {k: v for k, v in cfg.items() if k not in _DROP and v is not None}
            t_in_epochs = bool(cfg.pop("t_in_epochs", True))
            base_lr = optimizer.param_groups[0]["lr"]
            fn = timm_cosine_schedule(base_lr, t_in_epochs=False,
                                      steps_per_epoch=1, **cfg)
            super().__init__(optimizer, fn, t_in_epochs)

    class MultiStepLRScheduler(_Sched):
        def __init__(self, optimizer, **cfg):
            cfg = {k: v for k, v in cfg.items() if k not in _DROP and v is not None}
            t_in_epochs = bool(cfg.pop("t_in_epochs", True))
            base_lr = optimizer.param_groups[0]["lr"]
            fn = timm_multistep_schedule(base_lr, t_in_epochs=False,
                                         steps_per_epoch=1, **cfg)
            super().__init__(optimizer, fn, t_in_epochs)

    class PlateauLRScheduler:
        def __init__(self, *a, **k):
            raise NotImplementedError

    timm = types.ModuleType("timm")
    sched = types.ModuleType("timm.scheduler")
    sched.CosineLRScheduler = CosineLRScheduler
    sched.MultiStepLRScheduler = MultiStepLRScheduler
    sched.PlateauLRScheduler = PlateauLRScheduler
    opt = types.ModuleType("timm.optim")
    import torch

    opt.AdamW = torch.optim.AdamW  # timm's AdamW is the same decoupled update

    class AdamP:
        def __init__(self, *a, **k):
            raise NotImplementedError("AdamP not exercised by the harness")

    opt.AdamP = AdamP
    tmods = types.ModuleType("timm.models")
    tmods.ConvNeXt = type("ConvNeXt", (), {})

    def create_model(*a, **k):
        raise NotImplementedError("timm stub: no pretrained models offline")

    timm.create_model = create_model
    timm.scheduler = sched
    timm.optim = opt
    timm.models = tmods
    return {"timm": timm, "timm.scheduler": sched, "timm.optim": opt,
            "timm.models": tmods}


def _mk_torchvision():
    import torch

    tv = types.ModuleType("torchvision")
    tfm = types.ModuleType("torchvision.transforms")

    class ToTensor:
        """HWC ndarray -> CHW float tensor, /255 for uint8 (torchvision)."""

        def __call__(self, pic):
            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
            if arr.dtype == np.uint8:
                return t.float().div(255.0)
            return t.float()

    class Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean = torch.tensor(mean, dtype=torch.float32).view(-1, 1, 1)
            self.std = torch.tensor(std, dtype=torch.float32).view(-1, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    class Compose:
        def __init__(self, ts):
            self.transforms = ts

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class Lambda:
        def __init__(self, fn):
            self.fn = fn

        def __call__(self, x):
            return self.fn(x)

    class _ExactSize:
        """Identity when the image is already at the target size — the
        harness runs the fixture at its native resolution so the eval
        Resize/CenterCrop are no-ops; anything else would silently diverge
        from torchvision, so raise instead."""

        def __init__(self, size, *a, **k):
            self.size = size if isinstance(size, int) else size[0]

        def __call__(self, t):
            if t.shape[-1] == self.size and t.shape[-2] == self.size:
                return t
            raise NotImplementedError(
                f"torchvision stub: got {tuple(t.shape)}, expected side "
                f"{self.size}; run the fixture at native resolution")

    class Resize(_ExactSize):
        pass

    class CenterCrop(_ExactSize):
        pass

    class _TrainOnly:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            raise NotImplementedError(
                "torchvision stub: stochastic transforms must be patched out "
                "(the harness forces eval-style transforms for parity)")

    class RandomResizedCrop(_TrainOnly):
        pass

    class RandomHorizontalFlip(_TrainOnly):
        pass

    for cls in (ToTensor, Normalize, Compose, Lambda, Resize, CenterCrop,
                RandomResizedCrop, RandomHorizontalFlip):
        setattr(tfm, cls.__name__, cls)
    tfm.transforms = tfm  # `from torchvision.transforms import transforms`
    tv.transforms = tfm
    tv.datasets = types.SimpleNamespace()
    tv.utils = types.SimpleNamespace()
    tv.models = types.SimpleNamespace()
    return {"torchvision": tv, "torchvision.transforms": tfm}


def _mk_skimage():
    sk = types.ModuleType("skimage")
    io = types.ModuleType("skimage.io")

    def imread(path):
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im)

    io.imread = imread
    sk.io = io
    return {"skimage": sk, "skimage.io": io}


def _mk_faiss():
    fa = types.ModuleType("faiss")

    class _Flat:
        def __init__(self, d):
            self.d = d
            self._x = None

        def add(self, X):
            X = np.asarray(X, np.float32)
            self._x = X if self._x is None else np.concatenate([self._x, X])

        def _search(self, Q, k, score):  # higher score = better
            idx = np.argsort(-score, axis=1, kind="stable")[:, :k]
            return np.take_along_axis(score, idx, axis=1), idx

    class IndexFlatL2(_Flat):
        def search(self, Q, k):
            Q = np.asarray(Q, np.float32)
            d2 = (np.sum(Q**2, 1, keepdims=True) - 2 * Q @ self._x.T
                  + np.sum(self._x**2, 1))
            s, i = self._search(Q, k, -d2)
            return -s, i

    class IndexFlatIP(_Flat):
        def search(self, Q, k):
            Q = np.asarray(Q, np.float32)
            return self._search(Q, k, Q @ self._x.T)

    class StandardGpuResources:
        def __init__(self, *a, **k):
            raise NotImplementedError("faiss stub is CPU-only")

    fa.IndexFlatL2 = IndexFlatL2
    fa.IndexFlatIP = IndexFlatIP
    fa.StandardGpuResources = StandardGpuResources
    return {"faiss": fa}


def _mk_albumentations():
    def _unavailable(*a, **k):
        raise NotImplementedError("albumentations stub: jump_cp-only path")

    class _Lazy(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):  # keep module introspection sane
                raise AttributeError(name)
            return _unavailable

    al = _Lazy("albumentations")
    pt = types.ModuleType("albumentations.pytorch")
    pt.ToTensorV2 = _unavailable
    al.pytorch = pt
    return {"albumentations": al, "albumentations.pytorch": pt}


def _mk_umap():
    um = types.ModuleType("umap")

    class UMAP:
        def __init__(self, *a, **k):
            raise NotImplementedError("umap stub: keep eval.umap=False")

    um.UMAP = UMAP
    return {"umap": um}


def install():
    """Install every stub + the reference package anchors; returns the list
    of sys.modules names added (for optional cleanup). Idempotent per name:
    already-present real libraries are never overwritten."""
    import os

    os.environ.setdefault("MPLBACKEND", "Agg")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    added = []
    mods = {}
    for mk in (_mk_omegaconf, _mk_wandb, _mk_torchmetrics, _mk_timm,
               _mk_torchvision, _mk_skimage, _mk_faiss, _mk_albumentations,
               _mk_umap):
        mods.update(mk())
    for name, mod in mods.items():
        if name not in sys.modules:
            sys.modules[name] = mod
            added.append(name)
    # package anchors that must NOT run their __init__ (models imports timm
    # eagerly at package level)
    for pkg in ("models", "datasets"):
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            mod.__path__ = [f"{REF}/{pkg}"]
            sys.modules[pkg] = mod
            added.append(pkg)
    return added
