"""Model registry.

Counterpart of ``models/__init__.py`` in the reference, which exports 12
factories resolved by name via ``getattr(models, cfg.model.name)``
(``trainer.py:1164``).
"""

from __future__ import annotations

from typing import Callable, Dict

MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def wrap(fn: Callable) -> Callable:
        MODEL_REGISTRY[name] = fn
        return fn

    return wrap


def build_model(name: str, cfg_model, mapper: dict, num_classes: int, dtype, **extra):
    if name not in MODEL_REGISTRY:
        raise KeyError(f"Unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    import inspect

    fn = MODEL_REGISTRY[name]
    accepted = inspect.signature(fn).parameters
    kwargs = {k: v for k, v in extra.items() if k in accepted}
    return fn(cfg_model, mapper, num_classes, dtype=dtype, **kwargs)
