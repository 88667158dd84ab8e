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

    # Fail loudly when the mapper's global channel ids overflow the
    # per-channel parameter tables (sized by len(in_channel_names)). The
    # Trainer validates this too (trainer.py:205-214), but direct
    # build_model consumers that skip the dataset->model name sync would
    # otherwise train on jnp.take's silent out-of-bounds NaN fill.
    icn = cfg_model.get("in_channel_names") if hasattr(cfg_model, "get") else None
    if isinstance(icn, str):
        # yaml placeholder ("FILL_LATER") — len(str) would silently size
        # the tables to the character count
        raise ValueError(
            "model.in_channel_names is the unset yaml placeholder "
            f"{icn!r}; sync it from the dataset first "
            "(cfg.model.in_channel_names = cfg.dataset.in_channel_names, "
            "as the Trainer does at trainer.py:205)"
        )
    if isinstance(icn, (list, tuple)) and mapper:
        max_id = max((max(ids) for ids in mapper.values() if len(ids)), default=0)
        if max_id >= len(icn):
            raise ValueError(
                f"mapper channel id {max_id} out of range for {len(icn)} "
                "model.in_channel_names — sync model.in_channel_names from "
                "the dataset (see trainer.py:205)"
            )
    return fn(cfg_model, mapper, num_classes, dtype=dtype, **kwargs)
