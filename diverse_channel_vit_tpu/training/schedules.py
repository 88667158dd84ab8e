"""LR / weight-decay schedules with timm-parity semantics.

The reference drives timm's ``CosineLRScheduler`` / ``MultiStepLRScheduler``
(``lr_schedulers.py:4-13``) stepped per-epoch and per-update
(``trainer.py:348``, :939), plus a numpy cosine weight-decay table
(``utils.py:563-573``, applied at ``trainer.py:940-948``). Here every
schedule is a pure function of the *global step* — the natural unit under
jit — with the epoch-granularity behaviour (``t_in_epochs``) reproduced by
flooring step/steps_per_epoch.
"""

from __future__ import annotations

import math
from typing import Callable, Dict

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def timm_cosine_schedule(
    base_lr: float,
    *,
    t_initial: int,
    lr_min: float = 0.0,
    cycle_mul: float = 1.0,
    cycle_decay: float = 1.0,
    cycle_limit: int = 1,
    warmup_t: int = 0,
    warmup_lr_init: float = 0.0,
    warmup_prefix: bool = False,
    k_decay: float = 1.0,
    t_in_epochs: bool = True,
    steps_per_epoch: int = 1,
) -> Schedule:
    """timm ``CosineLRScheduler`` as a step->lr function.

    Semantics match timm: during warmup lr ramps linearly from
    ``warmup_lr_init`` to ``base_lr`` over ``warmup_t`` units; afterwards a
    cosine from ``base_lr * cycle_decay**i`` down to ``lr_min`` per cycle,
    ``lr_min`` flat once ``cycle_limit`` cycles are exhausted.

    Loop-position parity: with ``t_in_epochs`` the reference calls
    ``scheduler.step(epoch)`` BEFORE each 1-based epoch
    (``trainer.py:346-348``), so every update inside epoch ``e`` trains at
    the timm value for ``t = e`` — hence ``t = step//spe + 1`` here. With
    ``t_in_epochs=False`` the reference calls ``step_update(n)`` AFTER
    update ``n`` (1-based), so update ``n`` trains at ``value(n-1)`` —
    which is ``t = step`` with our 0-based global step.
    """
    warmup_slope = (base_lr - warmup_lr_init) / max(warmup_t, 1)

    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        t = s // steps_per_epoch + 1.0 if t_in_epochs else s
        warm = warmup_lr_init + t * warmup_slope
        tc = t - (warmup_t if warmup_prefix else 0)
        if cycle_mul == 1.0:
            i = jnp.floor(tc / t_initial)
            t_i = float(t_initial)
            t_curr = tc - i * t_initial
        else:
            # timm's geometric cycle arithmetic
            ratio = tc / t_initial * (cycle_mul - 1.0) + 1.0
            i = jnp.floor(jnp.log(jnp.maximum(ratio, 1.0)) / math.log(cycle_mul))
            t_start = t_initial * (cycle_mul**i - 1.0) / (cycle_mul - 1.0)
            t_i = cycle_mul**i * t_initial
            t_curr = tc - t_start
        gamma = cycle_decay**i
        lr_max = base_lr * gamma
        frac = (t_curr**k_decay) / (t_i**k_decay)
        cos_lr = lr_min + 0.5 * (lr_max - lr_min) * (1.0 + jnp.cos(math.pi * frac))
        cos_lr = jnp.where(i >= cycle_limit, lr_min, cos_lr)
        return jnp.where(t < warmup_t, warm, cos_lr).astype(jnp.float32)

    return fn


def timm_multistep_schedule(
    base_lr: float,
    *,
    decay_t: list,
    decay_rate: float = 1.0,
    warmup_t: int = 0,
    warmup_lr_init: float = 0.0,
    t_in_epochs: bool = False,
    steps_per_epoch: int = 1,
    convert_to_batch: bool = False,
) -> Schedule:
    """timm ``MultiStepLRScheduler``. ``convert_to_batch`` reproduces the
    trainer's epoch->update-unit conversion (``trainer.py:1272-1279``)."""
    milestones = [
        t * steps_per_epoch if convert_to_batch else t for t in decay_t
    ]
    warmup_slope = (base_lr - warmup_lr_init) / max(warmup_t, 1)

    def fn(step):
        # same loop-position convention as the cosine schedule above
        s = jnp.asarray(step, jnp.float32)
        t = s // steps_per_epoch + 1.0 if t_in_epochs else s
        warm = warmup_lr_init + t * warmup_slope
        n_decays = sum([(t >= m).astype(jnp.float32) for m in milestones]) if milestones else 0.0
        lr = base_lr * decay_rate**n_decays
        return jnp.where(t < warmup_t, warm, lr).astype(jnp.float32)

    return fn


def wd_cosine_schedule(
    base_value: float, final_value: float, total_steps: int
) -> Schedule:
    """Effective per-update weight decay, reference-exact.

    The reference builds ``wd_schedule[i] = final + 0.5*(base-final)*
    (1+cos(pi*i/total))`` (``utils.py:563-573``, denominator = the table
    length) and writes ``wd_schedule[num_updates-1]`` into the param group
    AFTER the optimizer step (``trainer.py:940-948``), so update ``i``
    (0-indexed) actually trains with ``wd_schedule[i-1]`` — update 0 with
    the base value (== ``wd_schedule[0]``). This function returns that
    effective coefficient directly."""

    def fn(step):
        i = jnp.clip(jnp.asarray(step, jnp.float32) - 1.0, 0, total_steps - 1)
        return (
            final_value
            + 0.5 * (base_value - final_value) * (1.0 + jnp.cos(math.pi * i / max(total_steps, 1)))
        ).astype(jnp.float32)

    return fn


# timm knobs accepted for CLI parity but without effect on the deterministic
# schedule value (noise_* adds optional lr noise the reference never enables).
_IGNORED_KEYS = {"noise_range_t", "noise_pct", "noise_std", "noise_seed", "initialize"}


def make_lr_schedule(
    name: str,
    base_lr: float,
    params: Dict,
    *,
    num_epochs: int,
    steps_per_epoch: int,
    convert_to_batch: bool = False,
) -> Schedule:
    """Factory mirroring ``create_my_scheduler`` (``lr_schedulers.py:4-13``)."""
    params = {k: v for k, v in dict(params or {}).items() if k not in _IGNORED_KEYS}
    if name in (None, "none", "~", ""):
        return lambda step: jnp.asarray(base_lr, jnp.float32)
    if name == "cosine":
        t_initial = params.pop("t_initial", None)
        if t_initial in (None, "FILL_LATER"):
            t_initial = num_epochs  # trainer fills t_initial with epochs
        return timm_cosine_schedule(
            base_lr,
            t_initial=int(t_initial),
            steps_per_epoch=steps_per_epoch,
            **params,
        )
    if name == "multistep":
        return timm_multistep_schedule(
            base_lr,
            steps_per_epoch=steps_per_epoch,
            convert_to_batch=convert_to_batch,
            **params,
        )
    raise NotImplementedError(f"Not implemented scheduler: {name}")
