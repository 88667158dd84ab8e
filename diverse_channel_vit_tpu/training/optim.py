"""Optimizer factory over optax.

Mirrors ``make_my_optimizer`` (``optimizers.py:9-27``): name -> {sgd, adam,
adamw, adamp}, with torch-parity weight-decay semantics — SGD/Adam couple
the decay into the gradient, AdamW/AdamP decouple it — and the cosine
weight-decay *schedule* the reference applies by mutating
``param_group["weight_decay"]`` per update (``trainer.py:940-948``,
``configs/optimizer/adamw_jumpcp.yaml``) folded in as a step-indexed
transform. Gradient clipping (``trainer.py:925-927``) is part of the chain.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from .schedules import Schedule, wd_cosine_schedule


class ScheduledWDState(NamedTuple):
    count: jnp.ndarray


def add_scheduled_weight_decay(wd_fn: Schedule) -> optax.GradientTransformation:
    """Decoupled weight decay whose coefficient is a function of the step."""

    def init(params):
        del params
        return ScheduledWDState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        wd = wd_fn(state.count)
        updates = jax.tree_util.tree_map(lambda u, p: u + wd * p, updates, params)
        return updates, ScheduledWDState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# AdamP (timm.optim.AdamP) — Adam whose update is projected onto the tangent
# space of scale-invariant weights ("Slowing Down the Slowdown", ICLR 2021).
# ---------------------------------------------------------------------------


def _view_cosine_and_project(p, g, perturb, eps, reshape):
    """Cosine similarity + tangent projection under one view (channel/layer)."""
    pv, gv = reshape(p), reshape(g)
    p_norm = jnp.linalg.norm(pv, axis=1)
    g_norm = jnp.linalg.norm(gv, axis=1)
    cos = jnp.abs(jnp.sum(pv * gv, axis=1)) / (p_norm * g_norm + eps)
    cond = jnp.max(cos) < _delta_thresh(pv.shape[1])
    expand = (-1,) + (1,) * (p.ndim - 1)
    p_n = p / (p_norm.reshape(expand) + eps)
    proj = perturb - p_n * jnp.sum(reshape(p_n * perturb), axis=1).reshape(expand)
    return cond, proj


_DELTA = 0.1  # timm AdamP defaults


def _delta_thresh(dim):
    return _DELTA / math.sqrt(dim)


def _adamp_project(p, g, perturb, wd_ratio, eps=1e-30):
    """timm AdamP ``_projection``: try channel view then layer view."""
    if p.ndim < 2:
        return perturb, jnp.float32(1.0)
    ch = lambda x: x.reshape(x.shape[0], -1)
    ly = lambda x: x.reshape(1, -1)
    cond_c, proj_c = _view_cosine_and_project(p, g, perturb, eps, ch)
    cond_l, proj_l = _view_cosine_and_project(p, g, perturb, eps, ly)
    out = jnp.where(cond_c, proj_c, jnp.where(cond_l, proj_l, perturb))
    ratio = jnp.where(cond_c | cond_l, wd_ratio, 1.0).astype(jnp.float32)
    return out, ratio


class AdamPState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def adamp(
    lr_fn: Schedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    wd_ratio: float = 0.1,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """Full AdamP update (step size, projection and decay folded together,
    because the projected weight-decay ratio depends on the perturbation)."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamPState(count=jnp.zeros([], jnp.int32), mu=z, nu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        lr = lr_fn(state.count)

        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)

        def one(p, g, m, v):
            denom = jnp.sqrt(v / bc2) + eps
            if nesterov:
                pert = (b1 * m + (1 - b1) * g) / (bc1 * denom)
            else:
                pert = (m / bc1) / denom
            pert, ratio = _adamp_project(p, g, pert, wd_ratio)
            delta = -lr * pert
            if weight_decay > 0:
                delta = delta - lr * weight_decay * ratio * p
            return delta

        updates = jax.tree_util.tree_map(one, params, grads, mu, nu)
        return updates, AdamPState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(
    name: str,
    opt_params: Dict,
    *,
    lr_schedule: Schedule,
    total_steps: int,
    clip_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """name -> optax chain (``optimizers.py:9-27`` parity).

    ``opt_params`` is the reference's ``cfg.optimizer.params`` verbatim —
    including the ``weight_decay_end`` pseudo-key that switches on the
    cosine wd schedule (``trainer.py:217-228``).
    """
    p = dict(opt_params or {})
    p.pop("lr", None)  # lr comes in via the schedule
    name = (name or "adamw").lower()
    wd = float(p.pop("weight_decay", 0.0) or 0.0)
    wd_end = p.pop("weight_decay_end", None)
    wd_fn: Schedule
    if wd_end is not None and wd_end > -1:
        wd_fn = wd_cosine_schedule(wd, float(wd_end), total_steps)
    else:
        wd_fn = lambda step: jnp.asarray(wd, jnp.float32)

    chain = []
    if clip_grad_norm:
        chain.append(optax.clip_by_global_norm(float(clip_grad_norm)))

    # beyond reference: ``++optimizer.params.mu_dtype=bfloat16`` stores the
    # first Adam moment in bf16 (optax-native) — persistent optimizer HBM
    # 2P -> 1.5P, composes with the ZeRO shardings. Opt-in: numerics are
    # no longer bit-identical to the f32 reference update.
    mu_dtype = p.get("mu_dtype", None)
    mu_dtype = jnp.dtype(mu_dtype) if mu_dtype else None

    if name == "sgd":
        if wd:  # torch SGD: coupled L2 into the gradient
            chain.append(optax.add_decayed_weights(wd))
        momentum = float(p.get("momentum", 0.0) or 0.0)
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=bool(p.get("nesterov", False))))
        chain.append(optax.scale_by_schedule(lambda s: -lr_schedule(s)))
    elif name == "adam":
        if wd:  # torch Adam: coupled L2 into the gradient, before moments
            chain.append(optax.add_decayed_weights(wd))
        b1, b2 = p.get("betas", (0.9, 0.999))
        chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=float(p.get("eps", 1e-8)),
                                         mu_dtype=mu_dtype))
        chain.append(optax.scale_by_schedule(lambda s: -lr_schedule(s)))
    elif name == "adamw":
        b1, b2 = p.get("betas", (0.9, 0.999))
        chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=float(p.get("eps", 1e-8)),
                                         mu_dtype=mu_dtype))
        chain.append(add_scheduled_weight_decay(wd_fn))
        chain.append(optax.scale_by_schedule(lambda s: -lr_schedule(s)))
    elif name == "adamp":
        b1, b2 = p.get("betas", (0.9, 0.999))
        return optax.chain(
            *(chain or [optax.identity()]),
            adamp(
                lr_schedule,
                b1=b1,
                b2=b2,
                eps=float(p.get("eps", 1e-8)),
                weight_decay=wd,
                wd_ratio=float(p.get("wd_ratio", 0.1)),
                nesterov=bool(p.get("nesterov", False)),
            ),
        )
    else:
        raise NotImplementedError(f"Not implemented optimizer: {name}")
    return optax.chain(*chain)
