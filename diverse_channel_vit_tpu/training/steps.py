"""Jitted train / eval steps.

Everything the reference Trainer does per batch in Python —
autocast forward (``trainer.py:861``), per-chunk backward accumulation
(:846-931), grad clipping (:925-927), scheduler ``step_update`` (:939),
wd-schedule writes (:940-948) — is one compiled function here. Channel
sampling (HCS/DCS) happens *inside* the step on device with an explicit
PRNG key; the sampled channel count ``k`` is a static Python int, so each
distinct k is one cached XLA specialization (shapes stay static).

Two step families:

- :func:`make_train_step` — fused grad+update for single-chunk datasets
  (JUMP-CP / So2Sat, ``train_one_batch_regular`` :963-1028).
- :func:`make_grad_step` + :func:`make_apply_step` — per-chunk gradient
  microbatches with host-side accumulation for mixed-chunk CHAMMI batches
  (``train_one_batch_morphem70k`` :824-931): grad-of-sum equals the
  reference's per-chunk backward accumulation.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.wrappers import model_scale
from ..ops.losses import cross_entropy_loss
from ..ops.sampling import dcs_select
from .state import TrainState


def _l2n(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def proxy_logits(proxies: jax.Array, emb: jax.Array, scale) -> jax.Array:
    """-||scale*norm(e) - scale*norm(p)||^2 logits (``loss_fn.py:7-21``)."""
    p = scale * _l2n(proxies.astype(jnp.float32))
    e = scale * _l2n(emb.astype(jnp.float32))
    d2 = (
        jnp.sum(e * e, axis=-1, keepdims=True)
        + jnp.sum(p * p, axis=-1)[None, :]
        - 2.0 * e @ p.T
    )
    return -d2


def _select_channels(
    params: Any,
    x: jax.Array,
    cids: jax.Array,
    rng: jax.Array,
    *,
    k: Optional[int],
    method: str,
    temp: float,
    patch_size: Optional[int] = None,
    axis_name: Optional[str] = None,
    feature_fn: Optional[Callable] = None,
):
    """Gather a sampled channel subset of the batch (HCS/DCS).

    Returns (x_sel, cids_sel, channel_embed_override). ``k`` static; k == C
    or None disables. ``hcs_per_sample`` gathers a different subset per
    sample and carries the matching embeddings as a (B, k, D) override
    (``dichavit.py:138-149``); ``*_proj`` scores channels by batch-mean
    cosine of projected patches (``dichavit.py:156-161``).

    ``axis_name``: set when running per data shard inside ``shard_map`` —
    the batch-mean cosine is pmean'd so every shard draws the SAME global
    subset (matching the single-device semantics), and ``hcs_per_sample``
    folds the shard index so per-sample subsets stay independent.
    """
    c = x.shape[1]
    if k is None or k >= c:
        return x, cids, None

    if method == "hcs_per_sample":
        from ..ops.sampling import per_sample_uniform_subsets

        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        idx = per_sample_uniform_subsets(rng, x.shape[0], c, k)  # (B, k)
        x_sel = jnp.take_along_axis(x, idx[:, :, None, None], axis=1)
        emb = jnp.take(params["backbone"]["channel_embed"], cids, axis=0)
        override = jnp.take(emb, idx, axis=0)  # (B, k, D)
        return x_sel, jnp.take(cids, idx[0]), override

    cos_matrix = None
    if method not in (None, "none", "uniform") and method.endswith("_proj"):
        from ..ops.patch_embed import per_channel_patch_embed
        from ..ops.sampling import batch_cosine_matrix

        kern = params["backbone"]["proj_kernel"]
        toks = per_channel_patch_embed(x, kern, None, patch_size=patch_size)
        toks = jax.lax.stop_gradient(toks)  # reference samples under no_grad
        cos_matrix = batch_cosine_matrix(toks.reshape(x.shape[0], c, -1))
        if axis_name is not None:
            # per-shard batch means -> exact global batch mean
            cos_matrix = jax.lax.pmean(cos_matrix, axis_name)
    elif method not in (None, "none", "uniform") and method.endswith("_resnet34"):
        # frozen-backbone channel scoring (dichavit.py:100-111, :162-167):
        # per-channel RGB-replicated embeddings -> batch-mean pairwise cosine
        from ..ops.sampling import batch_cosine_matrix

        if feature_fn is None:
            raise ValueError(
                "hcs_sampling=*_resnet34 needs the trainer-provided frozen "
                "backbone (model.resnet34_ckpt); see trainer._hcs_feature_fn"
            )
        feats = jax.lax.stop_gradient(feature_fn(x))  # (B, C, F)
        cos_matrix = batch_cosine_matrix(feats)
        if axis_name is not None:
            cos_matrix = jax.lax.pmean(cos_matrix, axis_name)
    needs_embed = method not in (None, "none", "uniform")
    if needs_embed and cos_matrix is None:
        emb = jnp.take(params["backbone"]["channel_embed"], cids, axis=0)
    else:
        emb = jnp.zeros((c, 1), jnp.float32)
    idx = dcs_select(
        rng, k, method if needs_embed else "uniform",
        channel_embed=emb, cos_matrix=cos_matrix, temp=temp,
    )
    return jnp.take(x, idx, axis=1), jnp.take(cids, idx), None


def _loss_and_metrics(
    model,
    params,
    x,
    cids,
    y,
    rng_drop,
    *,
    loss_type: str,
    extra_loss_lambda: float,
    learnable_temp: bool,
    temperature: float,
    miro_pre_params=None,
    miro_ld: float = 0.0,
    channel_override=None,
):
    miro_on = miro_pre_params is not None
    if miro_on:
        from .miro import MIRO_KEY, forward_with_taps, miro_vlb

        # encoder biases live beside (not inside) the model tree
        model_params = {k: v for k, v in params.items() if k != MIRO_KEY}
        out, extra, feats = forward_with_taps(
            model, model_params, x, cids, train=True,
            rngs={"dropout": rng_drop}, channel_override=channel_override,
        )
    else:
        out, extra = model.apply(
            {"params": params}, x, cids, train=True, rngs={"dropout": rng_drop},
            channel_embed_override=channel_override,
        )
    if loss_type == "proxy":
        scale = model_scale(params, learnable_temp, temperature)
        logits = proxy_logits(params["proxies"], out, scale)
        log_probs = jax.nn.log_softmax(logits, axis=-1)
        main = -jnp.mean(jnp.take_along_axis(log_probs, y[:, None], axis=-1))
    else:
        logits = out
        main = cross_entropy_loss(logits, y)
    total = main + extra_loss_lambda * extra
    metrics = {"main_loss": main, "extra_loss": extra}
    if miro_on:
        # MIRO mutual-information regularizer (``trainer.py:885-910``): the
        # frozen init-time pre-featurizer runs eval-mode on the same input
        # (torch.no_grad role = stop_gradient inside miro_vlb)
        _, _, pre_feats = forward_with_taps(
            model, miro_pre_params, x, cids, train=False
        )
        vlb = miro_vlb(params[MIRO_KEY], feats, pre_feats)
        total = total + miro_ld * vlb
        metrics["miro_loss"] = vlb
    acc = jnp.mean((jnp.argmax(logits, axis=-1) == y).astype(jnp.float32))
    metrics |= {"loss": total, "acc": acc}
    return total, metrics


def _data_sharded(mesh) -> bool:
    from ..parallel.mesh import dp_size

    return mesh is not None and dp_size(mesh) > 1


def _dp_axes(mesh):
    """Data-parallel axis name(s) for pmean/axis_index/in_specs: ``"data"``,
    or ``("dcn", "data")`` on a multi-slice mesh (parallel/mesh.py)."""
    from ..parallel.mesh import dp_axes

    return dp_axes(mesh)


def _manual_axes(mesh) -> frozenset:
    """Mesh axes the shard_map treats as manual.

    ``data`` always (the explicit pmean axis), and ``dcn`` when present
    (the inter-slice half of the data-parallel pmean). Size-1 axes too: an axis
    left automatic puts the body under GSPMD sharding propagation, and
    Mosaic kernels refuse auto-partitioning EVEN AT SIZE 1
    (``jax/_src/tpu_custom_call.py`` raises "Mosaic kernels cannot be
    automatically partitioned") — measured on the real chip; the CPU test
    mesh never caught it because those models run ``attention_impl=xla``.
    A >1 ``model`` (TP) axis stays automatic so the Megatron shardings of
    parallel/shardings.py apply via GSPMD — Pallas ops don't run under
    real TP (the trainer selects the xla attention path there)."""
    return frozenset(
        ({"data", "dcn"} & set(dict(mesh.shape)))
        | {ax for ax, sz in dict(mesh.shape).items() if sz == 1}
    )


def _shard_map_grads(fn, mesh):
    """Wrap a ``(params, batch, rng) -> (grads, metrics)`` function in
    ``shard_map`` over the mesh's ``data`` axis.

    Required for multi-chip TPU: GSPMD cannot auto-partition Mosaic
    kernels, so the Pallas flash/fused-block kernels must run per data
    shard with the gradient all-reduce as an explicit ``pmean`` over ICI
    (see :func:`_manual_axes` for which axes are manual)."""
    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(_dp_axes(mesh)), P()),
        out_specs=(P(), P()),
        axis_names=_manual_axes(mesh),
        check_vma=False,
    )


def make_train_step(
    model,
    *,
    channel_ids: Sequence[int],
    k: Optional[int] = None,
    hcs_method: str = "none",
    hcs_temp: float = 0.1,
    patch_size: Optional[int] = None,
    loss_type: str = "ce",
    extra_loss_lambda: float = 0.0,
    learnable_temp: bool = False,
    temperature: float = 0.11111,
    miro_pre_params=None,
    miro_ld: float = 0.0,
    augment_fn: Optional[Callable] = None,
    donate: bool = True,
    mesh=None,
    feature_fn: Optional[Callable] = None,
    zero1: bool = False,
    zero3: bool = False,
) -> Callable[[TrainState, Dict[str, jax.Array], jax.Array], Tuple[TrainState, Dict]]:
    """Fused grad + optimizer update for a single-chunk batch.

    ``augment_fn(key, images) -> images`` runs the on-device augmentation
    pipeline (ops/augment.py) inside the compiled step. With a ``mesh``
    whose ``data`` axis is >1, the grad computation runs per data shard
    under ``shard_map`` (see :func:`_shard_map_grads`); dropout/augment RNG
    folds the shard index, the channel draw stays globally shared.

    ``zero1``: pin the updated optimizer state to its ZeRO-1 shardings
    (``parallel/zero.py``) — each data shard owns 1/N of the Adam moments;
    XLA computes the elementwise update shard-local and all-gathers only
    the parameter delta. Bit-identical numerics, 2P -> 2P/N moment HBM.

    ``zero3``: additionally keep the *parameters* sharded 1/N (implies the
    zero1 moment constraint); the shard_map's replicated ``in_specs``
    materialise exactly one parameter all-gather at step entry while the
    update stays shard-local — persistent state drops to (P + 2P)/N."""
    cids_const = jnp.asarray(tuple(channel_ids), jnp.int32)
    sharded = _data_sharded(mesh)
    axis = _dp_axes(mesh) if sharded else None

    def grads_and_metrics(params, batch, rng):
        rng_sample, rng_drop, rng_aug = jax.random.split(rng, 3)
        if sharded:
            ix = jax.lax.axis_index(axis)  # linearized over ("dcn","data")
            rng_drop = jax.random.fold_in(rng_drop, ix)
            rng_aug = jax.random.fold_in(rng_aug, ix)
        x, y = batch["image"], batch["label"]
        if augment_fn is not None:
            x = augment_fn(rng_aug, x)

        def loss_fn(params):
            xs, cs, override = _select_channels(
                params, x, cids_const, rng_sample, k=k, method=hcs_method,
                temp=hcs_temp, patch_size=patch_size, axis_name=axis,
                feature_fn=feature_fn,
            )
            total, metrics = _loss_and_metrics(
                model, params, xs, cs, y, rng_drop,
                channel_override=override,
                loss_type=loss_type,
                extra_loss_lambda=extra_loss_lambda,
                learnable_temp=learnable_temp,
                temperature=temperature,
                miro_pre_params=miro_pre_params,
                miro_ld=miro_ld,
            )
            if k is not None and k < len(channel_ids):
                # channel-usage counter input (dichavit.py:66, :214-216):
                # the ids actually used in this loss, threaded out as aux —
                # no second selection/augmentation pass
                metrics["sampled_channels"] = cs
            return total, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
        if sharded:
            # integer channel ids don't average; global draws are identical
            # on every shard (pmean'd cosines, shared rng_sample) and
            # hcs_per_sample reports shard 0's subset
            cs_out = metrics.pop("sampled_channels", None)
            grads = jax.lax.pmean(grads, axis)
            metrics = jax.lax.pmean(metrics, axis)
            if cs_out is not None:
                metrics["sampled_channels"] = cs_out
        return grads, metrics

    gm = _shard_map_grads(grads_and_metrics, mesh) if sharded else grads_and_metrics
    zero3 = zero3 and sharded
    zero1 = (zero1 or zero3) and sharded

    def step(state: TrainState, batch, rng):
        grads, metrics = gm(state.params, batch, rng)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.apply_gradients(grads=grads)
        if zero1:
            from ..parallel.zero import constrain_zero1, constrain_zero3

            new_state = new_state.replace(
                opt_state=constrain_zero1(new_state.opt_state, mesh),
                **(
                    {"params": constrain_zero3(new_state.params, mesh)}
                    if zero3 else {}
                ),
            )
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_grad_step(
    model,
    *,
    channel_ids: Sequence[int],
    k: Optional[int] = None,
    hcs_method: str = "none",
    hcs_temp: float = 0.1,
    patch_size: Optional[int] = None,
    loss_type: str = "proxy",
    extra_loss_lambda: float = 0.0,
    learnable_temp: bool = False,
    temperature: float = 0.11111,
    miro_pre_params=None,
    miro_ld: float = 0.0,
    augment_fn: Optional[Callable] = None,
    mesh=None,
    feature_fn: Optional[Callable] = None,
):
    """Per-chunk gradient microbatch: returns (grads, metrics), no update.

    One jitted specialization per (chunk, k); the CHAMMI mixed batch loops
    chunks on the host and accumulates with :func:`tree_add`, which equals
    the reference's repeated ``loss.backward()`` (``trainer.py:846-931``).
    With a data-sharded ``mesh`` the grad computation runs under
    ``shard_map`` (see :func:`_shard_map_grads`).
    """
    cids_const = jnp.asarray(tuple(channel_ids), jnp.int32)
    sharded = _data_sharded(mesh)
    axis = _dp_axes(mesh) if sharded else None

    def grads_and_metrics(params, batch, rng):
        rng_sample, rng_drop, rng_aug = jax.random.split(rng, 3)
        if sharded:
            ix = jax.lax.axis_index(axis)
            rng_drop = jax.random.fold_in(rng_drop, ix)
            rng_aug = jax.random.fold_in(rng_aug, ix)
        x, y = batch["image"], batch["label"]
        if augment_fn is not None:
            x = augment_fn(rng_aug, x)

        def loss_fn(p):
            xs, cs, override = _select_channels(
                p, x, cids_const, rng_sample, k=k, method=hcs_method,
                temp=hcs_temp, patch_size=patch_size, axis_name=axis,
                feature_fn=feature_fn,
            )
            total, metrics = _loss_and_metrics(
                model, p, xs, cs, y, rng_drop,
                channel_override=override,
                loss_type=loss_type,
                extra_loss_lambda=extra_loss_lambda,
                learnable_temp=learnable_temp,
                temperature=temperature,
                miro_pre_params=miro_pre_params,
                miro_ld=miro_ld,
            )
            if k is not None and k < len(channel_ids):
                # channel-usage counter on the CHAMMI/mixed path too — the
                # paper's headline diagnostic (dichavit.py:214-216, reference
                # trainer.py:796-804); the in-loss ids, no recompute
                metrics["sampled_channels"] = cs
            return total, metrics

        grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
        if sharded:
            cs_out = metrics.pop("sampled_channels", None)
            grads = jax.lax.pmean(grads, axis)
            metrics = jax.lax.pmean(metrics, axis)
            if cs_out is not None:
                metrics["sampled_channels"] = cs_out
        return grads, metrics

    gm = _shard_map_grads(grads_and_metrics, mesh) if sharded else grads_and_metrics

    def grad_step(params, batch, rng):
        return gm(params, batch, rng)

    return jax.jit(grad_step)


def make_apply_step(donate: bool = True, mesh=None, zero1: bool = False,
                    zero3: bool = False):
    """Apply accumulated grads to the state (one optimizer update).

    ``zero1`` / ``zero3`` (with a data-sharded ``mesh``): keep the updated
    Adam moments (and under zero3 the params) in their ZeRO layout — see
    :func:`make_train_step`."""
    zero3 = zero3 and _data_sharded(mesh)
    zero1 = (zero1 or zero3) and _data_sharded(mesh)

    def apply_step(state: TrainState, grads):
        norm = optax.global_norm(grads)
        new_state = state.apply_gradients(grads=grads)
        if zero1:
            from ..parallel.zero import constrain_zero1, constrain_zero3

            new_state = new_state.replace(
                opt_state=constrain_zero1(new_state.opt_state, mesh),
                **(
                    {"params": constrain_zero3(new_state.params, mesh)}
                    if zero3 else {}
                ),
            )
        return new_state, norm

    return jax.jit(apply_step, donate_argnums=(0,) if donate else ())


def tree_add(a, b):
    return jax.tree_util.tree_map(jnp.add, a, b)


def make_eval_step(model, *, donate: bool = False, mesh=None):
    """Forward pass at eval: returns the model output (features or logits).

    ``channel_embed_override`` carries the synthesized novel-channel
    embeddings of the leave-one-out eval strategies
    (``channel_vit.py:89-136``). With a data-sharded ``mesh`` the forward
    runs per shard under ``shard_map`` (Mosaic kernels cannot be
    GSPMD-partitioned); per-sample (B, k, D) overrides shard with the
    batch, (C, D) overrides replicate.
    """
    sharded = _data_sharded(mesh)

    def fwd(params, x, cids, override):
        out, _ = model.apply(
            {"params": params}, x, cids, train=False,
            channel_embed_override=override,
        )
        return out

    @functools.partial(jax.jit, static_argnames=("use_override", "per_sample"))
    def eval_step(params, x, cids, override=None, *, use_override=False,
                  per_sample=False):
        ov = override if use_override else None
        if not sharded:
            return fwd(params, x, cids, ov)
        from jax.sharding import PartitionSpec as P

        dp = _dp_axes(mesh)
        ov_spec = P(dp) if (use_override and per_sample) else P()
        return jax.shard_map(
            fwd,
            mesh=mesh,
            in_specs=(P(), P(dp), P(), ov_spec),
            out_specs=P(dp),
            axis_names=_manual_axes(mesh),
            check_vma=False,
        )(params, x, cids, ov)

    def run(params, x, cids, override=None):
        return eval_step(
            params, x, cids, override,
            use_override=override is not None,
            per_sample=override is not None and override.ndim == 3,
        )

    return run
