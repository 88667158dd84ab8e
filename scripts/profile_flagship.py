"""Throughput breakdown of the flagship train step on the local TPU.

Writes timings incrementally to stdout (run with `python -u`). First run
warms the persistent compile cache; subsequent runs start in seconds.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diverse_channel_vit_tpu.compile_cache import enable

enable()

from __graft_entry__ import _build_flagship  # noqa: E402
from diverse_channel_vit_tpu.training import create_train_state, make_optimizer  # noqa: E402
from diverse_channel_vit_tpu.training.steps import make_train_step  # noqa: E402

B = 64


def bench(f, *args, iters=10):
    r = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(r))
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(iters):
        r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    x = jax.random.normal(jax.random.key(0), (B, 8, 224, 224), jnp.float32)
    cids = jnp.arange(8)
    y = jnp.arange(B) % 161

    for tag, attn_impl, extras in [
        ("pallas+extras", "auto", True),
        ("pallas-noextras", "auto", False),
        ("xla-attn+extras", "xla", True),
    ]:
        model = _build_flagship(224, 16, 12, 384, 6, 8, 161, jnp.bfloat16,
                                attention_impl=attn_impl)
        if not extras:
            model = model.clone(backbone=model.backbone.clone(
                proxy_loss_lambda=0.0, ortho_loss_v1_lambda=0.0))
        t0 = time.time()
        params = jax.jit(lambda r1, r2, m=model: m.init(
            {"params": r1, "dropout": r2}, x[:2], cids, train=False)["params"]
        )(jax.random.key(1), jax.random.key(2))
        jax.block_until_ready(params)
        print(f"[{tag}] init: {time.time()-t0:.0f}s", flush=True)

        def loss_fn(p, x, m=model):
            out, extra = m.apply({"params": p}, x, cids, train=True,
                                 rngs={"dropout": jax.random.key(3)})
            lg = jax.nn.log_softmax(out, -1)
            return -jnp.mean(jnp.take_along_axis(lg, y[:, None], -1)) + extra

        t0 = time.time()
        fwd = jax.jit(lambda p, x, m=model: m.apply({"params": p}, x, cids, train=False)[0])
        dt = bench(fwd, params, x)
        print(f"[{tag}] fwd eval {dt*1e3:.1f} ms ({B/dt:.0f} img/s) compile {time.time()-t0:.0f}s", flush=True)

        t0 = time.time()
        grad = jax.jit(jax.grad(loss_fn))
        dt = bench(grad, params, x)
        print(f"[{tag}] fwd+bwd  {dt*1e3:.1f} ms ({B/dt:.0f} img/s) compile {time.time()-t0:.0f}s", flush=True)

    # full train step (pallas + extras + adamw)
    model = _build_flagship(224, 16, 12, 384, 6, 8, 161, jnp.bfloat16)
    tx = make_optimizer("adamw", dict(weight_decay=0.04),
                        lr_schedule=lambda s: jnp.float32(4e-4), total_steps=1000)
    state = create_train_state(model, tx, rng=jax.random.key(0),
                               sample_input=x[:2], sample_channel_ids=cids)
    step = make_train_step(model, channel_ids=range(8), loss_type="ce",
                           extra_loss_lambda=1.0, donate=True)
    batch = {"image": x, "label": y}
    t0 = time.time()
    state, m = step(state, batch, jax.random.key(5))
    jax.block_until_ready(m["loss"])
    print(f"[train-step] compile {time.time()-t0:.0f}s", flush=True)
    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch, jax.random.fold_in(jax.random.key(6), i))
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"[train-step] {dt*1e3:.1f} ms ({B/dt:.0f} img/s)", flush=True)


if __name__ == "__main__":
    main()
