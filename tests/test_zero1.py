"""ZeRO-1 optimizer-state sharding (``parallel/zero.py``).

Beyond the reference (SURVEY §2.6 lists FSDP/ZeRO as absent): each data
shard owns 1/N of the Adam moments; the train step's numerics must stay
BIT-IDENTICAL to the replicated update while the moment leaves actually
live sharded on the mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from diverse_channel_vit_tpu.config import load_config
from diverse_channel_vit_tpu.parallel import make_mesh, zero1_opt_shardings
from diverse_channel_vit_tpu.trainer import Trainer


def _cfg(tmp_path, extra=()):
    return load_config(
        "synthetic_cfg",
        [
            "train.num_epochs=2",
            "scheduler=none",
            "train.batch_size=16",
            "dataset.num_train_samples=48",
            "dataset.num_eval_samples=32",
            f"train.checkpoints={tmp_path}/ckpt",
            "hardware.num_workers=0",
            "model.attention_impl=xla",
            "++eval.skip_eval_first_epoch=True",
            "++eval.only_eval_first_and_last=True",
            *extra,
        ],
    )


def _moment_leaves(opt_state):
    """Every float array leaf shaped like a parameter (the Adam moments)."""
    return [
        leaf
        for leaf in jax.tree_util.tree_leaves(opt_state)
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.size >= 8
    ]


def test_zero1_spec_selection():
    mesh = make_mesh({"data": 8})
    fake = {
        "kernel": jnp.zeros((384, 1152)),  # dim0 divisible -> P('data', None)
        "cls": jnp.zeros((1, 1, 384)),  # first divisible dim is 2
        "odd": jnp.zeros((7, 5)),  # nothing divisible -> replicated
        "count": jnp.zeros(()),  # rank 0 -> replicated
    }
    specs = zero1_opt_shardings(fake, mesh)
    assert specs["kernel"].spec == P("data")  # trailing Nones normalized
    assert specs["cls"].spec == P(None, None, "data")
    assert specs["odd"].spec == P()
    assert specs["count"].spec == P()


def test_zero1_respects_tp_base():
    """Leaves the TP rules already shard keep their sharding; ZeRO-1 only
    claims the replicated remainder (compose, don't fight)."""
    from jax.sharding import NamedSharding

    mesh = make_mesh({"data": 4, "model": 2})
    fake = {
        "tp": jnp.zeros((384, 1152)),
        "free": jnp.zeros((384, 1152)),
    }
    base = {
        "tp": NamedSharding(mesh, P(None, "model")),
        "free": NamedSharding(mesh, P()),
    }
    specs = zero1_opt_shardings(fake, mesh, base=base)
    assert specs["tp"].spec == P(None, "model")
    assert specs["free"].spec == P("data")


def test_zero1_collective_contract():
    """Compiled contract of the zero1 step: the OUTPUT opt-state shardings
    are the ZeRO-1 specs (moments leave the step 1/N per device — the
    memory guarantee survives compilation, not just placement), and total
    all-reduce volume stays within ~2.2x parameter bytes (the grad
    all-reduce plus the parameter-delta gather; on the CPU backend XLA
    lowers that gather as dynamic-slice + all-reduce, so op names can't be
    asserted — volume can)."""
    import re

    from __graft_entry__ import _build_flagship
    from diverse_channel_vit_tpu.parallel import apply_zero1
    from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
    from diverse_channel_vit_tpu.training.steps import make_train_step

    c, img = 4, 32
    model = _build_flagship(img, 16, 2, 64, 2, c, 5, jnp.float32,
                            attention_impl="xla")
    mesh = make_mesh({"data": -1, "model": 1})
    tx = make_optimizer("adamw", dict(weight_decay=0.01),
                        lr_schedule=lambda s: jnp.float32(1e-3),
                        total_steps=4, clip_grad_norm=1.0)
    state = create_train_state(
        model, tx, rng=jax.random.key(0),
        sample_input=jnp.zeros((2, c, img, img), jnp.float32),
        sample_channel_ids=jnp.arange(c),
    )
    state = state.replace(opt_state=apply_zero1(state.opt_state, mesh))
    step = make_train_step(model, channel_ids=range(c), k=None, loss_type="ce",
                           extra_loss_lambda=1.0, donate=False, mesh=mesh,
                           zero1=True)
    batch = {
        "image": jax.device_put(
            jax.random.normal(jax.random.key(1), (16, c, img, img)),
            jax.sharding.NamedSharding(mesh, P("data")),
        ),
        "label": jax.device_put(
            jnp.arange(16) % 5, jax.sharding.NamedSharding(mesh, P("data"))
        ),
    }
    compiled = step.trace(state, batch, jax.random.key(2)).lower().compile()

    # the compiled step RETURNS the moments sharded: at least one output
    # opt-state sharding carries the data axis
    out_shardings = jax.tree_util.tree_leaves(compiled.output_shardings)
    assert any(
        "data" in getattr(s, "spec", P()) for s in out_shardings
    ), "no output sharded over 'data' — zero1 constraint lost in compilation"

    txt = compiled.as_text()
    lines = txt.splitlines()
    ar = [l for l in lines if re.search(r"= *\(?.*all-reduce\(", l)]
    assert ar, "the gradient all-reduce must remain"
    reduced_bytes = 0
    for l in ar:
        lhs = l.split("all-reduce(")[0]
        for shp in re.findall(r"f32\[([\d,]*)\]", lhs):
            n = 1
            for d in shp.split(","):
                if d:
                    n *= int(d)
            reduced_bytes += 4 * n
    param_bytes = sum(
        int(np.prod(x.shape)) * 4 for x in jax.tree_util.tree_leaves(state.params)
    )
    # grads (1x) + the delta gather (<=1x, lowered as all-reduce on CPU)
    # + small metrics slack
    assert param_bytes <= reduced_bytes <= 2.2 * param_bytes, (
        reduced_bytes, param_bytes)


@pytest.mark.slow
def test_zero1_training_bit_identical_and_sharded(tmp_path):
    """Full Trainer run with ++hardware.zero1=True on the 8-device CPU mesh:
    final params match the replicated run exactly, and the moment leaves
    are demonstrably sharded (per-device shard < full leaf)."""
    ta = Trainer(_cfg(tmp_path / "a"))
    ta.train()

    tb = Trainer(_cfg(tmp_path / "b", extra=["++hardware.zero1=True"]))
    assert tb.zero1
    tb.train()

    for la, lb in zip(
        jax.tree_util.tree_leaves(ta.state.params),
        jax.tree_util.tree_leaves(tb.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    # the moments really live sharded: at least one leaf's addressable
    # shard is 1/8 of the leaf, and every moment matches the replicated run
    n_dev = tb.n_devices
    saw_sharded = False
    for la, lb in zip(
        _moment_leaves(ta.state.opt_state), _moment_leaves(tb.state.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        shard = lb.addressable_shards[0].data
        if shard.size == lb.size // n_dev:
            saw_sharded = True
    assert saw_sharded


@pytest.mark.slow
def test_zero1_mixed_chunk_apply_path(tmp_path):
    """The CHAMMI grad-accumulation path (make_apply_step) under zero1:
    losses equal the replicated run."""
    from diverse_channel_vit_tpu.training.steps import make_apply_step

    t = Trainer(_cfg(tmp_path, extra=["++hardware.zero1=True"]))
    apply_z = make_apply_step(donate=False, mesh=t.mesh, zero1=True)
    apply_r = make_apply_step(donate=False)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-3), t.state.params
    )
    sz, _ = apply_z(t.state, grads)
    sr, _ = apply_r(t.state, grads)
    for lz, lr in zip(
        jax.tree_util.tree_leaves(sz.params), jax.tree_util.tree_leaves(sr.params)
    ):
        np.testing.assert_array_equal(np.asarray(lz), np.asarray(lr))
    for lz, lr in zip(
        _moment_leaves(sz.opt_state), _moment_leaves(sr.opt_state)
    ):
        np.testing.assert_array_equal(np.asarray(lz), np.asarray(lr))
