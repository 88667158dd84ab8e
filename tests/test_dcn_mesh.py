"""Multi-slice (DCN) data parallelism: the ``dcn`` mesh axis.

On multi-slice pods the inter-slice DCN is an order of magnitude slower
than ICI, so the mesh distinguishes the two: data parallelism spans
``("dcn", "data")`` jointly (parallel/mesh.py:dp_axes — XLA lowers the
gradient all-reduce hierarchically), while ZeRO-1 moment sharding stays
confined to the intra-slice ``data`` axis so the parameter-delta gather
never crosses DCN (parallel/zero.py). The reference has no multi-node
story at all (SURVEY §2.6: DDP is single-node NCCL); this is the TPU-native
extension of its DDP role.

Validated here on the virtual 8-device CPU mesh: a {dcn:2, data:4} step is
numerically identical to both the unsharded and the flat {data:8} step, and
the moments shard 1/4 (not 1/8).
"""

import jax
import jax.numpy as jnp
import numpy as np

from diverse_channel_vit_tpu.parallel import (
    apply_zero1,
    dp_axes,
    dp_size,
    make_mesh,
    shard_batch,
    shard_params,
)
from diverse_channel_vit_tpu.training import create_train_state, make_optimizer
from diverse_channel_vit_tpu.training.schedules import make_lr_schedule
from diverse_channel_vit_tpu.training.steps import (
    make_eval_step,
    make_train_step,
)

C, IMG, PATCH = 4, 32, 16


def _build(num_classes=7):
    from diverse_channel_vit_tpu.models.channel_vit import ChannelVisionTransformer
    from diverse_channel_vit_tpu.models.wrappers import ChannelAdaptiveClassifier

    backbone = ChannelVisionTransformer(
        num_total_channels=C, img_size=IMG, patch_size=PATCH, embed_dim=64,
        depth=2, num_heads=2, proxy_loss_lambda=1e-3, ortho_loss_v1_lambda=1e-3,
        attention_impl="xla",
    )
    return ChannelAdaptiveClassifier(backbone=backbone, embed_dim=64,
                                     num_classes=num_classes, with_head=True)


def _state(model):
    lr = make_lr_schedule("cosine", 1e-3, dict(t_initial=2, warmup_t=1,
                                               warmup_lr_init=1e-5),
                          num_epochs=2, steps_per_epoch=2)
    tx = make_optimizer("adamw", dict(weight_decay=0.01), lr_schedule=lr,
                        total_steps=4)
    x0 = jnp.zeros((2, C, IMG, IMG), jnp.float32)
    return tx, create_train_state(model, tx, rng=jax.random.key(0),
                                  sample_input=x0,
                                  sample_channel_ids=jnp.arange(C))


def _batch(mesh=None, b=16):
    data = {
        "image": jax.random.normal(jax.random.key(1), (b, C, IMG, IMG)),
        "label": jnp.arange(b) % 7,
    }
    return shard_batch(data, mesh) if mesh is not None else data


def test_dp_axes_and_size():
    flat = make_mesh({"data": -1, "model": 1})
    assert dp_axes(flat) == "data" and dp_size(flat) == 8
    hier = make_mesh({"data": 4, "dcn": 2})
    assert dp_axes(hier) == ("dcn", "data") and dp_size(hier) == 8
    assert dp_axes(None) == "data" and dp_size(None) == 1


def test_make_mesh_forces_dcn_outermost():
    # device reshape is row-major, so the FIRST axis splits on the
    # process/slice boundary of the jax.devices() ordering — dcn must be
    # first regardless of config order
    mesh = make_mesh({"data": 4, "dcn": 2})
    assert mesh.axis_names[0] == "dcn"
    assert dict(mesh.shape) == {"dcn": 2, "data": 4}


def test_dcn_train_step_matches_unsharded_and_flat_dp():
    model = _build()
    kwargs = dict(channel_ids=range(C), k=2, hcs_method="lowest_cosine_prob",
                  hcs_temp=0.5, patch_size=PATCH, loss_type="ce",
                  extra_loss_lambda=1.0, donate=False)
    _, s0 = _state(model)

    step_ref = make_train_step(model, **kwargs)
    s1, m1 = step_ref(s0, _batch(), jax.random.key(3))

    flat = make_mesh({"data": 8})
    _, sf = _state(model)
    sf = sf.replace(params=shard_params(sf.params, flat))
    s2, m2 = make_train_step(model, mesh=flat, **kwargs)(
        sf, _batch(flat), jax.random.key(3))

    hier = make_mesh({"dcn": 2, "data": 4})
    _, sh = _state(model)
    sh = sh.replace(params=shard_params(sh.params, hier))
    s3, m3 = make_train_step(model, mesh=hier, **kwargs)(
        sh, _batch(hier), jax.random.key(3))

    np.testing.assert_allclose(float(m1["loss"]), float(m3["loss"]), rtol=1e-5)
    # the linearized ("dcn","data") shard index reproduces the flat {data:8}
    # rng folds exactly — identical math, different collective topology
    np.testing.assert_allclose(float(m2["loss"]), float(m3["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s2.params),
                    jax.tree_util.tree_leaves(s3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s3.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_dcn_zero1_moments_shard_intra_slice_only():
    model = _build()
    hier = make_mesh({"dcn": 2, "data": 4})
    tx, st = _state(model)
    st = st.replace(params=shard_params(st.params, hier),
                    opt_state=apply_zero1(tx.init(st.params), hier))
    step = make_train_step(model, channel_ids=range(C), k=2,
                           hcs_method="lowest_cosine_prob", hcs_temp=0.5,
                           patch_size=PATCH, loss_type="ce",
                           extra_loss_lambda=1.0, donate=False,
                           mesh=hier, zero1=True)
    st2, _ = step(st, _batch(hier), jax.random.key(3))
    mu = [l for l in jax.tree_util.tree_leaves(st2.opt_state)
          if hasattr(l, "ndim") and l.ndim >= 1 and l.size >= 8]
    assert mu, "no moment leaves found"
    intra_sharded = [l for l in mu
                     if l.addressable_shards[0].data.size == l.size // 4]
    assert intra_sharded, "moments not sharded 1/data"
    # and the sharding spec never touches the dcn axis: the delta gather
    # stays on ICI
    for l in mu:
        spec_axes = {ax for part in l.sharding.spec if part
                     for ax in (part if isinstance(part, tuple) else (part,))}
        assert "dcn" not in spec_axes, l.sharding

    # numerics identical to the replicated-optimizer hierarchical run
    _, sr = _state(model)
    sr = sr.replace(params=shard_params(sr.params, hier))
    step_r = make_train_step(model, channel_ids=range(C), k=2,
                             hcs_method="lowest_cosine_prob", hcs_temp=0.5,
                             patch_size=PATCH, loss_type="ce",
                             extra_loss_lambda=1.0, donate=False, mesh=hier)
    sr2, _ = step_r(sr, _batch(hier), jax.random.key(3))
    for a, b in zip(jax.tree_util.tree_leaves(sr2.params),
                    jax.tree_util.tree_leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_dcn_zero1_collective_contract():
    """Steady-state HLO of the {dcn:2, data:4} ZeRO-1 step: the ONLY
    collective whose replica groups cross the slice boundary is the
    gradient all-reduce (≈1x parameter bytes — the data-parallel minimum);
    the parameter re-gathers all run in intra-slice groups ({0-3},{4-7}),
    i.e. on ICI. Steady state = second executable: params/moments enter
    1/data-sharded, as the first step leaves them."""
    import re

    tx, st = _state(_build())
    model = _build()
    hier = make_mesh({"dcn": 2, "data": 4})
    st = st.replace(params=shard_params(st.params, hier),
                    opt_state=apply_zero1(tx.init(st.params), hier))
    step = make_train_step(model, channel_ids=range(C), k=None,
                           loss_type="ce", extra_loss_lambda=1.0,
                           donate=False, mesh=hier, zero1=True)
    st1, _ = step(st, _batch(hier), jax.random.key(3))
    compiled = step.trace(st1, _batch(hier), jax.random.key(4)).lower().compile()

    def group_sets(line):
        """Parse replica_groups into a list of device-id sets."""
        m = re.search(r"replica_groups=\{(\{[^=]*?\})\}", line)
        if m:
            return [set(int(i) for i in g.split(",") if i)
                    for g in re.findall(r"\{([\d,]*)\}", m.group(1))]
        m = re.search(r"replica_groups=\[(\d+),(\d+)\]<=\[(\d+)\](T\([\d,]+\))?",
                      line)
        if m:
            ng, sz, n, transp = int(m.group(1)), int(m.group(2)), int(m.group(3)), m.group(4)
            ids = list(range(n))
            if transp:  # transposed iota interleaves ids across groups
                dims = [int(d) for d in re.findall(r"\d+", transp)]
                import numpy as _np
                ids = list(_np.arange(n).reshape(-1)[
                    _np.arange(n).reshape([ng, sz]).transpose(dims).reshape(-1)])
            return [set(ids[i * sz:(i + 1) * sz]) for i in range(ng)]
        return None

    slice0 = set(range(4))
    pat = re.compile(r"(all-reduce|all-gather|reduce-scatter|all-to-all|"
                     r"collective-permute)\(")
    cross_bytes = intra_gathers = 0
    for line in compiled.as_text().splitlines():
        if not pat.search(line) or "replica_groups" not in line:
            continue
        groups = group_sets(line)
        assert groups, f"unparsed replica_groups: {line[:120]}"
        crosses = any(g - slice0 and g & slice0 for g in groups)
        lhs = line.split(" = ", 1)[0] if " = " not in line else line.split(" = ", 1)[1]
        lhs = lhs.split("all-", 1)[0].split("reduce-", 1)[0].split("collective-", 1)[0]
        nbytes = sum(
            4 * int(np.prod([int(d) for d in shp.split(",") if d] or [1]))
            for shp in re.findall(r"f32\[([\d,]*)\]", lhs)
        )
        if crosses:
            cross_bytes += nbytes
            assert "all-reduce" in line, (
                f"non-all-reduce collective crosses DCN: {line[:120]}")
        elif "all-gather" in line:
            intra_gathers += 1
    param_bytes = sum(int(np.prod(x.shape)) * 4
                      for x in jax.tree_util.tree_leaves(st.params))
    assert param_bytes * 0.9 <= cross_bytes <= param_bytes * 1.3, (
        cross_bytes, param_bytes)
    assert intra_gathers > 0, "expected intra-slice parameter re-gathers"


def test_trainer_wires_dcn_axis(tmp_path):
    """`++hardware.mesh.dcn=2` through the config surface: the Trainer
    builds the hierarchical mesh (dcn forced outermost), batches shard over
    ("dcn","data"), ZeRO-1 stays intra-slice, and a real epoch trains +
    evals with zero1 on."""
    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.trainer import Trainer

    cfg = load_config(
        "synthetic_cfg",
        [
            "train.num_epochs=1",
            "train.batch_size=16",
            "dataset.num_train_samples=32",
            "dataset.num_eval_samples=16",
            f"train.checkpoints={tmp_path}/ckpt",
            "hardware.num_workers=0",
            "model.attention_impl=xla",
            "hardware.mesh.data=4",
            "hardware.mesh.model=1",
            "++hardware.mesh.dcn=2",
            "++hardware.zero1=True",
        ],
    )
    t = Trainer(cfg)
    assert t.mesh.axis_names[0] == "dcn"
    assert dict(t.mesh.shape) == {"dcn": 2, "data": 4, "model": 1}
    assert t.zero1
    best = t.train()
    assert np.isfinite(best)
    mu = [l for l in jax.tree_util.tree_leaves(t.state.opt_state)
          if hasattr(l, "ndim") and l.ndim >= 1 and l.size >= 8]
    assert any(l.addressable_shards[0].data.size == l.size // 4 for l in mu)
    for l in mu:
        spec_axes = {ax for part in l.sharding.spec if part
                     for ax in (part if isinstance(part, tuple) else (part,))}
        assert "dcn" not in spec_axes


def test_dcn_eval_step_matches_unsharded():
    model = _build()
    _, st = _state(model)
    x = _batch()["image"]
    want = make_eval_step(model)(st.params, x, jnp.arange(C))
    hier = make_mesh({"dcn": 2, "data": 4})
    got = make_eval_step(model, mesh=hier)(
        shard_params(st.params, hier),
        shard_batch({"x": x}, hier)["x"], jnp.arange(C))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_dcn_zero3_params_shard_intra_slice_only():
    """ZeRO-3 on the hierarchical mesh: the PARAM leaves shard 1/data
    (never over dcn — the forward's parameter all-gather stays on ICI),
    and numerics match the plain hierarchical run."""
    from diverse_channel_vit_tpu.parallel import apply_zero3

    model = _build()
    hier = make_mesh({"dcn": 2, "data": 4})
    tx, st = _state(model)
    st = st.replace(params=apply_zero3(st.params, hier),
                    opt_state=apply_zero1(tx.init(st.params), hier))
    step = make_train_step(model, channel_ids=range(C), k=2,
                           hcs_method="lowest_cosine_prob", hcs_temp=0.5,
                           patch_size=PATCH, loss_type="ce",
                           extra_loss_lambda=1.0, donate=False,
                           mesh=hier, zero3=True)
    st2, _ = step(st, _batch(hier), jax.random.key(3))
    pl = [l for l in jax.tree_util.tree_leaves(st2.params)
          if hasattr(l, "ndim") and l.ndim >= 1 and l.size >= 8]
    assert pl, "no param leaves found"
    intra_sharded = [l for l in pl
                     if l.addressable_shards[0].data.size == l.size // 4]
    assert intra_sharded, "params not sharded 1/data"
    for l in pl:
        spec_axes = {ax for part in l.sharding.spec if part
                     for ax in (part if isinstance(part, tuple) else (part,))}
        assert "dcn" not in spec_axes, l.sharding

    _, sr = _state(model)
    sr = sr.replace(params=shard_params(sr.params, hier))
    step_r = make_train_step(model, channel_ids=range(C), k=2,
                             hcs_method="lowest_cosine_prob", hcs_temp=0.5,
                             patch_size=PATCH, loss_type="ce",
                             extra_loss_lambda=1.0, donate=False, mesh=hier)
    sr2, _ = step_r(sr, _batch(hier), jax.random.key(3))
    for a, b in zip(jax.tree_util.tree_leaves(sr2.params),
                    jax.tree_util.tree_leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)
