"""Fused-block Pallas ops (ops/fused_block.py): correctness vs the XLA
composition, and Block-level fused/unfused equivalence (identical parameter
tree, same outputs within bf16 tolerance)."""

import jax
import jax.numpy as jnp
import pytest

from diverse_channel_vit_tpu.ops import fused_block as fb
from diverse_channel_vit_tpu.ops.attention import xla_attention
from diverse_channel_vit_tpu.ops.fused_block import (
    _gelu_tanh_f32,
    attend_project,
    ln_mlp,
)

B, N, D, H = 2, 128, 128, 2


@pytest.fixture(autouse=True)
def _force_cpu_fused():
    fb.FORCE_ON_CPU = True
    yield
    fb.FORCE_ON_CPU = False


def _ln_ref(x, s, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * s + b).astype(x.dtype)


def _rel(a, b):
    a, b = a.astype(jnp.float32), b.astype(jnp.float32)
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))


def _mk(key, shape, dtype, scale=0.05):
    return (jax.random.normal(key, shape) * scale).astype(dtype)


@pytest.mark.parametrize("residual", [False, True])
def test_ln_mlp_matches_xla_composition(residual):
    key = jax.random.key(1)
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, N, D), jnp.float32)
    s = jnp.ones((D,))
    bi = jnp.zeros((D,))
    w1 = _mk(jax.random.fold_in(key, 2), (D, 4 * D), jnp.float32)
    b1 = _mk(jax.random.fold_in(key, 3), (4 * D,), jnp.float32)
    w2 = _mk(jax.random.fold_in(key, 4), (4 * D, D), jnp.float32)
    b2 = _mk(jax.random.fold_in(key, 5), (D,), jnp.float32)

    def ref(x, s, bi, w1, b1, w2, b2):
        h = _gelu_tanh_f32(_ln_ref(x, s, bi) @ w1 + b1)
        o = h @ w2 + b2
        return o + x if residual else o

    got = ln_mlp(x, s, bi, w1, b1, w2, b2, residual)
    assert _rel(got, ref(x, s, bi, w1, b1, w2, b2)) < 1e-5

    def f_fused(*a):
        return jnp.sum(ln_mlp(*a, residual) ** 2)

    def f_ref(*a):
        return jnp.sum(ref(*a) ** 2)

    g1 = jax.grad(f_fused, argnums=tuple(range(7)))(x, s, bi, w1, b1, w2, b2)
    g2 = jax.grad(f_ref, argnums=tuple(range(7)))(x, s, bi, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        assert _rel(a, b) < 1e-4


@pytest.mark.parametrize("with_residual", [False, True])
def test_attend_project_matches_xla(with_residual):
    from diverse_channel_vit_tpu.ops.fused_block import attend_project

    key = jax.random.key(7)
    y = jax.random.normal(jax.random.fold_in(key, 1), (B, N, D), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(key, 2), (B, N, D), jnp.float32)
    w = _mk(jax.random.fold_in(key, 3), (D, 3 * D), jnp.float32, scale=0.2)
    b = _mk(jax.random.fold_in(key, 4), (3 * D,), jnp.float32, scale=0.2)
    wp = _mk(jax.random.fold_in(key, 5), (D, D), jnp.float32, scale=0.2)
    bp = _mk(jax.random.fold_in(key, 6), (D,), jnp.float32, scale=0.2)
    valid = N - 3
    dh = D // H

    def ref(y, w, b, wp, bp, x):
        qkv = y @ w + b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh, kh, vh = (t.reshape(B, N, H, dh).transpose(0, 2, 1, 3) for t in (q, k, v))
        o = xla_attention(qh, kh, vh, dh**-0.5, valid_len=valid)
        o = o.transpose(0, 2, 1, 3).reshape(B, N, D)
        out = o @ wp + bp
        return out + x if with_residual else out

    got = attend_project(y, w, b, wp, bp, x if with_residual else None, H,
                         valid_len=valid)
    assert _rel(got, ref(y, w, b, wp, bp, x)) < 1e-5

    def f_fused(y, w, b, wp, bp, x):
        out = attend_project(y, w, b, wp, bp, x if with_residual else None, H,
                             valid_len=valid)
        return jnp.sum(out ** 2)

    def f_ref(*a):
        return jnp.sum(ref(*a) ** 2)

    g1 = jax.grad(f_fused, argnums=(0, 1, 2, 3, 4, 5))(y, w, b, wp, bp, x)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4, 5))(y, w, b, wp, bp, x)
    names = ("dy", "dw", "db", "dwp", "dbp", "dx")
    for nm, a_, b_ in zip(names, g1, g2):
        if nm == "dx" and not with_residual:
            assert float(jnp.max(jnp.abs(a_))) == 0.0
            continue
        assert _rel(a_, b_) < 1e-4, nm


def test_attend_project_pads_ragged_n():
    """N not a q-block multiple: the op pads internally and slices back."""
    key = jax.random.key(4)
    n = 72
    y = jax.random.normal(jax.random.fold_in(key, 1), (1, n, D), jnp.float32)
    w = _mk(jax.random.fold_in(key, 2), (D, 3 * D), jnp.float32, scale=0.2)
    b = jnp.zeros((3 * D,))
    wp = _mk(jax.random.fold_in(key, 3), (D, D), jnp.float32, scale=0.2)
    bp = jnp.zeros((D,))
    dh = D // H

    qkv = y @ w + b
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh, kh, vh = (t.reshape(1, n, H, dh).transpose(0, 2, 1, 3) for t in (q, k, v))
    o = xla_attention(qh, kh, vh, dh**-0.5, valid_len=n)
    want = o.transpose(0, 2, 1, 3).reshape(1, n, D) @ wp + bp
    got = attend_project(y, w, b, wp, bp, None, H)
    assert got.shape == (1, n, D)
    assert _rel(got, want) < 1e-5


def test_block_fused_equals_unfused():
    """Same params, same input: fused Block path == unfused (bf16 tol), and
    the parameter trees are identical (checkpoint interchangeable)."""
    from diverse_channel_vit_tpu.models.vit import Block

    blk = Block(num_heads=2, dtype=jnp.bfloat16)
    x = (jax.random.normal(jax.random.key(3), (2, 64, 128)) * 0.5).astype(jnp.bfloat16)

    fb.FORCE_ON_CPU = False  # unfused reference
    p_un = blk.init({"params": jax.random.key(0)}, x, train=False)["params"]
    out_un = blk.apply({"params": p_un}, x, train=False)

    fb.FORCE_ON_CPU = True  # fused (interpret mode)
    assert blk._fused_ok(x, False)
    p_fu = blk.init({"params": jax.random.key(0)}, x, train=False)["params"]
    out_fu = blk.apply({"params": p_fu}, x, train=False)

    same = jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: a.shape == b.shape and bool(jnp.allclose(a, b)), p_un, p_fu
        )
    )
    assert same, "fused/unfused parameter trees differ"
    assert _rel(out_fu, out_un) < 3e-2

    # gradients flow through the fused custom-vjp ops to every param
    def loss(p):
        return jnp.sum(blk.apply({"params": p}, x, train=True,
                                 rngs={"dropout": jax.random.key(9)}).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(p_fu)
    norms = [float(jnp.linalg.norm(l.astype(jnp.float32))) for l in jax.tree_util.tree_leaves(g)]
    assert all(n > 0 for n in norms)


def test_blockstack_scan_composes_with_fused_path():
    """nn.scan (BlockStack) over the fused Block: the traced drop-path
    override forces the non-fused-residual variant; outputs match the
    unrolled unfused stack within bf16 tolerance."""
    from diverse_channel_vit_tpu.models.vit import Block, BlockStack

    x = (jax.random.normal(jax.random.key(11), (2, 64, 128)) * 0.5).astype(jnp.bfloat16)

    fb.FORCE_ON_CPU = True
    stack = BlockStack(depth=2, num_heads=2, dtype=jnp.bfloat16, remat=True)
    p = stack.init({"params": jax.random.key(0)}, x, train=False)["params"]
    out_fused = stack.apply({"params": p}, x, train=False)

    fb.FORCE_ON_CPU = False
    out_unfused = stack.apply({"params": p}, x, train=False)
    assert _rel(out_fused, out_unfused) < 3e-2

    # grads flow through scan + remat + fused custom-vjp ops
    fb.FORCE_ON_CPU = True

    def loss(p):
        return jnp.sum(
            stack.apply({"params": p}, x, train=True,
                        rngs={"dropout": jax.random.key(1)}).astype(jnp.float32) ** 2
        )

    g = jax.grad(loss)(p)
    assert all(
        float(jnp.linalg.norm(l.astype(jnp.float32))) > 0
        for l in jax.tree_util.tree_leaves(g)
    )


def test_block_fused_gate_conditions():
    """The fused path must decline: CPU w/o force, non-bf16, odd sequence,
    active prob-dropout in train."""
    from diverse_channel_vit_tpu.models.vit import Block

    x16 = jnp.zeros((1, 64, 128), jnp.bfloat16)
    fb.FORCE_ON_CPU = False
    assert not Block(num_heads=2, dtype=jnp.bfloat16)._fused_ok(x16, False)
    fb.FORCE_ON_CPU = True
    assert not Block(num_heads=2, dtype=jnp.float32)._fused_ok(
        jnp.zeros((1, 64, 128), jnp.float32), False
    )
    assert not Block(num_heads=2, dtype=jnp.bfloat16)._fused_ok(
        jnp.zeros((1, 63, 128), jnp.bfloat16), False
    )
    assert not Block(num_heads=2, dtype=jnp.bfloat16, attn_drop=0.1)._fused_ok(x16, True)
    assert Block(num_heads=2, dtype=jnp.bfloat16, attn_drop=0.1)._fused_ok(x16, False)
    fb.set_fused_block(False)
    assert not Block(num_heads=2, dtype=jnp.bfloat16)._fused_ok(x16, False)
    fb.set_fused_block(True)

@pytest.mark.parametrize("residual", [False, True])
def test_ln_mlp_int8_close_to_f32(residual):
    """Opt-in int8 path: forward within ~2% of the f32 composition, grads
    within ~5% (per-row dynamic scales bound the per-GEMM error at ~1/127);
    weight grads are NOT quantised and stay tight."""
    key = jax.random.key(21)
    x = jax.random.normal(jax.random.fold_in(key, 1), (B, N, D), jnp.float32)
    s = jnp.ones((D,))
    bi = jnp.zeros((D,))
    w1 = _mk(jax.random.fold_in(key, 2), (D, 4 * D), jnp.float32)
    b1 = _mk(jax.random.fold_in(key, 3), (4 * D,), jnp.float32)
    w2 = _mk(jax.random.fold_in(key, 4), (4 * D, D), jnp.float32)
    b2 = _mk(jax.random.fold_in(key, 5), (D,), jnp.float32)

    def ref(x, s, bi, w1, b1, w2, b2):
        h = _gelu_tanh_f32(_ln_ref(x, s, bi) @ w1 + b1)
        o = h @ w2 + b2
        return o + x if residual else o

    got = ln_mlp(x, s, bi, w1, b1, w2, b2, residual, True)
    assert _rel(got, ref(x, s, bi, w1, b1, w2, b2)) < 2e-2

    def f_q(*a):
        return jnp.sum(ln_mlp(*a, residual, True) ** 2)

    def f_ref(*a):
        return jnp.sum(ref(*a) ** 2)

    g1 = jax.grad(f_q, argnums=tuple(range(7)))(x, s, bi, w1, b1, w2, b2)
    g2 = jax.grad(f_ref, argnums=tuple(range(7)))(x, s, bi, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        assert _rel(a, b) < 5e-2


def test_block_quantized_routing():
    """model.quantization=int8 routes the fused MLP through the int8 kernels:
    output stays close to the unquantised fused path, grads reach every
    param, and the parameter tree is unchanged."""
    from diverse_channel_vit_tpu.models.vit import Block

    blk = Block(num_heads=2, dtype=jnp.bfloat16)
    x = (jax.random.normal(jax.random.key(5), (2, 64, 128)) * 0.5).astype(jnp.bfloat16)
    fb.FORCE_ON_CPU = True
    p = blk.init({"params": jax.random.key(0)}, x, train=False)["params"]
    out_plain = blk.apply({"params": p}, x, train=False)

    fb.set_quantization("int8")
    try:
        out_q = blk.apply({"params": p}, x, train=False)
        assert _rel(out_q, out_plain) < 5e-2

        def loss(p):
            return jnp.sum(blk.apply({"params": p}, x, train=True,
                                     rngs={"dropout": jax.random.key(9)}).astype(jnp.float32) ** 2)

        g = jax.grad(loss)(p)
        assert all(
            float(jnp.linalg.norm(l.astype(jnp.float32))) > 0
            for l in jax.tree_util.tree_leaves(g)
        )
    finally:
        fb.set_quantization("none")

    with pytest.raises(ValueError):
        fb.set_quantization("fp4")


# ---------------------------------------------------------------------------
# Geometry property sweep: every (embed_dim, heads, seq, valid_len) the gate
# accepts must produce fused == unfused numerics. Covers the head widths the
# gate admits (dh 64 / 128 / 192), ragged sequence lengths (n % 8 == 0 but
# not a q-block multiple), key-side padding via valid_len, and single-head.
# Guards the class of bug ADVICE r2 found (a gate admitting a geometry the
# kernels were never exercised at).
# ---------------------------------------------------------------------------

GEOMETRIES = [
    # (dim, heads, n, valid_len)   -> dh
    (128, 1, 64, None),    # 128, single head
    (128, 2, 40, None),    # 64, ragged n
    (256, 4, 64, 50),      # 64, padded keys
    (256, 2, 72, None),    # 128, ragged n
    (384, 6, 64, None),    # 64, flagship width
    (384, 3, 64, 37),      # 128, MXU-native + padding
    (384, 2, 64, None),    # 192
    (512, 4, 48, None),    # 128
]


@pytest.mark.parametrize("dim,heads,n,valid_len", GEOMETRIES)
def test_block_fused_geometry_sweep(dim, heads, n, valid_len):
    from diverse_channel_vit_tpu.models.vit import Block

    blk = Block(num_heads=heads, dtype=jnp.bfloat16)
    x = (jax.random.normal(jax.random.key(dim + heads + n), (2, n, dim)) * 0.5
         ).astype(jnp.bfloat16)
    if valid_len is not None:
        x = x.at[:, valid_len:].set(0.0)

    assert blk._fused_ok(x, False), "gate must accept this geometry"
    p = blk.init({"params": jax.random.key(0)}, x, train=False)["params"]
    out_fused = blk.apply({"params": p}, x, train=False, valid_len=valid_len)

    fb.FORCE_ON_CPU = False
    out_dense = blk.apply({"params": p}, x, train=False, valid_len=valid_len)
    fb.FORCE_ON_CPU = True

    v = valid_len if valid_len is not None else n
    assert _rel(out_fused[:, :v], out_dense[:, :v]) < 3e-2


@pytest.mark.parametrize("dim,heads,n,valid_len", [(128, 2, 40, None),
                                                   (384, 2, 64, 50)])
def test_block_fused_geometry_grads(dim, heads, n, valid_len):
    """Grads agree between the fused custom-vjp path and the dense path at
    off-default geometries (incl. dh=192 and padded ragged keys)."""
    from diverse_channel_vit_tpu.models.vit import Block

    blk = Block(num_heads=heads, dtype=jnp.bfloat16)
    x = (jax.random.normal(jax.random.key(7), (2, n, dim)) * 0.5
         ).astype(jnp.bfloat16)
    if valid_len is not None:
        x = x.at[:, valid_len:].set(0.0)
    p = blk.init({"params": jax.random.key(1)}, x, train=False)["params"]
    v = valid_len if valid_len is not None else n

    def loss(p):
        out = blk.apply({"params": p}, x, train=False, valid_len=valid_len)
        return jnp.sum(out[:, :v].astype(jnp.float32) ** 2)

    g_fused = jax.grad(loss)(p)
    fb.FORCE_ON_CPU = False
    g_dense = jax.grad(loss)(p)
    fb.FORCE_ON_CPU = True

    flat_f, _ = jax.tree_util.tree_flatten(g_fused)
    flat_d, _ = jax.tree_util.tree_flatten(g_dense)
    # near-zero leaves (LN biases whose grads nearly cancel) are dominated by
    # bf16 quantisation in the dense path; give them an absolute floor tied
    # to the global gradient scale
    gscale = max(float(jnp.max(jnp.abs(b.astype(jnp.float32)))) for b in flat_d)
    for a, b in zip(flat_f, flat_d):
        a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
        err = float(jnp.max(jnp.abs(a32 - b32)))
        assert err < 5e-2 * float(jnp.max(jnp.abs(b32))) + 5e-3 * gscale


def test_block_fused_train_drop_path_branch():
    """train=True with drop_path > 0 takes the fused non-fused-residual
    branch (attend_project without x_res, ln_mlp without residual); the same
    rng stream drives DropPath in both paths, so outputs must match."""
    from diverse_channel_vit_tpu.models.vit import Block

    blk = Block(num_heads=2, drop_path=0.3, dtype=jnp.bfloat16)
    x = (jax.random.normal(jax.random.key(5), (4, 64, 256)) * 0.5
         ).astype(jnp.bfloat16)
    assert blk._fused_ok(x, True)
    p = blk.init({"params": jax.random.key(2)}, x, train=False)["params"]

    rngs = {"dropout": jax.random.key(11)}
    out_fused = blk.apply({"params": p}, x, train=True, rngs=rngs)
    fb.FORCE_ON_CPU = False
    out_dense = blk.apply({"params": p}, x, train=True, rngs=rngs)
    fb.FORCE_ON_CPU = True
    assert _rel(out_fused, out_dense) < 3e-2


def test_mlp_bm_vmem_envelope():
    """ln_mlp row-block picker: bm=832 is the sweep winner up to d=768, but
    the kernel's VMEM stack (x/h/out blocks ~ bm*(2d + 4d + ...) + both
    weight mats) scales with bm*d — wider models must shrink bm to stay
    under the 100MB scoped-vmem budget Mosaic is given. Pin the policy so a
    future sweep doesn't silently regress the ViT-L fit."""
    # measured envelope: full 832 target through ViT-S/B widths
    assert fb._mlp_bm(1664, 384) == 832
    assert fb._mlp_bm(1664, 768) == 832
    # ViT-L (d=1024): bm=832 measured at 102.03M > 100M budget; the scaled
    # target must (a) shrink, (b) stay a multiple-of-8 divisor of n, and
    # (c) keep the FULL footprint estimate — activation blocks plus the
    # resident 16d^2-byte fc1/fc2 weight mats, which the bm*d pin alone
    # misses (ADVICE r3) — under the 100MB scoped-vmem budget.
    for n in (1664, 832, 3328):
        for d in (1024, 1280, 1664, 2048):
            bm = fb._mlp_bm(n, d)
            assert n % bm == 0 and bm % 8 == 0
            assert bm * d <= 832 * 768, (n, d, bm)
            assert fb._mlp_footprint(bm, d) <= fb._MLP_VMEM_BUDGET, (n, d, bm)
    # tiny sequences always fit: picker degrades to a divisor of n
    assert fb._mlp_bm(256, 1024) <= 256
    # calibration sanity: the formula reproduces the measured overflow point
    assert fb._mlp_footprint(832, 1024) > fb._MLP_VMEM_BUDGET
