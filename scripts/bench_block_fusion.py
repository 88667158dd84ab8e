"""12-layer full-Block chain (fwd+bwd) variants: layout / fusion experiments.

Variants:
  v0  faithful re-expression of the shipped Block (3D Dense, f32 LN)
  v1  all dense/LN math on the flattened (B*N, D) 2D view; 3D only for flash
  v2  v1 + fused qkv GEMM (384->1152); flash kernel reads q/k/v as
      lane-block slices of the SAME array via BlockSpec index maps
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diverse_channel_vit_tpu.compile_cache import enable

enable()

from diverse_channel_vit_tpu.ops.attention import (
    _FWD_SCORE_BYTES,
    _BWD_SCORE_BYTES,
    _cdiv,
    _pick_block_q,
    flash_attention_packed,
)
from diverse_channel_vit_tpu.ops.activations import gelu

B, N, D, H = 64, 1569, 384, 6
NP = 1664  # preferred pad
MLP = 4 * D
N_LAYERS = 12
SM = (D // H) ** -0.5
MASK_VALUE = -1e30


def bench(f, *args, iters=8):
    r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(iters):
        r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def report(tag, dt):
    print(f"{tag:<56} {dt*1e3:8.2f} ms ({dt*1e3/N_LAYERS:.2f} ms/layer)", flush=True)


def make_params(key, fused_qkv=False):
    ks = jax.random.split(key, 8)
    p = dict(
        ln1_s=jnp.ones((D,), jnp.float32),
        ln1_b=jnp.zeros((D,), jnp.float32),
        ln2_s=jnp.ones((D,), jnp.float32),
        ln2_b=jnp.zeros((D,), jnp.float32),
        proj_w=(jax.random.normal(ks[3], (D, D)) * 0.02).astype(jnp.bfloat16),
        proj_b=jnp.zeros((D,), jnp.bfloat16),
        fc1_w=(jax.random.normal(ks[4], (D, MLP)) * 0.02).astype(jnp.bfloat16),
        fc1_b=jnp.zeros((MLP,), jnp.bfloat16),
        fc2_w=(jax.random.normal(ks[5], (MLP, D)) * 0.02).astype(jnp.bfloat16),
        fc2_b=jnp.zeros((D,), jnp.bfloat16),
    )
    if fused_qkv:
        p["qkv_w"] = (jax.random.normal(ks[0], (D, 3 * D)) * 0.02).astype(jnp.bfloat16)
        p["qkv_b"] = jnp.zeros((3 * D,), jnp.bfloat16)
    else:
        for i, nm in enumerate(("q", "k", "v")):
            p[f"w{nm}"] = (jax.random.normal(ks[i], (D, D)) * 0.02).astype(jnp.bfloat16)
            p[f"b{nm}"] = jnp.zeros((D,), jnp.bfloat16)
    return p


def ln(x, s, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * s + b
    return y.astype(x.dtype)


# ---------------------------------------------------------------- v0 (3D)
def block_v0(p, x):
    y = ln(x, p["ln1_s"], p["ln1_b"])
    q = y @ p["wq"] + p["bq"]
    k = y @ p["wk"] + p["bk"]
    v = y @ p["wv"] + p["bv"]
    o = flash_attention_packed(q, k, v, H, SM, valid_len=N)
    x = x + (o @ p["proj_w"] + p["proj_b"])
    y = ln(x, p["ln2_s"], p["ln2_b"])
    y = gelu(y @ p["fc1_w"] + p["fc1_b"])
    x = x + (y @ p["fc2_w"] + p["fc2_b"])
    return x


# ---------------------------------------------------------------- v1 (2D)
def block_v1(p, x2):
    # x2: (B*NP, D)
    y = ln(x2, p["ln1_s"], p["ln1_b"])
    q = y @ p["wq"] + p["bq"]
    k = y @ p["wk"] + p["bk"]
    v = y @ p["wv"] + p["bv"]
    o = flash_attention_packed(
        q.reshape(B, NP, D), k.reshape(B, NP, D), v.reshape(B, NP, D), H, SM, valid_len=N
    ).reshape(B * NP, D)
    x2 = x2 + (o @ p["proj_w"] + p["proj_b"])
    y = ln(x2, p["ln2_s"], p["ln2_b"])
    y = gelu(y @ p["fc1_w"] + p["fc1_b"])
    x2 = x2 + (y @ p["fc2_w"] + p["fc2_b"])
    return x2


# ------------------------------------------------- v2 (fused qkv + slices)
def _qkv_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads, sm_scale, n_valid):
    q = q_ref[0]  # (bq, D)
    k = k_ref[0]  # (n, D)
    v = v_ref[0]
    dh = q.shape[-1] // num_heads
    outs = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * sm_scale
        if n_valid < s.shape[-1]:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        pexp = jnp.exp(s - m)
        l = jnp.sum(pexp, axis=1, keepdims=True)
        o = jax.lax.dot(pexp.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32)
        outs.append((o / l).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=1)


def qkv_flash_fwd(qkv, block_q):
    # qkv: (B, NP, 3D); q/k/v are lane-block slices via index maps
    b, n, d3 = qkv.shape
    d = d3 // 3
    nq = n // block_q
    kernel = functools.partial(_qkv_fwd_kernel, num_heads=H, sm_scale=SM, n_valid=N)
    return pl.pallas_call(
        kernel,
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 1)),
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 2)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * n * d,
            bytes_accessed=b * n * d * 2 * 4,
            transcendentals=b * n * n * H,
        ),
    )(qkv, qkv, qkv)


def _qkv_bwd_kernel(
    qkv_ref, do_ref, o_ref, dq_ref, dk_ref, dv_ref, dk_scr, dv_scr,
    *, num_heads, sm_scale, n_valid, n_q_blocks,
):
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    d = dq_ref.shape[-1]
    # q block rows: rows qi*bq..; within qkv_ref block we get (bq, 3D): lanes 0:D are q
    qall = qkv_ref[0]
    bq = dq_ref.shape[1]
    dh = d // num_heads
    do = do_ref[0]
    o = o_ref[0]
    dqs, dks, dvs = [], [], []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh = qall[:bq, sl]  # placeholder; unused path
        dqs.append(qh.astype(dq_ref.dtype))
    dq_ref[0] = jnp.concatenate(dqs, axis=1)


def chain(block, p_list, x):
    for p in p_list:
        x = block(p, x)
    return x


def run_v3(ps, x3):
    # ------------------------------------------------ v3 fully fused ops
    from diverse_channel_vit_tpu.ops.fused_block import (
        flash_attention_qkv,
        ln_mlp,
        ln_qkv,
    )

    def block_v3(p, x3_):
        qkv = ln_qkv(x3_, p["ln1_s"], p["ln1_b"], p["qkv_w"], p["qkv_b"])
        o = flash_attention_qkv(qkv, H, SM, valid_len=N)
        x3_ = x3_ + (o @ p["proj_w"] + p["proj_b"])
        return ln_mlp(x3_, p["ln2_s"], p["ln2_b"], p["fc1_w"], p["fc1_b"],
                      p["fc2_w"], p["fc2_b"], True)

    f3 = jax.jit(lambda ps_, xx: chain(block_v3, ps_, xx))
    report("v3 fused ln_qkv+flash_qkv+ln_mlp fwd", bench(f3, ps, x3))

    def loss3(ps_, xx):
        return jnp.sum(chain(block_v3, ps_, xx).astype(jnp.float32))

    g3 = jax.jit(jax.grad(loss3, argnums=(0, 1)))
    report("v3 fused fwd+bwd", bench(g3, ps, x3))

    # numerics: v3 vs v0 single layer (bf16 tolerance)
    p0 = make_params(jax.random.key(7), fused_qkv=False)
    p3 = dict(p0)
    p3["qkv_w"] = jnp.concatenate([p0["wq"], p0["wk"], p0["wv"]], axis=1)
    p3["qkv_b"] = jnp.concatenate([p0["bq"], p0["bk"], p0["bv"]])
    a0 = block_v0(p0, x3).astype(jnp.float32)
    a3 = block_v3(p3, x3).astype(jnp.float32)
    print("v3 vs v0 max abs diff:", float(jnp.max(jnp.abs(a0 - a3))),
          " max |v0|:", float(jnp.max(jnp.abs(a0))), flush=True)


def main():
    key = jax.random.key(0)
    x3 = jax.random.normal(jax.random.key(1), (B, NP, D)).astype(jnp.bfloat16)
    x2 = x3.reshape(B * NP, D)

    only_v3 = bool(os.environ.get("ONLY_V3"))
    for tag, block, xin, fused in () if only_v3 else (
        ("v0 3D (shipped math)", block_v0, x3, False),
        ("v1 2D-flattened", block_v1, x2, False),
    ):
        ps = [make_params(jax.random.fold_in(key, i), fused_qkv=fused) for i in range(N_LAYERS)]

        f = jax.jit(lambda ps_, xx: chain(block, ps_, xx))
        report(f"{tag} fwd", bench(f, ps, xin))

        def loss(ps_, xx):
            return jnp.sum(chain(block, ps_, xx).astype(jnp.float32))

        g = jax.jit(jax.grad(loss, argnums=(0, 1)))
        report(f"{tag} fwd+bwd", bench(g, ps, xin))

    # v2 fwd-only probe: does the lane-block-sliced qkv flash compile & how fast
    ps = [make_params(jax.random.fold_in(key, 100 + i), fused_qkv=True) for i in range(N_LAYERS)]
    bq_f = _pick_block_q(NP, hp=2, budget=_FWD_SCORE_BYTES)
    if only_v3:
        run_v3(ps, x3)
        return

    def block_v2_fwd(p, x2_):
        y = ln(x2_, p["ln1_s"], p["ln1_b"])
        qkv = (y @ p["qkv_w"] + p["qkv_b"]).reshape(B, NP, 3 * D)
        o = qkv_flash_fwd(qkv, bq_f).reshape(B * NP, D)
        x2_ = x2_ + (o @ p["proj_w"] + p["proj_b"])
        y = ln(x2_, p["ln2_s"], p["ln2_b"])
        y = gelu(y @ p["fc1_w"] + p["fc1_b"])
        return x2_ + (y @ p["fc2_w"] + p["fc2_b"])

    f2 = jax.jit(lambda ps_, xx: chain(block_v2_fwd, ps_, xx))
    report("v2 fused-qkv lane-sliced fwd", bench(f2, ps, x2))

    run_v3(ps, x3)

    # numerics check v2 vs v1 single layer
    p1 = make_params(jax.random.key(7), fused_qkv=False)
    p2 = dict(p1)
    p2["qkv_w"] = jnp.concatenate([p1["wq"], p1["wk"], p1["wv"]], axis=1)
    p2["qkv_b"] = jnp.concatenate([p1["bq"], p1["bk"], p1["bv"]])
    a = block_v1(p1, x2)
    b = block_v2_fwd(p2, x2)
    print("v2 vs v1 max abs diff:", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))))


if __name__ == "__main__":
    main()
