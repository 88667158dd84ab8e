"""Parameterized attention-kernel benchmark (consolidates the round-2
bench_attn_kernel2..7 one-shots; their findings live in PERFORMANCE.md).

Experiments (run on the real TPU, results go to PERFORMANCE.md):

  python scripts/bench_attn.py chain          # shipped fwd / fwd+bwd chains
  python scripts/bench_attn.py bwd-variants   # shipped pair-staged vs
                                              # batched-pair dot_general bwd
  python scripts/bench_attn.py step --batch 64 96 128   # full train step
  python scripts/bench_attn.py --heads 3 chain          # dh=128 geometry

All chains run L=12 layers in one jit with a host-readback sync (axon's
block_until_ready is unreliable for timing).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from diverse_channel_vit_tpu.compile_cache import enable

enable()

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:
    pltpu = None

MASK_VALUE = -1e30
L = 12


def bench(f, *args, iters=10):
    r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def report(tag, dt):
    print(f"{tag:<58} {dt*1e3:8.2f} ms ({dt*1e3/L:.2f} ms/layer)", flush=True)


# ---------------------------------------------------------------------------
# shipped-op chains
# ---------------------------------------------------------------------------


def exp_chain(cfg):
    """12-layer chains of the shipped attend_project op, fwd and fwd+bwd."""
    from diverse_channel_vit_tpu.ops import fused_block as fb

    b, n, d, h = cfg.batch[0], cfg.n, cfg.dim, cfg.heads
    key = jax.random.key(0)
    y = jax.random.normal(key, (b, n, d), jnp.bfloat16)
    w = jax.random.normal(key, (d, 3 * d), jnp.bfloat16) * 0.02
    bq = jnp.zeros((3 * d,), jnp.bfloat16)
    wp = jax.random.normal(key, (d, d), jnp.bfloat16) * 0.02
    bp = jnp.zeros((d,), jnp.bfloat16)

    def chain(y):
        for _ in range(L):
            y = fb.attend_project(y, w, bq, wp, bp, y, h, valid_len=cfg.n_valid)
        return y

    def loss(y):
        return jnp.sum(chain(y).astype(jnp.float32))

    report(f"attend_project fwd B={b} N={n} dh={d//h}",
           bench(jax.jit(chain), y))
    report(f"attend_project fwd+bwd B={b} N={n} dh={d//h}",
           bench(jax.jit(jax.grad(loss)), y))


# ---------------------------------------------------------------------------
# backward variants: shipped pair-staged per-head dots vs a TRUE batched
# (2, bq, dh) dot_general over head pairs
# ---------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, dq_ref, dk_ref, dv_ref,
                dk_scr, dv_scr, *, num_heads, sm_scale, n_valid, n_q_blocks,
                variant):
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    d = dq_ref.shape[-1]
    dh = d // num_heads
    do = do_ref[0]
    ob = o_ref[0]

    def sl(h):
        return slice(h * dh, (h + 1) * dh)

    if variant == "pair_staged":  # shipped order (fused_block._ap_bwd_kernel)
        def soft(h):
            s = jax.lax.dot_general(
                q_ref[0, :, sl(h)], k_ref[0, :, sl(h)],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            s = s * sm_scale
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, MASK_VALUE)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            return p / jnp.sum(p, axis=1, keepdims=True)

        def dspart(h, p):
            doh = do[:, sl(h)]
            di = jnp.sum(ob[:, sl(h)].astype(jnp.float32) * doh.astype(jnp.float32),
                         axis=1, keepdims=True)
            dp = jax.lax.dot_general(doh, v_ref[0, :, sl(h)],
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            return p * (dp - di) * sm_scale

        dqs, dks, dvs = [], [], []
        for h0 in range(0, num_heads, 2):
            pair = [h for h in (h0, h0 + 1) if h < num_heads]
            ps = [soft(h) for h in pair]
            dss = [dspart(h, p) for h, p in zip(pair, ps)]
            for h, p, ds in zip(pair, ps, dss):
                dsb = ds.astype(q_ref.dtype)
                pb = p.astype(q_ref.dtype)
                dqs.append(jax.lax.dot(dsb, k_ref[0, :, sl(h)],
                                       preferred_element_type=jnp.float32)
                           .astype(dq_ref.dtype))
                dks.append(jax.lax.dot_general(
                    dsb, q_ref[0, :, sl(h)], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
                dvs.append(jax.lax.dot_general(
                    pb, do[:, sl(h)], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
        dq_ref[0] = jnp.concatenate(dqs, axis=1)
        dk_scr[...] += jnp.concatenate(dks, axis=1)
        dv_scr[...] += jnp.concatenate(dvs, axis=1)
    else:  # "pair_batched": stack head pairs into (2, bq/n, dh) batched dots
        def stk(arr, pair):
            return jnp.stack([arr[:, sl(h)] for h in pair], axis=0)

        dqs, dks, dvs = [], [], []
        for h0 in range(0, num_heads, 2):
            pair = [h for h in (h0, h0 + 1) if h < num_heads]
            if len(pair) == 1:
                pair = pair * 1
            q2 = stk(q_ref[0], pair)          # (hp, bq, dh)
            k2 = stk(k_ref[0], pair)          # (hp, n, dh)
            v2 = stk(v_ref[0], pair)
            do2 = stk(do, pair)
            o2 = stk(ob, pair)
            bdims = (((2,), (2,)), ((0,), (0,)))
            s = jax.lax.dot_general(q2, k2, bdims,
                                    preferred_element_type=jnp.float32)
            s = s * sm_scale
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < n_valid, s, MASK_VALUE)
            m = jnp.max(s, axis=2, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=2, keepdims=True)
            di = jnp.sum(o2.astype(jnp.float32) * do2.astype(jnp.float32),
                         axis=2, keepdims=True)
            dp = jax.lax.dot_general(do2, v2, bdims,
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - di) * sm_scale
            dsb = ds.astype(q_ref.dtype)
            pb = p.astype(q_ref.dtype)
            dq2 = jax.lax.dot_general(dsb, k2, (((2,), (1,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32)
            dk2 = jax.lax.dot_general(dsb, q2, (((1,), (1,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32)
            dv2 = jax.lax.dot_general(pb, do2, (((1,), (1,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32)
            for i, _h in enumerate(pair):
                dqs.append(dq2[i].astype(dq_ref.dtype))
                dks.append(dk2[i])
                dvs.append(dv2[i])
        dq_ref[0] = jnp.concatenate(dqs, axis=1)
        dk_scr[...] += jnp.concatenate(dks, axis=1)
        dv_scr[...] += jnp.concatenate(dvs, axis=1)

    @pl.when(qi == n_q_blocks - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _bwd_call(q, k, v, o, do, num_heads, sm_scale, n_valid, block_q, variant):
    b, n, d = q.shape
    nq = n // block_q
    return pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads, sm_scale=sm_scale,
                          n_valid=n_valid, n_q_blocks=nq, variant=variant),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 0)),
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),
            pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b_, qi: (b_, qi, 0)),
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 0)),
            pl.BlockSpec((1, n, d), lambda b_, qi: (b_, 0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, n, d), q.dtype)] * 3,
        scratch_shapes=[
            pltpu.VMEM((n, d), jnp.float32),
            pltpu.VMEM((n, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * n * n * d, bytes_accessed=b * n * d * 2 * 6,
            transcendentals=b * n * n * num_heads,
        ),
    )(q, k, v, o, do)


def exp_bwd_variants(cfg):
    import numpy as np

    b, n, d, h = cfg.batch[0], cfg.n_pad, cfg.dim, cfg.heads
    dh = d // h
    sm = dh**-0.5
    key = jax.random.key(0)
    q, k, v, o, do = (jax.random.normal(jax.random.key(i), (b, n, d), jnp.bfloat16)
                      for i in range(5))
    from diverse_channel_vit_tpu.ops.attention import _pick_block_q_bwd

    bq = _pick_block_q_bwd(n, dh)
    outs = {}
    for variant in ("pair_staged", "pair_batched"):
        fn = jax.jit(functools.partial(
            _bwd_call, num_heads=h, sm_scale=sm, n_valid=cfg.n_valid,
            block_q=bq, variant=variant))

        def chain(q, k, v, o, do, fn=fn):
            outs = []
            for _ in range(L):
                dq, dk, dv = fn(q, k, v, o, do)
                outs.append(dq[0, 0, 0].astype(jnp.float32)
                            + dk[0, 0, 0].astype(jnp.float32)
                            + dv[0, 0, 0].astype(jnp.float32))
                q = q + 0 * dq  # serialize layers
            return jnp.stack(outs).sum()

        try:
            dt = bench(jax.jit(chain), q, k, v, o, do)
            report(f"bwd {variant} bq={bq} B={b} N={n} dh={dh}", dt)
            outs[variant] = _bwd_call(q, k, v, o, do, h, sm, cfg.n_valid, bq,
                                      variant)
        except Exception as e:
            print(f"bwd {variant}: FAILED {type(e).__name__}: {str(e)[:200]}")
    if len(outs) == 2:
        a, bb = outs["pair_staged"], outs["pair_batched"]
        diffs = [float(jnp.max(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32))))
                 for x, y in zip(a, bb)]
        print("numerics max |staged - batched| dq/dk/dv:", diffs)


# ---------------------------------------------------------------------------
# full train step at several batch sizes
# ---------------------------------------------------------------------------


def exp_step(cfg):
    import bench as bench_mod  # repo-root bench.py

    for bsz in cfg.batch:
        try:
            ips = bench_mod.flagship_imgs_per_sec(num_heads=cfg.heads, batch=bsz)
            print(f"train step batch={bsz} heads={cfg.heads}: "
                  f"{ips:.1f} imgs/s ({bsz/ips*1e3:.1f} ms/step)", flush=True)
        except Exception as e:
            print(f"train step batch={bsz}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


def exp_small_k(cfg):
    """Recipe-path regime: step throughput at small k vs per-step batch
    (VERDICT r2 #6 — small-k HCS steps are dense-dominated)."""
    import bench as bench_mod

    for k in (2, 4):
        for bsz in cfg.batch:
            try:
                model, state, data, mesh = bench_mod._setup(cfg.heads, bsz)
                step = bench_mod._mk_step(model, k, mesh)
                ips, _ = bench_mod._measure(state, data, [step], bsz, iters=20)
                print(f"k={k} batch={bsz}: {ips:.1f} imgs/s "
                      f"({bsz/ips*1e3:.1f} ms/step)", flush=True)
            except Exception as e:
                print(f"k={k} batch={bsz}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


def exp_smap(cfg):
    """shard_map wrapper overhead at mesh {data:1} vs the plain jit step —
    the single-chip cost of the multi-chip contract (VERDICT r2 #7)."""
    import bench as bench_mod
    from diverse_channel_vit_tpu.parallel import make_mesh

    bsz = cfg.batch[0]
    model, state, data, _ = bench_mod._setup(cfg.heads, bsz)
    plain = bench_mod._mk_step(model, None, None)
    ips, state = bench_mod._measure(state, data, [plain], bsz, iters=20)
    print(f"plain jit step:          {ips:.1f} imgs/s", flush=True)
    mesh1 = make_mesh({"data": 1, "model": 1})
    smap = bench_mod._mk_step(model, None, mesh1)
    # _data_sharded is False at data=1 — force the wrapper for measurement
    from diverse_channel_vit_tpu.training import steps as steps_mod

    orig = steps_mod._data_sharded
    steps_mod._data_sharded = lambda m: m is not None
    try:
        smap = bench_mod._mk_step(model, None, mesh1)
        ips2, _ = bench_mod._measure(state, data, [smap], bsz, iters=20)
        print(f"shard_map {{data:1}} step: {ips2:.1f} imgs/s "
              f"(overhead {100 * (ips - ips2) / ips:+.1f}%)", flush=True)
    finally:
        steps_mod._data_sharded = orig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp", choices=["chain", "bwd-variants", "step", "small-k",
                                    "smap"])
    ap.add_argument("--batch", type=int, nargs="+", default=[64])
    ap.add_argument("--n", type=int, default=1569)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--heads", type=int, default=6)
    cfg = ap.parse_args()
    cfg.n_valid = cfg.n
    cfg.n_pad = -(-cfg.n // 128) * 128
    print(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    {"chain": exp_chain, "bwd-variants": exp_bwd_variants, "step": exp_step,
     "small-k": exp_small_k, "smap": exp_smap}[cfg.exp](cfg)


if __name__ == "__main__":
    main()
