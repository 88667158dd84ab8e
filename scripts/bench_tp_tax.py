"""Quantify the TP fused-path tax on the real TPU (VERDICT r3 item 4).

Under a non-data mesh axis (``model``/``expert`` > 1) the Block keeps the
lane-packed flash kernel alive via the inner shard_map
(``ops/attention.py:set_tp_attention``) but auto-disables the
``attend_project``/``ln_mlp`` fused kernels — their weights live in-kernel
and are not sharded. A TP user therefore pays exactly the fused-vs-unfused
delta per chip. A single chip can't run TP=2, but it CAN run both Block
paths: this measures the full flagship train step with
``fused_block.FUSED_BLOCK_DEFAULT`` on vs off (flash stays on either way),
at the reference 6-head geometry and the recommended dh=128 geometry.

Run WITHOUT JAX_PLATFORMS (needs the chip):
    python scripts/bench_tp_tax.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diverse_channel_vit_tpu.compile_cache import enable

enable()

import jax

from bench import _measure, _mk_step, _setup


def measure(num_heads: int, fused) -> float:
    from diverse_channel_vit_tpu.ops import fused_block as fb

    old = fb.FUSED_BLOCK_DEFAULT
    fb.set_fused_block(fused)
    try:
        n = len(jax.devices())
        model, state, data, mesh = _setup(num_heads, 64 * n)
        step = _mk_step(model, None, mesh)
        ips, _ = _measure(state, data, [step], 64 * n, iters=20)
        return ips / n
    finally:
        fb.set_fused_block(old)


def main():
    out = {}
    for name, heads in (("dh64_6head", 6), ("dh128_3head", 3)):
        on = measure(heads, True)
        off = measure(heads, False)
        # "mlp" = the round-4 TP path on one chip: unfused attention core +
        # fused ln_mlp (under a real TP mesh the same ln_mlp runs sharded
        # with one psum, so this is the per-chip projection of that path)
        mlp = measure(heads, "mlp")
        out[name] = {"fused_on": round(on, 1), "fused_off": round(off, 1),
                     "fused_mlp_only": round(mlp, 1),
                     "tp_tax_pct_old": round(100 * (1 - off / on), 1),
                     "tp_tax_pct_new": round(100 * (1 - mlp / on), 1)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
