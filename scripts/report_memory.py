"""Persistent-HBM report: params + Adam moments per chip under the
sharding modes, across model scales.

Pure tree math over ``jax.eval_shape`` — no weights are materialised, no
accelerator is touched — so the table covers scales far beyond what any
single chip could init. "Persistent" = what must live in HBM *between*
steps (params + both Adam moments, f32 as the trainer keeps them);
transient peaks (activations, and under ZeRO-3 the forward's gathered
full-parameter copy) are workload-dependent and excluded — see
PERFORMANCE.md.

Modes (see parallel/zero.py, parallel/shardings.py):
- dp        : everything replicated (the reference's DDP layout)
- zero1     : Adam moments sharded 1/N over ``data``
- zero3     : params + moments sharded 1/N
- zero3+tp  : Megatron leaves over ``model``, ZeRO-3 claims the rest

Usage: JAX_PLATFORMS=cpu python scripts/report_memory.py [N_data] [tp]
"""

import sys

sys.path.insert(0, ".")

from diverse_channel_vit_tpu.compile_cache import enable, honor_env_platform

enable()
honor_env_platform()

import jax
import jax.numpy as jnp
import numpy as np


GEOMETRIES = {
    # name: (embed_dim, depth, num_heads)
    "DiChaViT-S (ref)": (384, 12, 6),
    "DiChaViT-S dh128": (384, 12, 3),
    "ViT-B": (768, 12, 12),
    "ViT-L": (1024, 24, 16),
    "ViT-H": (1280, 32, 16),
    "ViT-g": (1408, 40, 16),
}


def _param_shapes(embed_dim, depth, num_heads, n_channels=8, img=224,
                  patch=16, num_classes=161):
    from __graft_entry__ import _build_flagship

    model = _build_flagship(img, patch, depth, embed_dim, num_heads,
                            n_channels, num_classes, jnp.float32,
                            attention_impl="xla")
    x = jnp.zeros((1, n_channels, img, img), jnp.float32)
    cids = jnp.arange(n_channels)
    vs = jax.eval_shape(
        lambda r: model.init({"params": r, "dropout": r}, x, cids,
                             train=False),
        jax.random.key(0),
    )
    return vs["params"]


def _bytes(tree):
    return sum(
        int(np.prod(l.shape)) * 4 for l in jax.tree_util.tree_leaves(tree)
    )


def _sharded_bytes(tree, specs_fn):
    """Per-chip bytes when each leaf is divided by its spec's shard count."""
    specs = specs_fn(tree)
    total = 0
    for leaf, sh in zip(
        jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(specs)
    ):
        n_b = int(np.prod(leaf.shape)) * 4
        mesh = sh.mesh
        div = 1
        for part in sh.spec:
            if part is None:
                continue
            for ax in part if isinstance(part, tuple) else (part,):
                div *= dict(mesh.shape)[ax]
        total += n_b // div
    return total


def main():
    n_data = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tp = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from diverse_channel_vit_tpu.parallel import (
        zero1_opt_shardings,
        zero3_param_shardings,
    )
    from diverse_channel_vit_tpu.parallel.shardings import param_shardings

    # only the axis SIZES matter for the spec math — an AbstractMesh covers
    # any pod shape without fabricating devices
    from jax.sharding import AbstractMesh

    mesh = AbstractMesh((n_data,), ("data",))
    tp_mesh = (
        AbstractMesh((n_data, tp), ("data", "model")) if tp > 1 else None
    )

    print(f"\nPersistent state per chip (params + 2 Adam moments, f32), "
          f"data={n_data}" + (f", model(tp)={tp}" if tp_mesh else "") + ":\n")
    print("| model | params | dp | zero1 | zero3 |"
          + (" zero3+tp |" if tp_mesh else ""))
    print("|---|---|---|---|---|" + ("---|" if tp_mesh else ""))
    gb = 1 / (1024 ** 3)
    for name, (d, dep, h) in GEOMETRIES.items():
        p = _param_shapes(d, dep, h)
        pb = _bytes(p)
        dp = 3 * pb
        z1 = pb + 2 * _sharded_bytes(p, lambda t: zero1_opt_shardings(t, mesh))
        z3 = 3 * _sharded_bytes(p, lambda t: zero3_param_shardings(t, mesh))
        row = (f"| {name} | {pb / 4 / 1e6:.0f}M | {dp * gb:.2f} GB "
               f"| {z1 * gb:.2f} GB | {z3 * gb:.2f} GB |")
        if tp_mesh:
            z3tp = 3 * _sharded_bytes(
                p,
                lambda t: zero3_param_shardings(
                    t, tp_mesh, base=param_shardings(t, tp_mesh)),
            )
            row += f" {z3tp * gb:.2f} GB |"
        print(row)
    print("\nv5e HBM = 16 GB/chip. Transient peak adds activations and, "
          "under zero3, one gathered full-parameter copy during the step.")
    if tp_mesh:
        print("zero3+tp > zero3 is expected: TP-claimed leaves keep their "
              "model-axis sharding (1/tp) instead of 1/data — TP's value is "
              "sharding the *transient* gathered copy and the compute, not "
              "the persistent state.")


if __name__ == "__main__":
    main()
