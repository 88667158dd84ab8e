"""Miniature JUMP-CP-shaped fixture tree (reference ``datasets/jump_cp.py``).

Builds the full on-disk surface the reference JUMPCP dataset reads:
``jumpcp/BR00116991.pq`` (cyto-mask df: path / ID / well_loc),
``jumpcp/platemap_and_metadata/JUMP-Target-1_{pert}_{platemap,metadata}.tsv``
(parquet despite the extension, as the reference reads them), and one
float32 ``(8, img, img)`` .npy per row under ``imgs/``. Class signal is a
per-class channel-mean signature plus noise so short runs produce
above-chance, non-degenerate accuracies.

Usage: python scripts/make_jumpcp_fixture.py ROOT [n_rows] [img]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

N_CLASSES = 6  # labeled targets; well A07 is the NaN-target negative control


def main(root: str, n: int = 120, img: int = 32) -> str:
    os.makedirs(os.path.join(root, "jumpcp", "platemap_and_metadata"), exist_ok=True)
    os.makedirs(os.path.join(root, "imgs"), exist_ok=True)
    rng = np.random.default_rng(0)
    # 6 labeled wells (labels 1..6 after the reference's codes+1) plus one
    # negative-control well whose target is NaN -> label 0 (the reference
    # asserts min(codes)==0, jump_cp.py:46)
    wells = [f"A{j:02d}" for j in range(1, N_CLASSES + 2)]
    protos = rng.normal(0, 1, size=(N_CLASSES + 1, 8, 1, 1))
    paths, locs = [], []
    for i in range(n):
        im = protos[i % (N_CLASSES + 1)] + rng.normal(0, 0.6, (8, img, img))
        np.save(os.path.join(root, f"imgs/c{i}.npy"), im.astype(np.float32))
        # the reference rewrites this s3 prefix to root_dir (jump_cp.py:129)
        paths.append(f"s3://insitro-research-2023-context-vit/imgs/c{i}.npy")
        locs.append(wells[i % (N_CLASSES + 1)])
    pd.DataFrame({"path": paths, "ID": range(n), "well_loc": locs}).to_parquet(
        os.path.join(root, "jumpcp", "BR00116991.pq"))
    pm = os.path.join(root, "jumpcp", "platemap_and_metadata")
    for pert, col in [("compound", "target"), ("crispr", "gene"), ("orf", "gene")]:
        pd.DataFrame({"broad_sample": [f"s{k}" for k in range(N_CLASSES + 1)],
                      "well_position": wells}).to_parquet(
            os.path.join(pm, f"JUMP-Target-1_{pert}_platemap.tsv"))
        pd.DataFrame({"broad_sample": [f"s{k}" for k in range(N_CLASSES + 1)],
                      col: [f"t{k}" for k in range(N_CLASSES)] + [None]}).to_parquet(
            os.path.join(pm, f"JUMP-Target-1_{pert}_metadata.tsv"))
    return root if root.endswith("/") else root + "/"


if __name__ == "__main__":
    r = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    img = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    print(main(r, n, img))
