"""Pack JUMP-CP per-cell ``.npy`` crops into ONE memmapped array.

The reference layout stores one small ``.npy`` file per cell crop
(``datasets/jump_cp.py`` — ~hundreds of thousands of files); at production
throughput the per-file open/read/close syscall traffic and filesystem
metadata churn dominate loader time. This tool writes

    <root>/jumpcp/packed_crops.npy            (N, 8, H, W) memmap-able
    <root>/jumpcp/packed_crops.npy.index.json {parquet path -> row}

and :class:`diverse_channel_vit_tpu.data.jump_cp.JUMPCP` automatically uses
them when present (exact same values — the packed array is float32 by
default; ``--dtype float16`` halves disk/IO at ~1e-3 relative loss).

Usage: python scripts/pack_jumpcp.py <root_dir> [--dtype float32|float16]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diverse_channel_vit_tpu.data.jump_cp import S3_PREFIX, PACKED_NAME


def main(root_dir: str, dtype: str = "float32",
         parquets=("jumpcp/BR00116991.pq",)) -> str:
    import pandas as pd

    df = pd.concat(
        [pd.read_parquet(os.path.join(root_dir, p)) for p in parquets],
        ignore_index=True,
    )
    paths = list(df["path"])
    first = np.load(paths[0].replace(S3_PREFIX, root_dir))
    out_path = os.path.join(root_dir, PACKED_NAME)
    out = np.lib.format.open_memmap(
        out_path, mode="w+", dtype=np.dtype(dtype),
        shape=(len(paths),) + first.shape,
    )
    index = {}
    for i, p in enumerate(paths):
        out[i] = np.load(p.replace(S3_PREFIX, root_dir))
        index[p] = i
        if i % 1000 == 0:
            print(f"  {i}/{len(paths)}", flush=True)
    out.flush()
    with open(out_path + ".index.json", "w") as f:
        json.dump(index, f)
    print(f"packed {len(paths)} crops -> {out_path} "
          f"({os.path.getsize(out_path) / 1e9:.2f} GB, {dtype})")
    return out_path


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("root_dir")
    ap.add_argument("--dtype", default="float32", choices=["float32", "float16"])
    a = ap.parse_args()
    main(a.root_dir, a.dtype)
