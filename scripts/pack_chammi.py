"""Pack CHAMMI tape TIFFs into ONE memmapped blob.

The morphem70k layout stores one tape-format TIFF per cell (~70k files);
every epoch pays a per-file open + TIFF decode. This tool decodes each
image ONCE and writes

    <root>/chammi_packed.bin        raw pixel bytes, 16-byte aligned rows
    <root>/chammi_packed.index.json {file_path -> [byte_offset, h, w, dtype]}

:class:`diverse_channel_vit_tpu.data.morphem70k.SingleCellDataset` uses the
blob automatically when every row of its split is present — images come
back as zero-copy memmap views, bit-identical to the TIFF decode
(tests/test_datasets.py).

Usage: python scripts/pack_chammi.py <root_dir> [csv_name]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diverse_channel_vit_tpu.data.morphem70k import _read_image, PACKED_BIN

ALIGN = 16


def main(root_dir: str, csv_name: str = "morphem70k_v2.csv") -> str:
    import pandas as pd

    df = pd.read_csv(os.path.join(root_dir, csv_name))
    out_path = os.path.join(root_dir, PACKED_BIN)
    index = {}
    off = 0
    with open(out_path, "wb") as f:
        for i, rel in enumerate(df["file_path"]):
            img = _read_image(os.path.join(root_dir, rel))
            raw = np.ascontiguousarray(img)
            index[rel] = [off, img.shape[0], img.shape[1], str(raw.dtype)]
            f.write(raw.tobytes())
            off += raw.nbytes
            pad = (-off) % ALIGN
            if pad:
                f.write(b"\0" * pad)
                off += pad
            if i % 2000 == 0:
                print(f"  {i}/{len(df)}", flush=True)
    with open(out_path + ".index.json", "w") as f:
        json.dump(index, f)
    print(f"packed {len(df)} images -> {out_path} ({off / 1e9:.2f} GB)")
    return out_path


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:3]))
