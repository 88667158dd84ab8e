"""Generate a miniature CHAMMI-shaped dataset tree for end-to-end runs.

Produces the same on-disk surface the real morphem70k download has
(tape TIFFs + a metadata CSV + per-dataset enriched_meta.csv for MorphEm):

    <root>/morphem70k_v2.csv
    <root>/allen|hpa|cp/*.tif
    <root>/Allen|HPA|CP/enriched_meta.csv   (MorphEm eval metadata)

Usage: python scripts/make_chammi_fixture.py /tmp/chammi_fixture [n_per_chunk]
"""

import os
import sys

import numpy as np
import pandas as pd
from PIL import Image

CHUNKS = {"Allen": 3, "HPA": 4, "CP": 5}
CLASSES = {
    "Allen": ["M0", "M1M2", "M3", "M4M5", "M6M7_complete", "M6M7_single"],
    "HPA": ["golgi apparatus", "microtubules", "mitochondria", "nuclear speckles"],
    "CP": ["BRD-A29260609", "BRD-K04185004", "BRD-K21680192", "DMSO"],
}
# complete CHAMMI task surface (the score formula, trainer.py:711-731,
# reads Allen T2, HPA T2+T3, CP T2+T3+T4 — every task must exist so the
# reference's 0-fill .get() and a nanmean agree)
TASKS = {
    "Allen": ["Task_one", "Task_two"],
    "HPA": ["Task_one", "Task_two", "Task_three"],
    "CP": ["Task_one", "Task_two", "Task_three", "Task_four"],
}
LEAVEOUT = {"HPA": ("Task_three", "cell_type"), "CP": ("Task_four", "Plate")}


def main(root: str, n: int = 48, img: int = 64):
    rng = np.random.default_rng(0)
    rows = []
    for chunk, c in CHUNKS.items():
        os.makedirs(os.path.join(root, chunk.lower()), exist_ok=True)
        classes = CLASSES[chunk]
        protos = rng.normal(0.45, 0.25, size=(len(classes), c, 1, 1))
        # split plan: first half Train, the rest divided near-equally
        # across the chunk's tasks
        tasks = TASKS[chunk]
        n_test = n - n // 2
        per = [n_test // len(tasks) + (1 if i < n_test % len(tasks) else 0)
               for i in range(len(tasks))]
        splits = ["Train"] * (n // 2)
        for t, cnt in zip(tasks, per):
            splits += [t] * cnt
        meta_rows = []
        for i in range(n):
            label = classes[i % len(classes)]
            base = np.clip(protos[i % len(classes)] + rng.normal(0, 0.18, (c, img, img)), 0, 1)
            tape = np.concatenate([base[k] for k in range(c)], axis=1)
            rel = f"{chunk.lower()}/img_{i}.tif"
            Image.fromarray((tape * 255).astype(np.uint8)).save(os.path.join(root, rel))
            rows.append({"file_path": rel, "channel_width": img, "chunk": chunk,
                         "label": label, "train_test_split": splits[i]})
            meta_rows.append({"Label": label, "train_test_split": splits[i]})
        # MorphEm enriched_meta per dataset
        mdf = pd.DataFrame(meta_rows)
        if chunk in LEAVEOUT:
            _, col = LEAVEOUT[chunk]
            mdf[col] = [f"g{i % 2}" for i in range(n)]
        for t in tasks:
            mdf[t] = mdf["train_test_split"] == t
        os.makedirs(os.path.join(root, chunk), exist_ok=True)
        mdf.to_csv(os.path.join(root, chunk, "enriched_meta.csv"), index=False)
    pd.DataFrame(rows).to_csv(os.path.join(root, "morphem70k_v2.csv"), index=False)
    print(f"fixture at {root}: {len(rows)} images")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 48,
         int(sys.argv[3]) if len(sys.argv) > 3 else 64)
