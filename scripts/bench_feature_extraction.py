"""TPU-resident MorphEm feature-extraction timing (VERDICT r3 item 9).

The reference's ``morphem/feature_extraction.py:122-202`` is a throughput
surface too: pretrained backbone -> per-channel RGB crops -> features ->
kNN benchmark. Our ``dinov2_jax`` backbone is correctness-proven against
the hub model (tests/test_dinov2.py); only the weight DOWNLOAD is
env-blocked, and throughput is weight-value-independent — so this
synthesizes a randomly-initialized ``dinov2_vits14_reg``-shaped state dict
via transformers, runs the full fixture feature-dump -> kNN -> CHAMMI-score
pipeline on the v5e, and records imgs/s (and per-channel crop/s) plus
end-to-end wall time.

Run WITHOUT JAX_PLATFORMS (needs the chip):
    python scripts/bench_feature_extraction.py [n_per_chunk]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diverse_channel_vit_tpu.compile_cache import enable

enable()

ROOT = "/tmp/featbench"


def synth_dinov2_sd(path: str):
    """dinov2_vits14_reg geometry, random init (HF layout, accepted by
    models/dinov2.load_torch_dinov2_state)."""
    import torch
    import transformers

    cfg = transformers.Dinov2WithRegistersConfig(
        hidden_size=384, num_hidden_layers=12, num_attention_heads=6,
        intermediate_size=1536, patch_size=14, image_size=518,
        num_register_tokens=4, layerscale_value=1.0e-5)
    torch.manual_seed(0)
    m = transformers.Dinov2WithRegistersModel(cfg).eval()
    torch.save(m.state_dict(), path)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    fixture = os.path.join(ROOT, "fixture")
    dest = os.path.join(ROOT, "features")
    os.makedirs(ROOT, exist_ok=True)
    if not os.path.exists(os.path.join(fixture, "morphem70k_v2.csv")):
        from scripts.make_chammi_fixture import main as make_fixture

        make_fixture(fixture, n=n, img=64)
    weights = os.path.join(ROOT, "dinov2_synth.pt")
    if not os.path.exists(weights):
        synth_dinov2_sd(weights)

    from diverse_channel_vit_tpu.evaluation.feature_extraction import (
        get_save_features)

    chunk_channels = {"Allen": 3, "HPA": 4, "CP": 5}
    t_all = time.perf_counter()
    out = {}
    # warmup/compile pass over EVERY chunk (not timed): chan_fwd compiles
    # per channel count, so each chunk's first pass pays a compile — the
    # throughput claim is steady-state (the backbone + executables are
    # shared across calls via the module-level memo)
    for chunk in chunk_channels:
        get_save_features(fixture, "morphem70k_v2.csv", chunk, dest,
                          model="dinov2_jax", weights=weights, img_size=224,
                          batch_size=32)
    for chunk, c in chunk_channels.items():
        t0 = time.perf_counter()
        get_save_features(fixture, "morphem70k_v2.csv", chunk, dest,
                          model="dinov2_jax", weights=weights, img_size=224,
                          batch_size=32)
        dt = time.perf_counter() - t0
        out[chunk] = {"images": n, "channels": c,
                      "imgs_per_sec": round(n / dt, 1),
                      "crops_per_sec": round(n * c / dt, 1),
                      "seconds": round(dt, 1)}
        print(json.dumps({chunk: out[chunk]}), flush=True)

    from diverse_channel_vit_tpu.evaluation.benchmark import (chammi_score,
                                                              run_benchmark)

    t0 = time.perf_counter()
    df = run_benchmark(root_dir=fixture, dest_dir=os.path.join(ROOT, "res"),
                       feature_dir=dest, feature_file="features.npy",
                       classifier="knn", umap=False, use_gpu=True,
                       knn_metric="cosine")
    out["knn_benchmark_seconds"] = round(time.perf_counter() - t0, 1)
    out["chammi_score"] = round(chammi_score(df), 4)
    out["end_to_end_seconds"] = round(time.perf_counter() - t_all, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
