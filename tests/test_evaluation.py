"""Evaluation tests: JAX kNN vs sklearn exact-neighbors oracle, metric
parity vs sklearn, and the full MorphEm benchmark protocol on a tiny
synthetic CHAMMI fixture."""

import os

import numpy as np
import pandas as pd
import pytest

from diverse_channel_vit_tpu.evaluation import (
    KNeighbors,
    classification_report_dict,
    evaluate,
    macro_f1,
    run_benchmark,
)
from diverse_channel_vit_tpu.evaluation.benchmark import chammi_score


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_knn_matches_sklearn(metric):
    from sklearn.neighbors import KNeighborsClassifier

    rng = np.random.default_rng(0)
    X_train = rng.normal(size=(300, 32)).astype(np.float32)
    y_train = rng.integers(0, 5, 300)
    X_test = rng.normal(size=(77, 32)).astype(np.float32)

    mine = KNeighbors(k=1, metric=metric).fit(X_train, y_train).predict(X_test)
    sk_metric = "euclidean" if metric == "l2" else "cosine"
    ref = KNeighborsClassifier(n_neighbors=1, metric=sk_metric).fit(X_train, y_train).predict(X_test)
    assert (mine == ref).mean() > 0.99  # allow distance ties


def test_macro_f1_and_report_match_sklearn():
    from sklearn.metrics import classification_report, f1_score

    rng = np.random.default_rng(1)
    y_true = rng.integers(0, 4, 200)
    y_pred = np.where(rng.random(200) < 0.7, y_true, rng.integers(0, 4, 200))
    assert np.isclose(
        macro_f1(y_true, y_pred), f1_score(y_true, y_pred, average="macro")
    )
    labels = np.unique(y_true).tolist()
    names = [f"c{l}" for l in labels]
    mine = classification_report_dict(y_true, y_pred, labels, names)
    ref = classification_report(y_true, y_pred, labels=labels, target_names=names, output_dict=True)
    for name in names + ["macro avg", "weighted avg"]:
        for k in ("precision", "recall", "f1-score"):
            assert np.isclose(mine[name][k], ref[name][k]), (name, k)
    assert np.isclose(mine["accuracy"], ref["accuracy"])


def _make_chammi_fixture(tmp_path, dataset, n=120, dim=16, with_leaveout=None):
    """Synthetic enriched_meta.csv + features.npy with separable classes."""
    rng = np.random.default_rng(hash(dataset) % 2**31)
    labels = rng.integers(0, 3, n)
    protos = rng.normal(size=(3, dim)) * 4
    feats = protos[labels] + rng.normal(size=(n, dim))
    split = np.array(["Train"] * (n // 2) + ["Task_one"] * (n // 4) + ["Task_two"] * (n - n // 2 - n // 4))
    df = pd.DataFrame({
        "Label": [f"class_{l}" for l in labels],
        "train_test_split": split,
        "Task_one": split == "Task_one",
        "Task_two": split == "Task_two",
    })
    if with_leaveout:
        task, col = with_leaveout
        mask = np.zeros(n, bool)
        mask[-n // 8 :] = True  # take only half of the Task_two block
        df[task] = mask
        df.loc[mask, "train_test_split"] = task
        df["Task_two"] = df["train_test_split"] == "Task_two"
        df["Task_one"] = df["train_test_split"] == "Task_one"
        df[col] = [f"g{i % 2}" for i in range(n)]
    ddir = tmp_path / "meta" / dataset
    fdir = tmp_path / "feat" / dataset
    os.makedirs(ddir), os.makedirs(fdir)
    df.to_csv(ddir / "enriched_meta.csv", index=False)
    np.save(fdir / "features.npy", feats.astype(np.float32))


def test_evaluate_protocol_and_leaveout(tmp_path):
    _make_chammi_fixture(tmp_path, "HPA", with_leaveout=("Task_three", "cell_type"))
    res = evaluate(
        str(tmp_path / "feat/HPA/features.npy"),
        str(tmp_path / "meta/HPA/enriched_meta.csv"),
        "Task_three", "cell_type", "knn", True, "cosine",
    )
    assert res["tasks"] == ["Task_one", "Task_two", "Task_three"]
    assert all(0 <= a <= 1 for a in res["accuracies"])
    assert res["accuracies"][0] > 0.8  # separable classes => high accuracy


def test_run_benchmark_and_chammi_score(tmp_path):
    _make_chammi_fixture(tmp_path, "Allen")
    _make_chammi_fixture(tmp_path, "HPA", with_leaveout=("Task_three", "cell_type"))
    _make_chammi_fixture(tmp_path, "CP", with_leaveout=("Task_four", "Plate"))
    df = run_benchmark(
        root_dir=str(tmp_path / "meta"),
        dest_dir=str(tmp_path / "results"),
        feature_dir=str(tmp_path / "feat"),
        feature_file="features.npy",
        classifier="knn",
        knn_metric="cosine",
    )
    assert set(df.columns) == {"dataset", "task", "classifier", "accuracy", "f1_score_macro"}
    assert set(df.dataset) == {"Allen", "HPA", "CP"}
    score = chammi_score(df)
    assert 0.0 < score <= 1.0
    # artifacts written
    assert os.path.exists(tmp_path / "results" / "knn_cosine_full_results.csv")
    assert os.path.exists(tmp_path / "results" / "Allen_knn_cosine_results.json")


def test_sgd_classifier_path(tmp_path):
    _make_chammi_fixture(tmp_path, "Allen")
    res = evaluate(
        str(tmp_path / "feat/Allen/features.npy"),
        str(tmp_path / "meta/Allen/enriched_meta.csv"),
        None, None, "sgd", False, "",
    )
    assert res["accuracies"][0] > 0.6


@pytest.mark.parametrize("metric", ["l2", "cosine"])
def test_sharded_knn_matches_single_device(metric):
    """Bank sharded over the 8-device CPU mesh must return the same
    predictions as the single-device path."""
    rng = np.random.default_rng(3)
    X_train = rng.normal(size=(333, 24)).astype(np.float32)  # non-divisible size
    y_train = rng.integers(0, 5, 333)
    X_test = rng.normal(size=(50, 24)).astype(np.float32)

    single = KNeighbors(k=1, metric=metric, shard_bank=False).fit(X_train, y_train)
    sharded = KNeighbors(k=1, metric=metric, shard_bank=True).fit(X_train, y_train)
    assert sharded._mesh is not None
    p1 = single.predict(X_test)
    p2 = sharded.predict(X_test)
    assert (p1 == p2).mean() > 0.99  # distance ties may differ


def test_jax_convnext_feature_backbone(tmp_path):
    """convnext_jax backbone: timm-layout torch checkpoint -> converted flax
    trunk, stem conv applied on-device; features finite with the right dim
    and the stem matches a manual conv (morphem feature_extraction role)."""
    import torch

    from diverse_channel_vit_tpu.evaluation.feature_extraction import (
        jax_convnext_backbone,
    )

    torch.manual_seed(0)
    depths, dims = (1, 1), (8, 16)
    sd = {"stem.0.weight": torch.randn(8, 3, 4, 4) * 0.1,
          "stem.0.bias": torch.randn(8) * 0.1,
          "stem.1.weight": torch.ones(8), "stem.1.bias": torch.zeros(8)}
    for si, dim in enumerate(dims):
        if si > 0:
            sd[f"stages.{si}.downsample.0.weight"] = torch.ones(dims[si - 1])
            sd[f"stages.{si}.downsample.0.bias"] = torch.zeros(dims[si - 1])
            sd[f"stages.{si}.downsample.1.weight"] = torch.randn(dim, dims[si - 1], 2, 2) * 0.1
            sd[f"stages.{si}.downsample.1.bias"] = torch.zeros(dim)
        b = f"stages.{si}.blocks.0"
        sd[f"{b}.conv_dw.weight"] = torch.randn(dim, 1, 7, 7) * 0.1
        sd[f"{b}.conv_dw.bias"] = torch.zeros(dim)
        sd[f"{b}.norm.weight"] = torch.ones(dim)
        sd[f"{b}.norm.bias"] = torch.zeros(dim)
        sd[f"{b}.mlp.fc1.weight"] = torch.randn(4 * dim, dim) * 0.1
        sd[f"{b}.mlp.fc1.bias"] = torch.zeros(4 * dim)
        sd[f"{b}.mlp.fc2.weight"] = torch.randn(dim, 4 * dim) * 0.1
        sd[f"{b}.mlp.fc2.bias"] = torch.zeros(dim)
        sd[f"{b}.gamma"] = torch.full((dim,), 0.1)
    path = tmp_path / "convnext.pth"
    torch.save(sd, path)

    run, feat_dim = jax_convnext_backbone(str(path), depths=depths, dims=dims)
    assert feat_dim == 16
    x = np.random.default_rng(0).normal(size=(2, 3, 16, 16)).astype(np.float32)
    feats = run(x)
    assert feats.shape == (2, 16)
    assert np.all(np.isfinite(feats))
    # determinism across calls (jitted, no rng)
    np.testing.assert_array_equal(feats, run(x))
