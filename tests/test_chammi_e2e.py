"""CHAMMI end-to-end: fixture tree -> mixed-chunk training with DCS + CDL +
TDL -> MorphEm kNN benchmark -> CHAMMI score, all through the real config
surface. Regression-guards the in_channel_names placeholder bug (a literal
"FILL_LATER" once sized the channel tables to len(str) == 10)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")


@pytest.fixture(scope="module")
def chammi_root(tmp_path_factory):
    from scripts.make_chammi_fixture import main as make_fixture

    root = tmp_path_factory.mktemp("chammi")
    make_fixture(str(root), n=24, img=32)
    return str(root)


def _cfg(root, tmp_path, extra=()):
    from diverse_channel_vit_tpu.config import load_config

    return load_config("chammi_cfg", [
        "dataset=morphem70k_v2_12channels",
        f"++dataset.root_dir={root}", "++dataset.file_name=morphem70k_v2.csv",
        "++dataset.img_size=32", "++model.img_size=[32]", "++model.patch_size=8",
        "++model.pretrained_model_name=test", "++model.enable_sample=True",
        "++model.hcs_sampling=lowest_cosine_prob", "++model.proxy_loss_lambda=0.1",
        "++model.ortho_loss_v1_lambda=1.0", "++train.extra_loss_lambda=1",
        "++train.num_epochs=1", "++train.batch_size=12", "++hardware.num_workers=0",
        "++model.attention_impl=xla", f"++train.checkpoints={tmp_path}/ck",
        "++hardware.mesh.data=1",  # quotas of 4/chunk don't split over 8 fake devices
        f"++eval.root_dir={root}", f"++eval.feature_dir={tmp_path}/feat",
        f"++eval.dest_dir={tmp_path}/res",
        *extra,
    ])


def test_chammi_full_pipeline(chammi_root, tmp_path):
    from diverse_channel_vit_tpu.trainer import Trainer

    trainer = Trainer(_cfg(chammi_root, tmp_path))
    # channel tables sized by the dataset's 12 channel names, not a placeholder
    assert trainer.state.params["backbone"]["channel_embed"].shape[0] == 12
    metrics = trainer.train_one_epoch(1)
    for k in ("Allen/loss", "HPA/loss", "CP/loss", "grad_norm"):
        assert np.isfinite(metrics[k]), (k, metrics[k])
    # mixed loader uses the global 14-class vocabulary
    batch = next(iter(trainer.train_loaders["SHUFFLE_ALL"]))
    labels = np.concatenate([np.asarray(b["label"]) for b in batch.values()])
    assert labels.min() >= 0 and labels.max() <= 13
    allen_labels = np.asarray(batch["Allen"]["label"])
    assert allen_labels.min() >= 4  # Allen classes sit at 4..9 globally

    results = trainer.evaluate_model(1)
    assert "knn_cosine/chammi_score" in results
    assert 0.0 <= results["knn_cosine/chammi_score"] <= 1.0
    assert np.isfinite(results["accuracy"])


@pytest.mark.slow
def test_chammi_fixture_learning(chammi_root, tmp_path):
    """The system LEARNS, not just runs: overfit the CHAMMI fixture through
    the full Trainer (DCS + CDL/TDL + proxy loss) until train accuracy is
    near-perfect, then produce a CHAMMI score through the real benchmark
    pipeline (VERDICT r1 next-step #9)."""
    from diverse_channel_vit_tpu.trainer import Trainer

    trainer = Trainer(_cfg(chammi_root, tmp_path, extra=[
        "++train.num_epochs=70",
        "++optimizer.params.lr=0.003",
        "++model.enable_sample=False",  # overfit on full channels
        "++train.tps_prob=0.0",
        "++train.extra_loss_lambda=0.1",  # diversity losses fight overfit
        "++eval.every_n_epochs=1000",  # no mid-training eval
    ]))
    accs = []
    for epoch in range(1, trainer.total_epochs + 1):
        metrics = trainer.train_one_epoch(epoch)
        accs.append(np.mean([v for k, v in metrics.items() if k.endswith("/acc")]))
    assert max(accs) > 0.85, f"did not overfit the fixture: accs={accs[-5:]}"
    results = trainer.evaluate_model(trainer.total_epochs)
    score = results["knn_cosine/chammi_score"]
    assert 0.0 <= score <= 1.0 and np.isfinite(score)
