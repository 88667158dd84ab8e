"""Novel-channel synthesis tests: plan construction mirrors the reference's
walking-cursor semantics; synthesized rows average the right sources; the
trainer eval path consumes them."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diverse_channel_vit_tpu.ops.novel_channels import (
    dynamic_input_corr,
    flatten_training_channels,
    synthesis_plan,
    synthesize_rows,
)

MAPPER = {"Allen": [5, 2, 6], "HPA": [3, 6, 5, 0], "CP": [5, 0, 7, 1, 4]}


def test_flatten_training_channels():
    assert flatten_training_channels(MAPPER, "Allen_HPA") == [5, 2, 6, 3, 6, 5, 0]


def test_plan_seen_channels_pass_through():
    # train on Allen+HPA (channels {5,2,6,3,0}); CP has novel {7, 1, 4}
    plan = synthesis_plan(MAPPER, "CP", "Allen_HPA", "avg_2")
    # CP = [5, 0, 7, 1, 4]: 5 and 0 seen, 7/1/4 novel
    assert plan[0] == ("avg", [5])
    assert plan[1] == ("avg", [0])
    bank = [5, 2, 6, 3, 6, 5, 0]
    # cursor advances per novel channel
    assert plan[2] == ("avg", [bank[0], bank[1]])
    assert plan[3] == ("avg", [bank[1], bank[2]])
    assert plan[4] == ("avg", [bank[2], bank[3]])


def test_plan_not_in_chunk_bank():
    plan = synthesis_plan(MAPPER, "CP", "Allen_HPA", "avg_2_not_in_chunk")
    # bank = training channels not in CP = [2, 6, 3, 6]
    assert plan[2] == ("avg", [2, 6])


def test_plan_zero_and_replicate():
    plan_z = synthesis_plan(MAPPER, "CP", "Allen_HPA", "zero")
    assert plan_z[2] == ("zero", [])
    plan_r = synthesis_plan(MAPPER, "CP", "Allen_HPA", "replicate")
    assert plan_r[2] == ("avg", [5])


def test_synthesize_rows_averages():
    table = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    plan = [("avg", [0]), ("avg", [1, 3]), ("zero", [])]
    rows = synthesize_rows(table, plan)
    np.testing.assert_allclose(np.asarray(rows[0]), np.asarray(table[0]))
    np.testing.assert_allclose(np.asarray(rows[1]), np.asarray((table[1] + table[3]) / 2))
    np.testing.assert_allclose(np.asarray(rows[2]), 0.0)


def test_synthesize_rows_on_4d_bank():
    bank = jnp.arange(6 * 2 * 3 * 3, dtype=jnp.float32).reshape(6, 2, 3, 3)
    rows = synthesize_rows(bank, [("avg", [2, 4]), ("zero", [])])
    assert rows.shape == (2, 2, 3, 3)
    np.testing.assert_allclose(np.asarray(rows[0]), np.asarray((bank[2] + bank[4]) / 2))


def test_dynamic_input_corr_variants():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 5, 8, 8)).astype(np.float32))
    bank = jnp.asarray(rng.normal(size=(4, 3, 8, 8)).astype(np.float32))  # 4 exemplars, 3 train ch
    emb = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    training_channels = [5, 2, 6]
    for variant in (1, 2, 3, 4):
        out = dynamic_input_corr(variant, x, 2, bank, emb, training_channels)
        assert out.shape == (3, 16)
        assert np.all(np.isfinite(np.asarray(out)))
    # variants that replicate a trained channel return exact table rows
    out1 = np.asarray(dynamic_input_corr(1, x, 2, bank, emb, training_channels))
    table = np.asarray(jnp.take(emb, jnp.asarray(training_channels), axis=0))
    for row in out1:
        assert any(np.allclose(row, t) for t in table)


def test_trainer_loo_eval(tmp_path):
    """CHAMMI-style LOO: train on Allen_HPA, eval CP with synthesized embeds."""
    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.trainer import Trainer

    cfg = load_config("synthetic_cfg", [
        "train.num_epochs=1", "train.debug=True", "train.batch_size=8",
        "dataset.num_train_samples=16", "dataset.num_eval_samples=8",
        "hardware.num_workers=0", "model.attention_impl=xla",
        "model.new_channel_inits=[avg_2,zero]",
        f"train.checkpoints={tmp_path}",
    ])
    trainer = Trainer(cfg)
    # fake a mapper where the test split has novel channels (loader yields
    # 8-channel images, so split channel lists stay 8 wide; valid matches
    # train so it runs once without synthesis)
    trainer.mapper = {
        "train": [0, 1, 2, 3],
        "valid": [0, 1, 2, 3, 4, 5, 6, 7],
        "test": [0, 1, 2, 3, 4, 5, 6, 7],
    }
    res = trainer.eval_regular(1)
    assert "test/avg_2/accuracy" in res
    assert "test/zero/accuracy" in res
    assert "valid/accuracy" in res


def test_trainer_dynamic_input_corr_eval(tmp_path):
    from diverse_channel_vit_tpu.config import load_config
    from diverse_channel_vit_tpu.trainer import Trainer

    cfg = load_config("synthetic_cfg", [
        "train.num_epochs=1", "train.debug=True", "train.batch_size=8",
        "dataset.num_train_samples=16", "dataset.num_eval_samples=8",
        "hardware.num_workers=0", "model.attention_impl=xla",
        "model.new_channel_inits=[dynamic_input_corr_1,dynamic_input_corr_4]",
        f"train.checkpoints={tmp_path}",
    ])
    trainer = Trainer(cfg)
    trainer.mapper = {
        "train": [0, 1, 2, 3],
        "valid": [0, 1, 2, 3, 4, 5, 6, 7],
        "test": [0, 1, 2, 3, 4, 5, 6, 7],  # 4 novel channels
    }
    # the test loader yields 8-channel images; train loader 8 too — slice the
    # bank channels to the train mapper inside _dynamic_bank via loader data
    res = trainer.eval_regular(1)
    assert "test/dynamic_input_corr_1/accuracy" in res
    assert "test/dynamic_input_corr_4/accuracy" in res
    assert all(np.isfinite(v) for v in res.values())
