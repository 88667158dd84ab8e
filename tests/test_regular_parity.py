"""Product-level parity on the REGULAR path with stochastic sampling ON.

Runs the ACTUAL torch reference trainer end-to-end on a JUMP-CP-shaped
fixture (subprocess; scripts/run_reference_regular.py) with
``enable_sample=True`` + ``hcs_sampling=lowest_cosine_prob`` — the DCS
draw happens LIVE inside the reference's forward — then this framework's
Trainer on the identical workload: transplanted init, matched recipe, the
reference's recorded batch schedule replayed, and the reference's realized
per-step channel subsets FORCED as ours (shared-draw strategy). Asserts:

- every per-step train loss: CE main + diversity extra under the sampled
  subsets (measured max |delta| 1.9e-4 f32)
- the effective lr of every update (exact) and the cosine weight-decay
  trajectory incl. the write-after-step lag (measured 4.3e-8)
- per-epoch ``eval_regular`` valid/test accuracies (measured float-equal)
- the final ``eval_subset_channels`` sweep (measured float-equal)

Reference: trainer.py:963-1028 (train_one_batch_regular), :386-472
(eval_regular), :475-545 (eval_subset_channels), models/dichavit.py:122-216
(the DCS sampler), trainer.py:217-228 + utils.py:563-573 (wd schedule).
"""

import os
import sys

import pytest

sys.path.insert(0, ".")

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent"),
]


@pytest.fixture(scope="module")
def report(tmp_path_factory):
    from scripts.run_regular_parity import run

    workdir = tmp_path_factory.mktemp("regular")
    return run(str(workdir), epochs=2)


def test_train_losses_match(report):
    assert report["n_steps"] == 18  # 2 epochs x 9 full batches (drop_last)
    # measured 1.9e-4 (f32, tiny model); 10x margin
    assert report["max_d_main_loss"] < 5e-3, report["max_d_main_loss"]
    assert report["max_d_total_loss"] < 5e-3, report["max_d_total_loss"]
    # the diversity extra loss rides the forced subsets: measured 9.7e-7
    assert report["max_d_extra_loss"] < 1e-4, report["max_d_extra_loss"]


def test_lr_wd_match_exactly(report):
    assert report["max_d_lr"] < 1e-9, report["max_d_lr"]
    # wd cosine table (weight_decay_end=0.4) vs our effective-wd schedule
    # with the write-after-step lag: measured 4.3e-8 (float32 cos)
    assert report["max_d_wd"] < 1e-6, report["max_d_wd"]


def test_eval_regular_and_subset_sweep_match(report):
    assert len(report["evals"]) == 3  # epoch 0 (pre-training), 1, 2
    for row in report["evals"]:
        for split in ("valid", "test"):
            assert split in row, row
            # accuracies in percentage points; measured ~6e-7
            assert row[split]["d"] <= 0.05, (row["epoch"], split, row[split])
    assert report["subset_sweep"], report
    for n, r in report["subset_sweep"].items():
        assert r["d"] <= 0.05, (n, r)
