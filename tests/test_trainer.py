"""End-to-end Trainer tests: loop, validation, checkpoints, resume."""

import glob
import json
import os

import numpy as np
import pytest

from phiseg_tpu.data import get_dataset
from phiseg_tpu.engine.config import ExperimentConfig
from phiseg_tpu.engine.trainer import Trainer


@pytest.fixture
def cfg(tmp_path, monkeypatch):
    monkeypatch.setenv("PHISEG_LOG_ROOT", str(tmp_path))
    return ExperimentConfig(
        experiment_name="trainer_test",
        model_family="phiseg",
        latent_levels=2,
        resolution_levels=4,
        n0=2,
        zdim0=2,
        image_size=(16, 16, 1),
        compute_dtype="float32",
        norm="none",
        data_identifier="synthetic",
        batch_size=4,
        validation_frequency=10,
        tensorboard_update_frequency=5,
        num_validation_images=4,
        validation_samples=3,
        augment_on_device=False,
    )


def test_trainer_end_to_end_and_resume(cfg, tmp_path):
    data = get_dataset(cfg, n_train=16, n_val=4, n_test=4)
    trainer = Trainer(cfg)
    log_dir = trainer.log_dir
    trainer.train(data, num_iter=21)

    # config snapshot for provenance (ref phiseg_train.py:44-47)
    assert os.path.exists(os.path.join(log_dir, "config.json"))
    # metrics written
    lines = [json.loads(l) for l in open(os.path.join(log_dir, "metrics.jsonl"))]
    assert any("validation_GED" in l for l in lines)
    assert any("batch_total_loss" in l for l in lines)
    # event file exists and is non-trivial
    evs = glob.glob(os.path.join(log_dir, "events.out.tfevents.*"))
    assert evs and os.path.getsize(evs[0]) > 100
    # latest + best checkpoints exist
    assert trainer.ckpt.has_checkpoint("latest")
    assert trainer.ckpt.has_checkpoint("best_dice")
    assert trainer.ckpt.has_checkpoint("best_ged")
    last_step = trainer.ckpt.latest_step("latest")

    # resume: a fresh Trainer on the same log dir picks up where it left off
    trainer2 = Trainer(cfg)
    assert trainer2.init_step == last_step
    trainer2.train(data, num_iter=last_step + 5)
    assert int(trainer2.state.step) == last_step + 5


def test_trainer_validation_metrics_sane(cfg):
    data = get_dataset(cfg, n_train=16, n_val=4, n_test=4)
    trainer = Trainer(cfg)
    scalars = trainer.do_validation(data, step=0)
    assert 0.0 <= scalars["validation_dice_mean_score"] <= 1.0
    assert np.isfinite(scalars["validation_GED"])
    assert -1.0 <= scalars["validation_NCC"] <= 1.0
    assert np.isfinite(scalars["validation_neg_elbo"])


def test_trainer_no_resume_flag(cfg):
    data = get_dataset(cfg, n_train=16, n_val=4, n_test=4)
    t1 = Trainer(cfg)
    t1.train(data, num_iter=11)
    t2 = Trainer(cfg, resume=False)
    assert t2.init_step == 0
