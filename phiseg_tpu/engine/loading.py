"""Load a trained experiment from its log dir (config snapshot + checkpoint).

Equivalent of the reference eval scripts' pattern: glob the config out of the
model dir, rebuild the graph and restore a tagged checkpoint
(phiseg_test_quantitative.py:84-99, phiseg/phiseg_model.py:505-525).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax

from phiseg_tpu.engine.checkpoint import CheckpointManager
from phiseg_tpu.engine.config import ExperimentConfig
from phiseg_tpu.engine.train import build_model, create_train_state, make_optimizer


def load_experiment(log_dir: str, tag: str = "latest"):
    """Returns (cfg, model, state, step) restored from log_dir."""
    cfg_path = os.path.join(log_dir, "config.json")
    if not os.path.exists(cfg_path):
        raise FileNotFoundError(
            f"no config.json snapshot in {log_dir} -- was this dir created by "
            "phiseg_tpu.cli.train?"
        )
    cfg = ExperimentConfig.load(cfg_path)
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(cfg.seed), tx)
    state, step = CheckpointManager(log_dir).restore(state, tag)
    return cfg, model, state, step
