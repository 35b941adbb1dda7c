"""Training/evaluation engine: configs, objective, train step, trainer."""

from phiseg_tpu.engine.config import ExperimentConfig
from phiseg_tpu.engine.objective import phiseg_objective
from phiseg_tpu.engine.train import (
    TrainState,
    build_model,
    create_train_state,
    make_eval_loss_fn,
    make_sample_fn,
    make_train_step,
)

__all__ = [
    "ExperimentConfig",
    "phiseg_objective",
    "TrainState",
    "build_model",
    "create_train_state",
    "make_train_step",
    "make_sample_fn",
    "make_eval_loss_fn",
]
