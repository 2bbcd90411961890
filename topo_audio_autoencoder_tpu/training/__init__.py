"""Training layer: objective, jitted steps, trainer shell, checkpointing."""

from .losses import LossWeights, autoencoder_loss
from .metrics import MetricWriter, TrainingMetrics
from .checkpoint import CheckpointManager
from .train_step import (
    TrainState,
    anneal_temperature,
    component_grad_norms,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    make_indexed_train_step,
    make_scan_train_step,
    make_scan_indexed_train_step,
    make_sharded_corpus_gather,
)
from .trainer import Trainer, TrainerConfig
from .tuner import GridState, VmappedGridTuner

__all__ = [
    "LossWeights",
    "autoencoder_loss",
    "MetricWriter",
    "TrainingMetrics",
    "CheckpointManager",
    "TrainState",
    "anneal_temperature",
    "component_grad_norms",
    "create_train_state",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "make_indexed_train_step",
    "make_scan_train_step",
    "make_scan_indexed_train_step",
    "make_sharded_corpus_gather",
    "Trainer",
    "GridState",
    "VmappedGridTuner",
    "TrainerConfig",
]
