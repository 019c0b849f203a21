from . import checkpoint, ensemble, evaluate, init_surgery, loop, loss, optim, step
from .checkpoint import (
    check_metadata,
    create_checkpoint_manager,
    restore_checkpoint,
    restore_raw,
    save_checkpoint,
)
from .ensemble import evolve_model_ensemble
from .evaluate import compute_testset_loss, compute_testset_loss_individual
from .loop import train
from .loss import batch_loss, sigmoid_bce_sum
from .optim import create_learning_rate_schedule, setup_optimizers
from .step import make_train_step, reshape_to_minibatches

__all__ = [
    "checkpoint",
    "ensemble",
    "evaluate",
    "loop",
    "loss",
    "optim",
    "step",
    "check_metadata",
    "create_checkpoint_manager",
    "restore_checkpoint",
    "restore_raw",
    "save_checkpoint",
    "evolve_model_ensemble",
    "compute_testset_loss",
    "compute_testset_loss_individual",
    "train",
    "batch_loss",
    "sigmoid_bce_sum",
    "create_learning_rate_schedule",
    "setup_optimizers",
    "make_train_step",
    "reshape_to_minibatches",
]
