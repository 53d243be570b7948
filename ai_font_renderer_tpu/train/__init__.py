"""Training: fused device epochs + host-side control (scheduler, early stop)."""

from .loop import TrainResult, train
from .schedule import EarlyStopping, ReduceLROnPlateau
from .step import (
    TrainState,
    eval_epoch,
    init_state,
    make_optimizer,
    mse_loss,
    train_epoch,
    train_step,
)

__all__ = [
    "TrainResult",
    "train",
    "EarlyStopping",
    "ReduceLROnPlateau",
    "TrainState",
    "eval_epoch",
    "init_state",
    "make_optimizer",
    "mse_loss",
    "train_epoch",
    "train_step",
]
