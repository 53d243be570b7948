"""Utilities: checkpointing, metrics, profiling."""

from .checkpoint import MODEL_FILENAME, CheckpointManager, load_params, save_params
from .metrics import MetricsLogger, Stopwatch

__all__ = [
    "MODEL_FILENAME",
    "CheckpointManager",
    "load_params",
    "save_params",
    "MetricsLogger",
    "Stopwatch",
]
