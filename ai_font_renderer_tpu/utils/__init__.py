"""Utilities: checkpointing, metrics, profiling."""

from .checkpoint import MODEL_FILENAME, CheckpointManager, load_params, save_params
from .metrics import MetricsLogger, Stopwatch
from .profiling import device_memory_stats, timed, trace

__all__ = [
    "MODEL_FILENAME",
    "CheckpointManager",
    "load_params",
    "save_params",
    "MetricsLogger",
    "Stopwatch",
    "device_memory_stats",
    "timed",
    "trace",
]
