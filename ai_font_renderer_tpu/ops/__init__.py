"""Pallas TPU kernels for the hot ops."""

from .fused_output import fused_output

__all__ = ["fused_output"]
