"""Pallas TPU kernels + serving ops for the hot paths."""

from .fused_dw_adamw import fused_dw_adamw
from .fused_output import fused_output
from .quantized import apply_quantized, quantize_params, quantize_weights

__all__ = [
    "fused_dw_adamw",
    "fused_output",
    "apply_quantized",
    "quantize_params",
    "quantize_weights",
]
