"""TPU-native font-as-a-neural-net framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
chenglou/ai-font-renderer (see SURVEY.md): glyph datasets baked straight from
TTFs with sheets synthesized on-device, an attention->dense pixel-sheet model
trained in a single fused jitted step, batched atlas inference, and
mesh-sharded (DP/TP) execution.
"""

__version__ = "0.1.0"
