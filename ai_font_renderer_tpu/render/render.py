"""Batched inference: strings -> sheets -> BMPs; full-atlas rendering.

The reference renders one string per device call in a Python loop
(helpers.py:46-74 — tensor.unsqueeze(0).to(device) per string, .cpu() per
string). Here the whole batch is ONE device call: encode all strings to an
[N, 100] int array, forward once, write BMPs from a single host transfer.
``render_atlas`` renders glyph sheets for an arbitrarily large text batch in
fixed-size device chunks — the glyphs/sec headline path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..fontgen.bmp import write_bmp
from ..fontgen.layout import encode_codes
from ..models import font_renderer


def _forward(params: dict, codes: jax.Array, mcfg: ModelConfig) -> jax.Array:
    """Inference forward, dispatching on the checkpoint's weight format.

    Serving bundles produced by ops.quantized.quantize_params carry
    ``out_w_q``/``out_w_scale`` instead of ``out_w``; those run the full
    int8xint8 MXU projection (2x bf16 peak). Everything else takes the
    standard apply path. The dict's key set is part of the jit pytree
    structure, so each format compiles its own program — no runtime cost.
    """
    if "out_w_q" in params:
        from ..ops.quantized import apply_quantized_int8

        return apply_quantized_int8(params, codes, mcfg)
    return font_renderer.apply(params, codes, mcfg, train=False)


def render_batch(
    params: dict, strings: list[str], mcfg: ModelConfig = ModelConfig()
) -> np.ndarray:
    """Render strings in one jitted forward pass -> float32 [N, H, W]."""
    codes = jnp.asarray(encode_codes(strings, mcfg.max_length))
    sheets = _forward(params, codes, mcfg)
    return np.asarray(sheets)


def _apply_u8(params, codes, mcfg: ModelConfig):
    sheets = _forward(params, codes, mcfg)
    return jnp.round(sheets * 255.0).astype(jnp.uint8)


_apply_u8 = jax.jit(_apply_u8, static_argnames=("mcfg",))


def render_batch_u8_async(
    params: dict, strings: list[str], mcfg: ModelConfig = ModelConfig()
) -> jax.Array:
    """Dispatch a uint8 render and return the DEVICE array without blocking.

    The 0..255 quantization runs on device, so the host transfer is uint8 —
    4x fewer bytes than fetching f32 sheets and converting on host. JAX
    dispatch is asynchronous: callers can queue several batches and fetch
    (np.asarray) in order while the device works ahead — the render
    server's double-buffering primitive.
    """
    codes = jnp.asarray(encode_codes(strings, mcfg.max_length))
    return _apply_u8(params, codes, mcfg)


def render_strings(
    params: dict,
    strings: list[str],
    output_dir: str,
    mcfg: ModelConfig = ModelConfig(),
) -> list[str]:
    """Batched equivalent of the reference's render_strings (helpers.py:46-74).

    Same outputs (``{output_dir}/string_{idx}.bmp``), same truncation
    behavior, same completion message — but a single device call for the
    whole list instead of one per string.
    """
    os.makedirs(output_dir, exist_ok=True)
    for s in strings:
        if len(s) > mcfg.max_length:
            print(
                f"Warning: String truncated to {mcfg.max_length} characters: "
                f"{s[: mcfg.max_length]}"
            )
    sheets = render_batch(params, strings, mcfg)
    paths = []
    for idx, sheet in enumerate(sheets):
        path = os.path.join(output_dir, f"string_{idx}.bmp")
        write_bmp(path, sheet)
        paths.append(path)
    print(f"Saved {len(strings)} rendered strings to {output_dir}/")
    return paths


def _chunked_apply(params, codes, mcfg, chunk: int):
    """Forward in fixed-shape chunks (one compilation), padding the tail."""
    n = codes.shape[0]
    outs = []
    fn = jax.jit(lambda p, c: _forward(p, c, mcfg))
    for start in range(0, n, chunk):
        part = codes[start : start + chunk]
        if part.shape[0] < chunk:
            part = jnp.pad(part, ((0, chunk - part.shape[0]), (0, 0)))
        outs.append(fn(params, part))
    return jnp.concatenate(outs, axis=0)[:n]


def render_atlas(
    params: dict,
    strings: list[str],
    mcfg: ModelConfig = ModelConfig(),
    chunk: int = 1024,
) -> jax.Array:
    """Render a large batch of sheets on device (no host transfer).

    Returns the device array [N, H, W]; callers time/consume it as needed.
    This is the batched "font atlas" inference mode: the whole charset (or
    corpus) rendered in fixed-size device chunks.
    """
    codes = jnp.asarray(encode_codes(strings, mcfg.max_length))
    return _chunked_apply(params, codes, mcfg, chunk)
