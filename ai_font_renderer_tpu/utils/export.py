"""Portable deployment artifacts via jax.export (StableHLO).

The reference's only deployment format is a torch state_dict that needs
the Python model class to execute (helpers.py:76-105; requirements.txt
declares `onnx` but never imports it — SURVEY §0). Here the deployment
story is TPU-native: serialize the whole jitted render function — weights
baked in as constants, batch dimension symbolic — to StableHLO bytes with
``jax.export``. Any JAX runtime on any listed platform can then execute
the artifact with zero model code, no checkpoint file, and no knowledge
of ModelConfig: the input/output contract (max_length, sheet size, uint8)
travels inside the artifact's avals.

Surfaces: ``afr export --weights W --out F`` writes the artifact;
``afr render --exported F`` renders from it (note the artifact alone is
enough — no --weights). ``--int8`` composes: the exported constants are
the int8-quantized projection, ~4x smaller bytes on disk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from ..config import ModelConfig

# Executing an artifact on a platform it was not exported for is a hard
# error inside jax.export, so default to the two platforms this framework
# targets (export from the CPU host, serve on TPU).
DEFAULT_PLATFORMS = ("cpu", "tpu")


def export_render(
    params: dict,
    mcfg: ModelConfig,
    path: str,
    platforms: tuple[str, ...] = DEFAULT_PLATFORMS,
) -> int:
    """Serialize the render function (codes -> uint8 sheets) to ``path``.

    The function is ``codes int32[b, max_length] -> uint8[b, H, W]`` with
    a symbolic batch dimension ``b`` — one artifact serves any batch
    size. Weights are captured as constants, so the file is
    self-contained (size ~= parameter bytes). Returns the byte count.
    """
    from ..render.render import _forward

    def fn(codes):
        sheets = _forward(params, codes, mcfg)
        return jnp.round(sheets * 255.0).astype(jnp.uint8)

    (b,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, mcfg.max_length), jnp.int32)
    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(spec)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def export_neural_render(
    placement_params: dict,
    pcfg: ModelConfig,
    siren_params: dict,
    scfg,
    charset: str,
    font_path: str,
    path: str,
    platforms: tuple[str, ...] = DEFAULT_PLATFORMS,
    scale: float = 1.0,
    hard: bool = False,
    monotone: bool = False,
) -> int:
    """Serialize the FULLY NEURAL render pipeline to one artifact.

    Placement transformer (chars -> positions, models/placement.py) +
    SIREN glyph bank (coords -> coverage, models/siren.py) + the
    differentiable composition (render/implicit_sheet.compose), fused
    into a single ``codes int32[b, max_length] -> uint8[b, H, W]``
    function with a symbolic batch dim — the SAME contract as
    :func:`export_render`, so ``afr render --exported`` and
    tools/run_exported_standalone.py execute either model family
    unchanged. The font file is consulted only here, for the static cell
    geometry; the artifact contains no layout engine, no font, and no
    framework code. ``scale`` bakes an output resolution (the implicit
    family renders at any scale); ``hard``/``monotone`` bake the
    discrete placement decodes.
    """
    from ..config import SheetSpec
    from ..fontgen.ttf import TrueTypeFont
    from ..models import placement
    from ..render.implicit_sheet import (
        build_layout,
        compose,
        origins_from_midpoints,
    )

    spec = SheetSpec()
    font = TrueTypeFont.load(font_path)
    lay = build_layout(
        font, spec, scfg.cell, scale=scale, max_glyphs=pcfg.max_length
    )
    # charset index per ASCII code (-1 = places no glyph), as a baked
    # constant — the artifact needs no charset knowledge at run time.
    lut = np.full(128, -1, np.int32)
    for i, c in enumerate(charset):
        if ord(c) < 128:
            lut[ord(c)] = i
    lut_j = jnp.asarray(lut)
    space = ord(" ")

    def fn(codes):
        mids, logits = placement.apply(
            placement_params, codes, pcfg, train=False,
            hard=hard, monotone=monotone,
        )
        origins = origins_from_midpoints(mids, lay)
        ci = lut_j[jnp.clip(codes, 0, 127)]
        valid = (ci >= 0) & (codes != space) & (jax.nn.sigmoid(logits) > 0.5)
        sheets = compose(
            siren_params, jnp.maximum(ci, 0), origins, valid, scfg, lay
        )
        return jnp.round(sheets * 255.0).astype(jnp.uint8)

    (b,) = jax_export.symbolic_shape("b")
    spec_in = jax.ShapeDtypeStruct((b, pcfg.max_length), jnp.int32)
    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(spec_in)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_exported(path: str):
    """Deserialize an artifact written by :func:`export_render`."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def exported_contract(exported) -> tuple[int, int, int]:
    """(max_length, sheet_height, sheet_width) carried by the avals."""
    (in_aval,) = exported.in_avals
    (out_aval,) = exported.out_avals
    return int(in_aval.shape[1]), int(out_aval.shape[1]), int(out_aval.shape[2])


def render_exported(exported, strings: list[str]) -> np.ndarray:
    """Render strings through an exported artifact -> float32 [N, H, W].

    Same output convention as render.render_batch (0..1 floats); the
    uint8 quantization grid is the artifact's, identical to the render
    server's wire format.
    """
    from ..fontgen.layout import encode_codes

    max_length, _, _ = exported_contract(exported)
    codes = jnp.asarray(encode_codes(strings, max_length))
    return np.asarray(exported.call(codes)).astype(np.float32) / 255.0
