"""Neural-render perf round (VERDICT r4 weak #1): exact vs baked compose.

The fully-neural render path (placement net + SIREN bank,
render/implicit_sheet.py) had ONE throughput number since round 2 —
44.6k glyphs/sec, sin()-bound on the VPU — never re-measured against the
round-4 artifacts and invisible to bench.py. This measures, in ONE
process (TPU discipline, CLAUDE.md):

  * exact compose (per-window SIREN eval) — the quality-reference path;
  * exact compose with the bf16 trunk (SirenConfig.compute) — re-check
    of the round-2 negative at current shapes;
  * compose_baked at supersample 2/4/8 — bake the bank once, bilinear
    4-tap gather per window pixel (render/implicit_sheet.py:compose_baked);
  * the full learned pipeline (placement.apply + exact compose).

Every variant reports throughput (chained timing: origins perturbed by
the previous output, scalar fetch closes the window) AND quality (e2e
MSE vs bitmap ground truth on the 15 TEST_STRINGS, same metric as the
artifact lock) so a fast-but-wrong variant cannot win silently. The
bake cost itself is reported (amortized per call in serving, it is one
device call per weight change, not per render).

Usage: python tools/bench_neural_render.py [--font firacode] [--iters 20]
Prints one JSON line per variant + a summary line.
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ai_font_renderer_tpu.cli import TEST_STRINGS
from ai_font_renderer_tpu.config import (
    FIRACODE_PATH,
    MONTSERRAT_PATH,
    PRINTABLE_ASCII,
)
from ai_font_renderer_tpu.fontgen.dataset import bake_font_atlas, unit_ground_truth
from ai_font_renderer_tpu.fontgen.layout import encode_codes
from ai_font_renderer_tpu.fontgen.ttf import TrueTypeFont
from ai_font_renderer_tpu.models import placement
from ai_font_renderer_tpu.render.implicit_sheet import (
    bake_bank,
    bake_bank_phased,
    build_layout,
    compose,
    compose_baked,
    compose_phased,
    font_kerning,
    origins_from_midpoints,
    place_glyphs,
)
from ai_font_renderer_tpu.utils.checkpoint import (
    load_params_with_config,
    load_siren,
)


def emit(rec):
    print(json.dumps(rec), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--font", default="firacode", choices=["firacode", "montserrat"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    font_path = FIRACODE_PATH if args.font == "firacode" else MONTSERRAT_PATH
    art = os.path.join("artifacts", args.font)
    sp, scfg, charset = load_siren(os.path.join(art, "siren_finetuned.npz"))
    pparams, pcfg = load_params_with_config(
        os.path.join(art, "placement_finetuned.npz")
    )

    font = TrueTypeFont.load(font_path)
    lay = build_layout(font, cell=scfg.cell, max_glyphs=pcfg.max_length)
    kern = font_kerning(font_path, charset) if args.font == "montserrat" else None

    # Throughput workload: a 256-string batch of realistic lengths, engine
    # placements (throughput is placement-independent; the engine fills
    # every sheet with real glyph counts).
    batch = [("HELLO WORLD " * 9)[: 10 + (i * 7) % 90] for i in range(args.batch)]
    ids, origins, valid = place_glyphs(batch, font, lay, charset=charset, kerning=kern)
    ids = jnp.asarray(ids)
    origins = jnp.asarray(origins)
    valid = jnp.asarray(valid)
    n_glyphs = int(valid.sum())

    # Quality workload: the 15 TEST_STRINGS vs bitmap ground truth — the
    # artifact-lock metric (tests/test_artifacts.py).
    gt = unit_ground_truth(
        bake_font_atlas(font_path, proportional=args.font == "montserrat"),
        TEST_STRINGS,
    )
    t_ids, t_org, t_val = place_glyphs(
        TEST_STRINGS, font, lay, charset=charset, kerning=kern
    )
    t_ids, t_org, t_val = map(jnp.asarray, (t_ids, t_org, t_val))

    results = {}

    def run_variant(name, compose_fn, quality_fn):
        @jax.jit
        def chain(orig, c):
            out = compose_fn(orig + c * 1e-6)
            return out, out[:, 0, 0].mean()

        out, c = chain(origins, jnp.float32(0.0))
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            cc = jnp.float32(0.0)
            for _ in range(args.iters):
                out, cc = chain(origins, cc)
            float(cc)
            best = min(best, time.perf_counter() - t0)
        gps = n_glyphs * args.iters / best
        mse = float(np.mean((np.asarray(quality_fn()) - gt) ** 2))
        results[name] = (gps, mse)
        emit(
            {
                "variant": name,
                "glyphs_per_sec": round(gps, 1),
                "ms_per_batch": round(best / args.iters * 1e3, 3),
                "test_strings_mse": round(mse, 8),
                "font": args.font,
            }
        )

    # 1. Exact per-window SIREN eval (the committed-artifact path).
    run_variant(
        "exact_f32",
        lambda o: compose(sp, ids, o, valid, scfg, lay),
        lambda: compose(sp, t_ids, t_org, t_val, scfg, lay),
    )

    # 2. bf16 trunk (round-2 negative, re-measured at current shapes).
    scfg_bf16 = dataclasses.replace(scfg, compute="bfloat16")
    run_variant(
        "exact_bf16",
        lambda o: compose(sp, ids, o, valid, scfg_bf16, lay),
        lambda: compose(sp, t_ids, t_org, t_val, scfg_bf16, lay),
    )

    # 3. Baked bank + bilinear sampling at supersample 2/4/8.
    for ss in (2, 4, 8):
        t0 = time.perf_counter()
        baked = bake_bank(sp, scfg, supersample=ss)
        jax.block_until_ready(baked)
        bake_s = time.perf_counter() - t0
        emit(
            {
                "bake": f"ss{ss}",
                "bake_seconds": round(bake_s, 3),
                "baked_mb": round(baked.size * 4 / 1e6, 1),
            }
        )
        run_variant(
            f"baked_ss{ss}",
            lambda o, b=baked, s=ss: compose_baked(b, ids, o, valid, scfg, lay, s),
            lambda b=baked, s=ss: compose_baked(
                b, t_ids, t_org, t_val, scfg, lay, s
            ),
        )

    # 3b. Phase-binned bake (the TPU-native fast path): whole-block
    # fetch per glyph instead of per-pixel gathers; `onehot` converts
    # the block fetch itself into an MXU GEMM.
    for P in (8, 16):
        t0 = time.perf_counter()
        pbaked = bake_bank_phased(sp, scfg, lay, phases=P)
        jax.block_until_ready(pbaked)
        emit(
            {
                "bake": f"phased_p{P}",
                "bake_seconds": round(time.perf_counter() - t0, 3),
                "baked_mb": round(pbaked.size * 4 / 1e6, 1),
            }
        )
        run_variant(
            f"phased_p{P}",
            lambda o, b=pbaked, p=P: compose_phased(
                b, ids, o, valid, scfg, lay, p
            ),
            lambda b=pbaked, p=P: compose_phased(
                b, t_ids, t_org, t_val, scfg, lay, p
            ),
        )
        run_variant(
            f"phased_p{P}_onehot",
            lambda o, b=pbaked, p=P: compose_phased(
                b, ids, o, valid, scfg, lay, p, onehot=True
            ),
            lambda b=pbaked, p=P: compose_phased(
                b, t_ids, t_org, t_val, scfg, lay, p, onehot=True
            ),
        )
        run_variant(
            f"phased_p{P}_matmul",
            lambda o, b=pbaked, p=P: compose_phased(
                b, ids, o, valid, scfg, lay, p, composite="matmul"
            ),
            lambda b=pbaked, p=P: compose_phased(
                b, t_ids, t_org, t_val, scfg, lay, p, composite="matmul"
            ),
        )

    # 4. Full learned pipeline (placement net + exact compose): the
    # headline capability end to end, codes -> sheets.
    codes = jnp.asarray(encode_codes(batch, pcfg.max_length))
    cidx = {c: i for i, c in enumerate(charset)}
    k_ids = np.zeros((len(batch), pcfg.max_length), np.int32)
    known = np.zeros((len(batch), pcfg.max_length), bool)
    for si, s in enumerate(batch):
        for ci, ch in enumerate(s[: pcfg.max_length]):
            k = cidx.get(ch)
            if k is not None and ch != " ":
                k_ids[si, ci] = k
                known[si, ci] = True
    k_ids = jnp.asarray(k_ids)
    known = jnp.asarray(known)

    @jax.jit
    def learned_chain(c, carry):
        mids, logits = placement.apply(pparams, c, pcfg, train=False)
        org = origins_from_midpoints(mids, lay)
        val = known & (jax.nn.sigmoid(logits) > 0.5)
        out = compose(sp, k_ids, org + carry * 1e-6, val, scfg, lay)
        return out, out[:, 0, 0].mean()

    out, c = learned_chain(codes, jnp.float32(0.0))
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        cc = jnp.float32(0.0)
        for _ in range(args.iters):
            out, cc = learned_chain(codes, cc)
        float(cc)
        best = min(best, time.perf_counter() - t0)
    emit(
        {
            "variant": "learned_pipeline_exact",
            "glyphs_per_sec": round(n_glyphs * args.iters / best, 1),
            "ms_per_batch": round(best / args.iters * 1e3, 3),
            "font": args.font,
        }
    )

    ex_gps, ex_mse = results["exact_f32"]
    summary = {
        "summary": "neural_render",
        "exact_glyphs_per_sec": round(ex_gps, 1),
        "exact_mse": round(ex_mse, 8),
        "best_variant": max(results, key=lambda k: results[k][0]),
        "font": args.font,
    }
    for name, (gps, mse) in results.items():
        summary[f"{name}_speedup"] = round(gps / ex_gps, 2)
        summary[f"{name}_mse_delta"] = round(mse - ex_mse, 8)
    emit(summary)


if __name__ == "__main__":
    main()
