"""Command-line interface.

Preserves the reference's public contract (model.py:425-454):

  * ``--train``       train a new model, save weights, render test strings;
  * no arguments      load saved weights if present, else train+save; then
                      render the test strings;
  * unknown option    print usage and exit 1;
  * outputs           BMPs + manifests under ``train_output_<timestamp>/``
                      (model.py:70-71), weights in a single file at the repo
                      root (``font_renderer.npz``, cf. helpers.py:18).

Extended subcommands (new capabilities, opt-in):

  * ``fontgen``       export the dataset to disk like generate_font.ts did
                      (train_input/{i}.bmp + data.txt + dataset_metadata.txt)
                      — the on-device pipeline doesn't need it, but the
                      file contract is preserved for interop;
  * ``render``        render arbitrary strings with saved weights.
"""

from __future__ import annotations

import argparse
import datetime
import os
import sys

import numpy as np

from .config import FIRACODE_PATH, ModelConfig, SheetSpec, TrainConfig, replace

# Curated adversarial eval strings (model.py:111-127), rendered every 5
# epochs and after training: repeated wide/narrow chars, multi-space runs,
# exact-length boundary, alphabet forward/reverse, all-spaces.
TEST_STRINGS = [
    "HELLO LEANN I LOVE YOU SO MUCH I HOPE YOU HAVE A GREAT DAY",
    "TWO WORLDS ONE FAMILY TRUST YOUR HEART LET FATE DECIDE TO GUIDE THESE LIVES WE SEE",
    "A PARADISE UNTOUCHED BY MAN WITHIN THIS WORLD BLESSED WITH LOVE A SIMPLE LIFE THEY LIVE IN PEACE",
    "SOFTLY TREAD THE SAND BELOW YOUR FEET NOW TWO WORLDS ONE FAMILY TRUST YOUR HEART LET FATE",
    "BENEATH THE SHELTER OF THE TREES ONLY LOVE CAN ENTER HERE A SIMPLE LIFE THEY LIVE IN PEACE",
    "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG",
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
    "WWWWWWWWWWWWWWWWWWWW",  # width test (repeating wide character)
    "IIIIIIIIIIIIIIIIIIII",  # width test (repeating narrow character)
    "ALTERNATING CASE TEST   SPACES",  # spacing test
    "CLAUDE IS RENDERING FONTS",
    "ZYXWVUTSRQPONMLKJIHGFEDCBA",  # reverse alphabet
    "AEIOU BCDFGHJKLMNPQRSTVWXYZ",  # vowels and consonants grouped
    "EXACTLY TWENTY CHARS",  # boundary test
    "                    ",
]


def default_output_dir() -> str:
    return "train_output_" + datetime.datetime.now().strftime("%m_%d_%H_%M_%S")


def _build_dataset(tcfg: TrainConfig, font: str, subset=None):
    """Build the device dataset, dispatching monospace vs proportional.

    ``subset``: synthesize only these corpus indices (monospace path; the
    proportional path synthesizes per-chunk and slices after).
    """
    from .fontgen.dataset import font_is_monospace

    print("Creating sheet dataset...")
    if font_is_monospace(font):
        from .fontgen import bake_atlas
        from .fontgen.dataset import build_device_dataset

        atlas = bake_atlas(font)
        ds = build_device_dataset(atlas, tcfg.num_samples, subset=subset)
    else:
        from .fontgen.proportional import bake_prop_atlas
        from .fontgen.dataset import build_device_dataset_prop

        atlas = bake_prop_atlas(font)
        ds = build_device_dataset_prop(atlas, tcfg.num_samples)
        if subset is not None:
            from .fontgen.dataset import DeviceDataset
            import jax.numpy as _jnp

            sub = _jnp.asarray(subset)
            ds = DeviceDataset(
                codes=ds.codes[sub], targets_u8=ds.targets_u8[sub]
            )
    return atlas, ds


def run_training(
    mcfg: ModelConfig,
    tcfg: TrainConfig,
    output_dir: str,
    font: str = FIRACODE_PATH,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    mesh_shape: tuple[int, int] | None = None,
):
    from .train import train

    mesh = None
    if mesh_shape is not None and mesh_shape != (1, 1):
        from .parallel import make_mesh

        mesh = make_mesh(data=mesh_shape[0], model=mesh_shape[1])
    _, ds = _build_dataset(tcfg, font)
    print(
        "Training attention-based sheet renderer with reduced embedding "
        "dimensions (32) and learned positional encoding..."
    )
    print(f"Using batch size {tcfg.batch_size}")
    result = train(
        ds,
        mcfg,
        tcfg,
        output_dir=output_dir,
        eval_strings=TEST_STRINGS,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        mesh=mesh,
    )
    return result


def cmd_fontgen(args) -> int:
    """Export the dataset: file-contract parity with generate_font.ts."""
    import shutil

    import jax.numpy as jnp

    from .fontgen import write_bmp
    from .fontgen.textgen import generate_corpus

    spec = SheetSpec()
    out = args.out
    if os.path.exists(out):
        print(f"Removing existing directory {out}...")
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    print(f"Generating text samples in {out}/...")
    texts = generate_corpus(args.num_samples)
    with open(os.path.join(out, "data.txt"), "w") as f:
        f.write("\n".join(texts))
    print(f"Saved all text data to {out}/data.txt")

    # Dispatch monospace (fixed-grid atlas) vs proportional (variant atlas).
    from .fontgen.dataset import font_is_monospace

    if font_is_monospace(args.font):
        from .fontgen import bake_atlas, make_synth_ops, synthesize_sheets
        from .fontgen.dataset import build_layouts

        atlas = bake_atlas(args.font, spec)
        _, grids = build_layouts(atlas, args.num_samples)
        ops = make_synth_ops(atlas, jnp.float32)
        synth = lambda g: synthesize_sheets(ops, jnp.asarray(g))
    else:
        from .fontgen.proportional import (
            bake_prop_atlas,
            encode_prop_grids,
            synthesize_prop_sheets,
        )

        atlas = bake_prop_atlas(args.font, spec)
        grids = encode_prop_grids(texts, atlas)
        synth = lambda g: synthesize_prop_sheets(atlas, g, dtype=jnp.float32)
    print("Rendering bitmaps...")
    chunk = 2048
    for start in range(0, args.num_samples, chunk):
        part = grids[start : start + chunk]
        pad = chunk - len(part)
        if pad:
            part = np.concatenate([part, np.zeros((pad,) + part.shape[1:], part.dtype)])
        sheets = np.asarray(synth(part))
        for i in range(min(chunk, args.num_samples - start)):
            write_bmp(os.path.join(out, f"{start + i + 1}.bmp"), sheets[i])
    metadata = (
        "AI Font Renderer Dataset - Fira Code\n"
        "==============================\n\n"
        f"Font: {os.path.basename(args.font)}\n"
        f"Font size: {int(spec.font_size)}\n"
        f"Sheet dimensions: {spec.width}x{spec.height}\n"
        f"Padding: {int(spec.padding)}px\n\n"
        "Format: Images are numbered sequentially (1.bmp, 2.bmp, etc.)\n"
        "Text labels are stored line by line in data.txt "
        "(line 1 corresponds to 1.bmp)\n"
    )
    with open(os.path.join(out, "dataset_metadata.txt"), "w") as f:
        f.write(metadata)
    print(f"Dataset generation complete. Check the {out}/ directory.")
    return 0


def cmd_eval(args) -> int:
    """Evaluate saved weights: val-split MSE + PSNR on the corpus."""
    import json

    import jax.numpy as jnp
    import numpy as np

    from .fontgen.dataset import split_permutation, split_sizes
    from .train.step import eval_epoch
    from .utils.checkpoint import load_params_with_config

    if not os.path.exists(args.weights):
        print(f"Error: weights file not found: {args.weights}")
        return 1
    params, mcfg = load_params_with_config(args.weights)
    tcfg = TrainConfig(num_samples=args.num_samples)
    # Synthesize ONLY the val split (the same 20% the training split_
    # permutation defines) — 5x less synthesis than rebuilding the corpus.
    n = tcfg.num_samples
    train_size, _ = split_sizes(n, tcfg.validation_split)
    perm = split_permutation(n, tcfg.seed)
    val_idx = perm[train_size:].astype(np.int32)
    atlas, ds = _build_dataset(tcfg, args.font, subset=val_idx)
    b = min(1024, ds.num_samples)
    steps = ds.num_samples // b
    idx = jnp.arange(steps * b, dtype=jnp.int32).reshape(steps, b)
    w = jnp.ones((steps, b), jnp.float32)
    mse = float(eval_epoch(params, ds.codes, ds.targets_u8, idx, w, mcfg))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))

    # Render fidelity on the curated adversarial strings: model output vs
    # the rasterizer-defined ground truth (per-pixel loss parity metric).
    from .fontgen.dataset import synthesize_ground_truth
    from .render import render_batch

    gt = synthesize_ground_truth(atlas, TEST_STRINGS)
    pred = render_batch(params, TEST_STRINGS, mcfg)
    t_mse = float(np.mean((pred - gt) ** 2))
    print(
        json.dumps(
            {
                "val_mse": round(mse, 8),
                "val_psnr_db": round(psnr, 2),
                "val_samples": steps * b,
                "test_strings_mse": round(t_mse, 8),
                "test_strings_psnr_db": round(
                    10.0 * np.log10(1.0 / max(t_mse, 1e-12)), 2
                ),
                "weights": args.weights,
            }
        )
    )
    return 0


def _warn_bank_font_mismatch(bank_path: str, font_path: str) -> None:
    """Warn loudly when a SIREN bank is composed with another font's
    metrics (--font defaults to FiraCode; a Montserrat bank under
    FiraCode advances/kerning lays out garbage and renders a near-blank
    sheet). Banks saved before the tag existed (incl. the committed
    artifacts) are untagged and skip the check."""
    from .utils.checkpoint import siren_font

    tag = siren_font(bank_path)
    if tag is not None and tag != os.path.basename(font_path):
        print(
            f"WARNING: SIREN bank {bank_path} was trained against {tag} "
            f"but --font is {os.path.basename(font_path)}; the composed "
            "layout uses the wrong font's metrics and will render "
            "garbage. Pass the matching --font."
        )


def cmd_render(args) -> int:
    from .render import render_strings
    from .utils.checkpoint import load_params_with_config

    if getattr(args, "truth", False):
        # Rasterizer ground truth with full shaping (GSUB ligatures + GPOS
        # kerning) — what node-canvas/HarfBuzz would draw for the string
        # (generate_font.ts:100-141), independent of any trained model.
        # --hinted adds the FreeType-style grid fit (fontgen/hinting.py).
        from .fontgen.bmp import write_bmp
        from .fontgen.shaped import ShapedRenderer

        strings = args.strings or TEST_STRINGS
        sheets = ShapedRenderer(
            args.font, hinted=getattr(args, "hinted", False)
        ).render_batch(strings)
        os.makedirs(args.out, exist_ok=True)
        for i, sheet in enumerate(sheets):
            write_bmp(os.path.join(args.out, f"string_{i}.bmp"), sheet)
        print(f"Saved {len(sheets)} shaped ground-truth strings to {args.out}/")
        return 0

    if getattr(args, "implicit", None):
        # Implicit hybrid: SIREN glyph bank composed into sheets at any
        # --scale; --placement swaps the layout engine for the learned
        # placement transformer (fully neural chars -> pixels).
        from .fontgen.bmp import write_bmp
        from .render.implicit_sheet import (
            render_implicit_sheets,
            render_learned_sheets,
        )
        from .utils.checkpoint import load_siren

        if not os.path.exists(args.implicit):
            print(f"Error: SIREN bank not found: {args.implicit}")
            return 1
        _warn_bank_font_mismatch(args.implicit, args.font)
        sp, scfg, charset = load_siren(args.implicit)
        strings = args.strings or TEST_STRINGS
        if getattr(args, "placement", None):
            if not os.path.exists(args.placement):
                print(f"Error: placement weights not found: {args.placement}")
                return 1
            pp, pcfg = load_params_with_config(args.placement)
            sheets = render_learned_sheets(
                sp, pp, strings, args.font, scfg, pcfg,
                scale=args.scale, charset=charset,
                hard=getattr(args, "hard_placement", False),
                monotone=getattr(args, "monotone_placement", False),
                baked=getattr(args, "baked", 0),
                phased=getattr(args, "phased", 0),
            )
        else:
            sheets = render_implicit_sheets(
                sp, strings, args.font, scfg, scale=args.scale,
                charset=charset, baked=getattr(args, "baked", 0),
                phased=getattr(args, "phased", 0),
            )
        os.makedirs(args.out, exist_ok=True)
        for i, sheet in enumerate(sheets):
            write_bmp(os.path.join(args.out, f"string_{i}.bmp"), sheet)
        print(f"Saved {len(sheets)} implicit renders to {args.out}/")
        return 0

    if getattr(args, "exported", None):
        # Self-contained StableHLO artifact (afr export): no weights file,
        # no ModelConfig — the contract travels in the artifact's avals.
        from .fontgen.bmp import write_bmp
        from .utils.export import load_exported, render_exported

        if not os.path.exists(args.exported):
            print(f"Error: exported artifact not found: {args.exported}")
            return 1
        strings = args.strings or TEST_STRINGS
        sheets = render_exported(load_exported(args.exported), strings)
        os.makedirs(args.out, exist_ok=True)
        for i, sheet in enumerate(sheets):
            write_bmp(os.path.join(args.out, f"string_{i}.bmp"), sheet)
        print(f"Saved {len(sheets)} exported-artifact renders to {args.out}/")
        return 0

    if not os.path.exists(args.weights):
        print(
            f"Error: weights file not found: {args.weights}\n"
            "Train one first: python model.py --train"
        )
        return 1
    params, mcfg = load_params_with_config(args.weights)
    if getattr(args, "fast", False):
        import dataclasses

        mcfg = dataclasses.replace(mcfg, bf16_frontend=True)
    if getattr(args, "int8", False):
        from .ops.quantized import quantize_params

        params = quantize_params(params)
    render_strings(params, args.strings or TEST_STRINGS, args.out, mcfg)
    return 0


def cmd_export(args) -> int:
    """Write a self-contained StableHLO render artifact (utils/export.py)."""
    from .utils.checkpoint import load_params_with_config
    from .utils.export import export_render

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    if getattr(args, "placement", None):
        # Fully neural pipeline: placement transformer + SIREN bank +
        # composition, one artifact, same contract as the flagship export.
        from .utils.checkpoint import load_siren
        from .utils.export import export_neural_render

        if getattr(args, "int8", False) or getattr(args, "fast", False):
            # These flags quantize/bf16 the FLAGSHIP projection; the
            # neural-pipeline export has no such tier yet — don't let a
            # user believe they got a quantized artifact.
            print(
                "Warning: --int8/--fast apply only to the flagship export; "
                "ignored for --placement artifacts"
            )
        if not getattr(args, "implicit", None):
            print("Error: --placement export requires --implicit SIREN_NPZ")
            return 1
        for p in (args.placement, args.implicit):
            if not os.path.exists(p):
                print(f"Error: weights file not found: {p}")
                return 1
        _warn_bank_font_mismatch(args.implicit, args.font)
        pp, pcfg = load_params_with_config(args.placement)
        sp, scfg, charset = load_siren(args.implicit)
        n = export_neural_render(
            pp, pcfg, sp, scfg, charset, args.font, args.out,
            platforms=platforms, scale=args.scale,
            hard=getattr(args, "hard_placement", False),
            monotone=getattr(args, "monotone_placement", False),
        )
        print(
            f"Exported neural render fn to {args.out} ({n / 1e6:.1f} MB, "
            f"platforms {','.join(platforms)}, batch dim symbolic)"
        )
        return 0

    if not os.path.exists(args.weights):
        print(f"Error: weights file not found: {args.weights}")
        return 1
    params, mcfg = load_params_with_config(args.weights)
    if getattr(args, "fast", False):
        import dataclasses

        mcfg = dataclasses.replace(mcfg, bf16_frontend=True)
    if getattr(args, "int8", False):
        from .ops.quantized import quantize_params

        params = quantize_params(params)
    n = export_render(params, mcfg, args.out, platforms=platforms)
    print(
        f"Exported render fn to {args.out} ({n / 1e6:.1f} MB, "
        f"platforms {','.join(platforms)}, batch dim symbolic)"
    )
    return 0


def parse_tcp(value: str) -> tuple[str, int] | None:
    """'HOST:PORT' -> (host, port), or None if malformed.

    Accepts hostnames, IPv4, and IPv6 — both the RFC 3986 bracketed form
    ('[::1]:8080', brackets stripped for the bind call) and the bare
    trailing-colon-port form ('::1:8080', split at the last colon)."""
    host, _, port = value.rpartition(":")
    # ASCII-digits only (str.isdigit admits Unicode digits) and the valid
    # port range, so a bad port fails the clean usage path here instead of
    # an OverflowError traceback at bind time.
    if not host or not port.isascii() or not port.isdigit():
        return None
    if not 0 <= int(port) <= 65535:
        return None
    if host.endswith(":") and host != "::":
        # A bare IPv6 address with NO port ('::1', '2001:db8::5') splits
        # into a host ending in ':' — reject it here instead of failing
        # with a raw getaddrinfo traceback at bind time. ('::' alone is
        # the valid all-zeros address, e.g. ':::8080'.)
        return None
    if host.startswith("[") and host.endswith("]"):
        host = host[1:-1]
    return host, int(port)


def cmd_serve(args) -> int:
    """Run the batched render server (render/server.py) until interrupted."""
    import time

    from .render.server import RenderServer

    render_fn = None
    if getattr(args, "exported", None):
        # Artifact-first deployment: serve a self-contained StableHLO
        # file (afr export) — no checkpoint, no model code; the wire
        # contract (max_length, sheet dims) travels in the avals.
        import dataclasses

        import jax.numpy as jnp

        from .fontgen.layout import encode_codes
        from .utils.export import exported_contract, load_exported

        if not os.path.exists(args.exported):
            print(f"Error: exported artifact not found: {args.exported}")
            return 1
        if getattr(args, "int8", False) or getattr(args, "fast", False):
            # The artifact's precision was baked at export time; the
            # serve-side knobs only affect the weights-file backend.
            print(
                "Warning: --int8/--fast have no effect with --exported — "
                "the artifact serves whatever precision was baked in "
                "(use `afr export --int8/--fast` instead)"
            )
        exported = load_exported(args.exported)
        max_length, height, width = exported_contract(exported)
        params = None
        mcfg = dataclasses.replace(
            ModelConfig(),
            max_length=max_length,
            sheet_height=height,
            sheet_width=width,
        )

        def render_fn(strings):
            return exported.call(
                jnp.asarray(encode_codes(strings, max_length))
            )

    else:
        from .utils.checkpoint import load_params_with_config

        if not os.path.exists(args.weights):
            print(f"Error: weights file not found: {args.weights}")
            return 1
        params, mcfg = load_params_with_config(args.weights)
        if getattr(args, "fast", False):
            import dataclasses

            mcfg = dataclasses.replace(mcfg, bf16_frontend=True)
    token = getattr(args, "auth_token", None) or os.environ.get(
        "AFR_AUTH_TOKEN"
    )
    tcp = None
    if getattr(args, "tcp", None):
        tcp = parse_tcp(args.tcp)
        if tcp is None:
            print(f"Error: --tcp expects HOST:PORT, got {args.tcp!r}")
            return 1
    server = RenderServer(
        params,
        mcfg,
        socket_path=args.socket,
        batch_size=args.batch_size,
        int8=getattr(args, "int8", False),
        auth_token=token,
        tcp=tcp,
        tls_cert=getattr(args, "tls_cert", None),
        tls_key=getattr(args, "tls_key", None),
        render_fn=render_fn,
    )
    server.start()
    where = (
        f"{server.address[0]}:{server.address[1]}"
        + (" (TLS)" if getattr(args, "tls_cert", None) else "")
        if tcp
        else args.socket
    )
    print(f"Render server listening on {where} (batch {args.batch_size})")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        server.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv

    # Opt-in hang diagnostics (same contract as tools/bench_serve.py):
    # AFR_DUMP_AFTER=<seconds> arms a wall-clock deadline that dumps every
    # thread's stack to stderr and exits. Needed because the remote-device
    # runtime can block a device RPC indefinitely on a stale grant
    # (measured round 5: a train-placement joint phase sat 27 min at 27 s
    # CPU, wedged before its first device fetch), and no debugger is
    # available in the image. Set it ABOVE the stage's expected wall time:
    # it is a deadline, not an idle watchdog — it fires even if the run is
    # making progress.
    dump_after = os.environ.get("AFR_DUMP_AFTER")
    if dump_after:
        import faulthandler

        faulthandler.dump_traceback_later(float(dump_after), exit=True)

    # The reference's bare contract first: no args, or --train (+ our
    # optional overrides). Subcommands are dispatched by their first token.
    if argv and argv[0] in (
        "fontgen", "render", "eval", "serve", "export", "train-placement",
    ):
        parser = argparse.ArgumentParser(prog="afr")
        sub = parser.add_subparsers(dest="cmd", required=True)
        from .train import placement_cli

        p_tp = sub.add_parser(
            "train-placement",
            help="train the learned-placement pipeline (supervised "
            "engine-target phase, SIREN bank, pixel fine-tune, joint "
            "SIREN+placement fine-tune) — the campaign protocol behind "
            "artifacts/, on the product surface",
        )
        placement_cli.add_args(p_tp)
        p_gen = sub.add_parser("fontgen", help="export dataset BMPs + data.txt")
        p_gen.add_argument("--num-samples", type=int, default=150000)
        p_gen.add_argument("--out", default="train_input")
        p_gen.add_argument("--font", default=FIRACODE_PATH)
        p_ren = sub.add_parser("render", help="render strings with saved weights")
        p_ren.add_argument("strings", nargs="*")
        p_ren.add_argument("--weights", default="font_renderer.npz")
        p_ren.add_argument("--out", default=default_output_dir())
        p_ren.add_argument(
            "--truth",
            action="store_true",
            help="rasterize shaped ground truth (GSUB+GPOS) instead of "
            "model inference",
        )
        p_ren.add_argument("--font", default=FIRACODE_PATH)
        p_ren.add_argument(
            "--int8",
            action="store_true",
            help="serve the linear head as an int8xint8 MXU GEMM "
            "(per-channel weight scales, dynamic per-row activation scales)",
        )
        p_ren.add_argument(
            "--fast",
            action="store_true",
            help="bf16 frontend for inference (~1 gray level delta). "
            "Measured NEGATIVE for throughput on v5e eval (29.1 -> 24.6M "
            "glyphs/sec, tools/ab_serving_tiers.py: without dropout to "
            "save, the cast overhead dominates) — use --int8 for the "
            "fast tier; kept for A/B reproducibility",
        )
        p_ren.add_argument(
            "--hinted",
            action="store_true",
            help="with --truth: FreeType-style vertical grid fit "
            "(fontgen/hinting.py) instead of the exact unhinted contract",
        )
        p_ren.add_argument(
            "--implicit",
            metavar="SIREN_NPZ",
            default=None,
            help="render through the implicit hybrid: a SIREN glyph bank "
            "(utils/checkpoint.save_siren) composed at engine-laid-out "
            "positions; supports --scale for arbitrary resolution",
        )
        p_ren.add_argument(
            "--placement",
            metavar="PLACEMENT_NPZ",
            default=None,
            help="with --implicit: take glyph positions from a learned "
            "placement transformer (models/placement.py) instead of the "
            "layout engine — the fully neural chars->pixels path",
        )
        p_ren.add_argument(
            "--hard-placement",
            action="store_true",
            help="with --placement: discrete placement decode (argmax "
            "line, thresholded contribution) instead of the soft "
            "expectation — the eval-time pen walk of the predicted "
            "break structure",
        )
        p_ren.add_argument(
            "--monotone-placement",
            action="store_true",
            help="with --placement: discrete decode with the line "
            "indices jointly Viterbi-decoded under the engine's "
            "monotone-break constraint (implies --hard-placement)",
        )
        p_ren.add_argument(
            "--scale",
            type=float,
            default=1.0,
            help="output resolution multiplier for --implicit renders",
        )
        p_ren.add_argument(
            "--baked",
            type=int,
            default=0,
            metavar="SS",
            help="with --implicit: amortized fast path — bake the SIREN "
            "bank once at SS-x supersampled cell resolution and composite "
            "by bilinear gather at each window pixel's exact subpixel "
            "phase instead of re-evaluating the glyph MLP per pixel "
            "(render/implicit_sheet.py:compose_baked; ~1e-5 MSE delta at "
            "SS=4, measured in RESULTS.md). A measured TPU NEGATIVE "
            "(per-element gathers serialize) but ~330x faster on CPU; on "
            "TPU use --phased. 0 = exact per-window eval",
        )
        p_ren.add_argument(
            "--phased",
            type=int,
            default=0,
            metavar="P",
            help="with --implicit: the TPU-native fast path — bake every "
            "glyph at PxP subpixel phases of the composite window and "
            "place whole coverage blocks with one-hot positioning GEMMs "
            "on the MXU (compose_phased, composite='matmul'; measured "
            "80.7x the exact path at P=8 with +8.8e-5 MSE, RESULTS.md "
            "round 5). Positions quantize to 1/P px. 0 = exact",
        )
        p_ren.add_argument(
            "--exported",
            default=None,
            metavar="ARTIFACT",
            help="render from a self-contained StableHLO artifact "
            "(afr export) instead of weights — no checkpoint or model "
            "config needed",
        )
        p_exp = sub.add_parser(
            "export",
            help="serialize the render function to a portable StableHLO "
            "artifact (jax.export: weights baked in, symbolic batch dim)",
        )
        p_exp.add_argument("--weights", default="font_renderer.npz")
        p_exp.add_argument("--out", default="font_renderer.hlo")
        p_exp.add_argument(
            "--platforms",
            default="cpu,tpu",
            help="comma-separated execution platforms the artifact "
            "may run on (default cpu,tpu)",
        )
        p_exp.add_argument(
            "--int8",
            action="store_true",
            help="bake the int8-quantized projection instead of f32 "
            "(~4x smaller artifact; serving-grade quality)",
        )
        p_exp.add_argument(
            "--fast",
            action="store_true",
            help="bake the bf16-frontend fast profile",
        )
        p_exp.add_argument(
            "--implicit",
            metavar="SIREN_NPZ",
            default=None,
            help="with --placement: the SIREN glyph bank to bake into a "
            "fully neural artifact",
        )
        p_exp.add_argument(
            "--placement",
            metavar="PLACEMENT_NPZ",
            default=None,
            help="export the fully neural pipeline instead of the "
            "flagship: placement transformer + --implicit SIREN bank + "
            "composition, one artifact, same codes->uint8 contract "
            "(tools/run_exported_standalone.py runs it unchanged)",
        )
        p_exp.add_argument(
            "--font",
            default=FIRACODE_PATH,
            help="font consulted at export time for the static cell "
            "geometry of --placement artifacts (never shipped inside)",
        )
        p_exp.add_argument(
            "--scale",
            type=float,
            default=1.0,
            help="output resolution multiplier baked into a --placement "
            "artifact (the implicit family renders at any scale)",
        )
        p_exp.add_argument(
            "--hard-placement",
            action="store_true",
            help="bake the discrete placement decode (argmax line)",
        )
        p_exp.add_argument(
            "--monotone-placement",
            action="store_true",
            help="bake the Viterbi monotone-break placement decode",
        )
        p_ev = sub.add_parser("eval", help="val MSE/PSNR of saved weights")
        p_ev.add_argument("--weights", default="font_renderer.npz")
        p_ev.add_argument("--num-samples", type=int, default=150000)
        p_ev.add_argument("--font", default=FIRACODE_PATH)
        p_srv = sub.add_parser(
            "serve", help="batched render server on a unix socket"
        )
        p_srv.add_argument("--weights", default="font_renderer.npz")
        p_srv.add_argument(
            "--exported",
            default=None,
            metavar="ARTIFACT",
            help="serve a self-contained StableHLO artifact (afr export) "
            "instead of weights — no checkpoint or model config needed; "
            "works for both the flagship and the fully neural "
            "--placement artifacts (same codes->uint8 contract)",
        )
        p_srv.add_argument("--socket", default="/tmp/afr.sock")
        p_srv.add_argument("--batch-size", type=int, default=64)
        p_srv.add_argument(
            "--int8",
            action="store_true",
            help="quantize the linear head to int8 for serving",
        )
        p_srv.add_argument(
            "--fast",
            action="store_true",
            help="bf16 frontend for serving. Measured NEGATIVE on v5e "
            "eval (tools/ab_serving_tiers.py) — --int8 alone is the fast "
            "tier; kept for A/B reproducibility",
        )
        p_srv.add_argument(
            "--auth-token",
            default=None,
            help="require this shared token on every request "
            "(constant-time compare; $AFR_AUTH_TOKEN also works and "
            "keeps the secret out of argv)",
        )
        p_srv.add_argument(
            "--tcp",
            default=None,
            metavar="HOST:PORT",
            help="listen on TCP instead of the unix socket (port 0 = "
            "ephemeral; hostnames, IPv4, and IPv6 literals — bracketed "
            "'[::1]:8080' or bare — are accepted; plaintext unless "
            "--tls-cert/--tls-key are given — use TLS + --auth-token "
            "beyond loopback)",
        )
        p_srv.add_argument(
            "--tls-cert",
            default=None,
            help="PEM certificate chain: serve TLS on the --tcp listener",
        )
        p_srv.add_argument(
            "--tls-key",
            default=None,
            help="PEM private key for --tls-cert",
        )
        args = parser.parse_args(argv)
        if args.cmd == "train-placement":
            return placement_cli.run(args, p_tp)
        return {
            "fontgen": cmd_fontgen,
            "render": cmd_render,
            "eval": cmd_eval,
            "serve": cmd_serve,
            "export": cmd_export,
        }[args.cmd](args)

    parser = argparse.ArgumentParser(prog="afr", add_help=True)
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--samples", type=int, default=None)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--output", default=None)
    parser.add_argument("--font", default=FIRACODE_PATH)
    parser.add_argument("--weights", default="font_renderer.npz")
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument(
        "--schedule", choices=["plateau", "cosine"], default=None,
        help="plateau = reference parity; cosine = fast time-budget profile",
    )
    parser.add_argument("--peak-lr", type=float, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument(
        "--decoder", choices=["linear", "conv", "conv_ps"], default=None,
        help="linear = reference parity (6400x19200 head); conv/conv_ps = "
        "position-equivariant upsampling decoder (~460x fewer params; "
        "conv_ps = pixel-shuffle variant, MXU-friendly channel widths)",
    )
    parser.add_argument(
        "--leaky-clamp", type=float, default=None,
        help="training-only leaky output clamp slope (0 = reference-exact)",
    )
    parser.add_argument(
        "--max-seconds", type=float, default=None,
        help="wall-clock training budget; clean stop + best-weights restore",
    )
    parser.add_argument(
        "--decoder-channels", default=None,
        help="conv decoder channel plan as comma-separated ints "
        "(first = latent width, rest = one stage each)",
    )
    parser.add_argument(
        "--mesh", default=None, metavar="DATA,MODEL",
        help="device mesh layout: DATA-way batch sharding x MODEL-way "
        "output-projection sharding over jax.devices() (default 1,1 = "
        "single device). DATA*MODEL must divide the device count.",
    )
    parser.add_argument(
        "--profile", choices=["parity", "fast"], default="parity",
        help="parity = reference-exact math (default); fast = measured "
        "quality-neutral speed flags (bf16 frontend, bits dropout, "
        "hand-rolled projection backward — ~15%% faster steps, RESULTS.md)",
    )
    try:
        args = parser.parse_args(argv)
    except SystemExit as e:
        if not e.code:
            return 0  # --help/-h: argparse printed help; that's a success
        # argparse already printed its message; mirror the reference's
        # "unknown option -> usage + exit 1" behavior (model.py:440-443).
        print("Available options: --train")
        return 1

    from .render import render_strings
    from .utils.checkpoint import load_params_with_config, save_params

    mcfg = ModelConfig()
    tcfg = TrainConfig()
    if args.profile == "fast":
        mcfg = replace(mcfg, bf16_frontend=True, bits_dropout=True)
        # The hand-rolled backward only exists for the linear decoder;
        # conv decoders keep the other fast flags.
        if (args.decoder or mcfg.decoder) == "linear" and not (
            args.leaky_clamp or 0.0
        ):
            tcfg = replace(tcfg, handrolled_bwd=True)
    if args.samples:
        tcfg = replace(tcfg, num_samples=args.samples)
    if args.epochs:
        tcfg = replace(tcfg, num_epochs=args.epochs)
    if args.batch_size:
        tcfg = replace(tcfg, batch_size=args.batch_size)
    if args.schedule:
        tcfg = replace(tcfg, schedule=args.schedule)
    if args.peak_lr:
        tcfg = replace(tcfg, peak_learning_rate=args.peak_lr)
    if args.lr:
        tcfg = replace(tcfg, learning_rate=args.lr)
    if args.decoder:
        mcfg = replace(mcfg, decoder=args.decoder)
    if args.leaky_clamp is not None:
        mcfg = replace(mcfg, leaky_clamp=args.leaky_clamp)
    if args.max_seconds is not None:
        tcfg = replace(tcfg, max_train_seconds=args.max_seconds)
    if args.decoder_channels:
        chans = tuple(int(c) for c in args.decoder_channels.split(","))
        mcfg = replace(mcfg, decoder_channels=chans)
    mesh_shape = None
    if args.mesh:
        parts = args.mesh.split(",")
        if len(parts) != 2:
            print(f"Error: --mesh expects DATA,MODEL (got {args.mesh!r})")
            return 1
        mesh_shape = (int(parts[0]), int(parts[1]))
    output_dir = args.output or default_output_dir()
    os.makedirs(output_dir, exist_ok=True)

    if args.train:
        result = run_training(
            mcfg,
            tcfg,
            output_dir,
            args.font,
            args.checkpoint_dir,
            args.resume,
            mesh_shape=mesh_shape,
        )
        save_params(result.params, args.weights, mcfg)
        render_strings(result.params, TEST_STRINGS, output_dir, mcfg)
    else:
        if os.path.exists(args.weights):
            params, mcfg = load_params_with_config(args.weights, mcfg)
        else:
            print("No saved model found. Training a new model...")
            result = run_training(
                mcfg,
                tcfg,
                output_dir,
                args.font,
                args.checkpoint_dir,
                args.resume,
                mesh_shape=mesh_shape,
            )
            params = result.params
            save_params(params, args.weights, mcfg)
        render_strings(params, TEST_STRINGS, output_dir, mcfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
