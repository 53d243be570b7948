"""Promote a measured-best placement run to the committed artifacts/ set.

Copies the run's `placement_finetuned.npz` + `siren_finetuned.npz` into
`artifacts/<font>/`, re-exports the fully-neural StableHLO artifact from
the new pair, regenerates the paired truth/neural evidence renders
(pangram + TEST_STRINGS[0]), and prints the e2e MSE of the promoted pair
over the 15 adversarial TEST_STRINGS so the number can be checked against
the run's logged `end_to_end_neural_render_mse` before committing.

Usage: python tools/refresh_artifacts.py <font> <run_dir> [--dry-run DIR]
  font      firacode | montserrat
  run_dir   directory containing {placement,siren}_finetuned.npz
  --dry-run write into DIR instead of artifacts/<font> (no promotion)

CPU-safe (JAX_PLATFORMS=cpu); the HLO is exported for platforms cpu,tpu
either way. Remember to update artifacts/MANIFEST.md and the bound in
tests/test_artifacts.py when the measured best improves.
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import shutil
import sys

import numpy as np

PANGRAM = "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"


def main() -> int:
    argv = sys.argv[1:]
    dry = None
    if "--dry-run" in argv:
        i = argv.index("--dry-run")
        dry = argv[i + 1]
        del argv[i : i + 2]
    if len(argv) != 2:
        print(__doc__)
        return 1
    font_key, run_dir = argv

    from ai_font_renderer_tpu.cli import TEST_STRINGS, main as cli_main
    from ai_font_renderer_tpu.config import FIRACODE_PATH, MONTSERRAT_PATH
    from ai_font_renderer_tpu.fontgen.bmp import write_bmp
    from ai_font_renderer_tpu.fontgen.dataset import (
        bake_font_atlas,
        unit_ground_truth,
    )
    from ai_font_renderer_tpu.render.implicit_sheet import render_learned_sheets
    from ai_font_renderer_tpu.utils.checkpoint import (
        load_params_with_config,
        load_siren,
    )

    font_path = {"firacode": FIRACODE_PATH, "montserrat": MONTSERRAT_PATH}[font_key]
    dst = dry or os.path.join("artifacts", font_key)
    os.makedirs(os.path.join(dst, "renders"), exist_ok=True)

    for name in ("placement_finetuned.npz", "siren_finetuned.npz"):
        src = os.path.join(run_dir, name)
        shutil.copyfile(src, os.path.join(dst, name))
        print(f"promoted {src} -> {dst}/{name}")

    pnpz = os.path.join(dst, "placement_finetuned.npz")
    snpz = os.path.join(dst, "siren_finetuned.npz")

    # Fully-neural StableHLO export from the promoted pair.
    rc = cli_main(
        [
            "export",
            "--placement", pnpz,
            "--implicit", snpz,
            "--font", font_path,
            "--out", os.path.join(dst, "neural_render.hlo"),
        ]
    )
    if rc:
        print("export failed", file=sys.stderr)
        return rc

    # Evidence renders + the measured number.
    pp, pcfg = load_params_with_config(pnpz)
    sp, scfg, charset = load_siren(snpz)
    sheets = np.asarray(
        render_learned_sheets(
            sp, pp, TEST_STRINGS, font_path, scfg, pcfg, charset=charset
        )
    )
    atlas = bake_font_atlas(font_path, proportional=font_key == "montserrat")
    gt = unit_ground_truth(atlas, TEST_STRINGS)
    mse = float(np.mean((sheets - gt) ** 2))

    cases = {"pangram": TEST_STRINGS.index(PANGRAM), "string0": 0}
    for tag, i in cases.items():
        write_bmp(
            os.path.join(dst, "renders", f"neural_{tag}.bmp"),
            np.clip(sheets[i] * 255.0, 0, 255).astype(np.uint8),
        )
        write_bmp(
            os.path.join(dst, "renders", f"truth_{tag}.bmp"),
            np.clip(gt[i] * 255.0, 0, 255).astype(np.uint8),
        )
    print({"font": font_key, "e2e_mse_test_strings": round(mse, 6), "dst": dst})
    return 0


if __name__ == "__main__":
    sys.exit(main())
