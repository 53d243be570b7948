"""Generate golden per-string MSE tables for the committed artifacts.

VERDICT r4 weak #3: the artifact quality lock (tests/test_artifacts.py)
bounded MSE at ~1.4x the measured best — loose enough for a 30% decode
regression to ship. The committed artifacts render deterministically on
CPU, so this writes `artifacts/<font>/golden_mse.json`: the per-string
e2e MSE (soft decode, vs bitmap ground truth) of the EXACT committed
checkpoint pair, computed on CPU. `test_artifacts.py` then asserts each
string's MSE to ~1e-4 — a decode/composition one-liner drift trips it.

Rerun (CPU) only when the artifacts themselves are intentionally
re-promoted: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/gen_artifact_golden.py
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os

import jax
import numpy as np


def main() -> None:
    assert jax.default_backend() == "cpu", (
        "golden tables are defined on CPU numerics; run with JAX_PLATFORMS=cpu"
    )
    from ai_font_renderer_tpu.cli import TEST_STRINGS
    from ai_font_renderer_tpu.config import FIRACODE_PATH, MONTSERRAT_PATH
    from ai_font_renderer_tpu.fontgen.dataset import (
        bake_font_atlas,
        unit_ground_truth,
    )
    from ai_font_renderer_tpu.render.implicit_sheet import render_learned_sheets
    from ai_font_renderer_tpu.utils.checkpoint import (
        load_params_with_config,
        load_siren,
    )

    for font_key, font_path in (
        ("firacode", FIRACODE_PATH),
        ("montserrat", MONTSERRAT_PATH),
    ):
        pdir = os.path.join("artifacts", font_key)
        pp, pcfg = load_params_with_config(
            os.path.join(pdir, "placement_finetuned.npz")
        )
        sp, scfg, charset = load_siren(os.path.join(pdir, "siren_finetuned.npz"))
        sheets = np.asarray(
            render_learned_sheets(
                sp, pp, TEST_STRINGS, font_path, scfg, pcfg, charset=charset
            )
        )
        gt = unit_ground_truth(
            bake_font_atlas(font_path, proportional=font_key == "montserrat"),
            TEST_STRINGS,
        )
        per_string = [
            round(float(np.mean((sheets[i] - gt[i]) ** 2)), 8)
            for i in range(len(TEST_STRINGS))
        ]
        rec = {
            "per_string_mse": per_string,
            "mean_mse": round(float(np.mean((sheets - gt) ** 2)), 8),
            "n_strings": len(TEST_STRINGS),
            "backend": "cpu",
        }
        path = os.path.join(pdir, "golden_mse.json")
        with open(path, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"{path}: mean {rec['mean_mse']}", flush=True)


if __name__ == "__main__":
    main()
