"""Configuration for the TPU font-renderer framework.

The reference keeps all configuration as module-level constants
(model.py:64-84) plus TS-side constants (generate_font.ts:64-72,159) and a
hardcoded ``CUDA_VISIBLE_DEVICES`` pin (model.py:95). Here everything is a
frozen dataclass with the same defaults, no device pinning, fully overridable
per run.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass

ASSETS_DIR = os.path.join(os.path.dirname(__file__), "..", "assets")
FIRACODE_PATH = os.path.abspath(os.path.join(ASSETS_DIR, "FiraCode-Retina.ttf"))
MONTSERRAT_PATH = os.path.abspath(os.path.join(ASSETS_DIR, "Montserrat-Regular.ttf"))

# Printable ASCII charset rendered into the glyph atlas. Index 0 is space,
# which must be ink-free (it doubles as the blank grid cell).
PRINTABLE_ASCII = "".join(chr(c) for c in range(32, 127))


@dataclass(frozen=True)
class SheetSpec:
    """Geometry of a rendered text sheet.

    Defaults mirror generate_font.ts:64-72: 240x80 sheet, 12px font, 1.2x
    line height, zero padding, and model.py:66's 100-char cap.
    """

    width: int = 240
    height: int = 80
    font_size: float = 12.0
    line_height_factor: float = 1.2
    padding: float = 0.0
    max_chars: int = 100

    @property
    def line_height(self) -> float:
        return self.font_size * self.line_height_factor

    @property
    def pixels(self) -> int:
        return self.width * self.height


@dataclass(frozen=True)
class ModelConfig:
    """AttentionFontRenderer hyperparameters (model.py:64-84,129-156)."""

    vocab_size: int = 128
    embedding_dim: int = 32
    num_heads: int = 4
    max_length: int = 100
    hidden_dim: int = 64
    # Attention depth: number of (MHA -> residual -> post-LN) blocks in the
    # frontend. 1 is the reference architecture (model.py:144-145 — a single
    # block). Extra blocks repeat the same shape with their own weights
    # (wq_b1..., ln_scale_b1...) BEFORE fc1 — the placement campaign's last
    # untried architectural axis (width/schedule/objective were measured to a
    # floor, VERDICT r4 #3): line-break decisions are multi-token reasoning
    # a single attention hop must otherwise do in one shot. Checkpoints
    # carry it in __config__; block-0 weights keep their flagship names so
    # depth-1 files are unchanged.
    num_blocks: int = 1
    dropout_rate: float = 0.2
    fc_dropout_rate: float = 0.25  # model.py:149 (DROPOUT_RATE + 0.05)
    sheet_height: int = 80
    sheet_width: int = 240
    # Learned positional encodings; the reference records (model.py:26-27)
    # that sinusoidal and RoPE fail on this task, so they stay learned.
    pos_init_std: float = 0.02
    # Run the dominant output GEMM in bf16 (f32 accumulation). The reference
    # found fp16 quality-neutral (model.py:31); bf16 is the MXU-native mode.
    bf16_matmul: bool = True
    # Use the Pallas fused GEMM+bias+clamp kernel (ops/fused_output.py) for
    # the output projection (implies bf16). Falls back to XLA off-TPU or on
    # non-128-aligned shapes.
    use_pallas_output: bool = False
    # Run the attention/MLP frontend in bf16 (activations; LayerNorm and
    # softmax statistics stay f32). Measured -0.7 ms/step at batch 1024 on
    # v5e; off by default for strict f32 parity with the reference frontend.
    bf16_frontend: bool = False
    # Draw dropout masks from raw uint8 PRNG bits (threshold keep*256)
    # instead of bernoulli-over-f32-uniform: 4x less mask traffic, keep
    # probability quantized to 1/256 (0.8 -> 0.796875). Measured -0.6 ms.
    bits_dropout: bool = False
    # Fuse the whole attention block (q/k/v proj + softmax + prob dropout +
    # PV + out proj) into one Pallas kernel per batch tile — logits/probs
    # never touch HBM, dropout bits come from the in-kernel TPU PRNG
    # (ops/fused_attention.py). Requires batch % fused_attention_tile == 0
    # (falls back to the XLA path otherwise). Pairs best with bf16_frontend.
    fused_attention: bool = False
    # Batch rows per kernel invocation, shared by the forward and backward
    # kernels (the dropout mask is regenerated per (tile, head), so the
    # grids must match). VMEM-bound: the [tile, S, S] f32 logits/probs live
    # on the kernel stack — measured scoped-vmem on v5e at S=100: fwd 91 MB
    # at tile 128, bwd 31.6 MB at tile 16, vs a 16 MB limit. Tile 8 fits
    # both directions.
    fused_attention_tile: int = 8
    # v2 fused attention (ops/fused_attention.py:fused_attention2): the
    # dropout mask is WRITTEN to HBM (uint8 [B,H,S,S], ~41 MB at flagship
    # shapes — a ~0.1 ms round trip) instead of regenerated in the
    # backward, which decouples the fwd/bwd grids (round 2's v1 pinned
    # them equal at 8). VMEM reality on v5e: under Mosaic's DEFAULT 16 MB
    # scoped limit the fwd stack caps the tile at 16 (12.9 MB; 25.7 at
    # 32) and the recompute-heavy bwd at <8 (16.25 MB at 8) — but the
    # core has 128 MB physical VMEM, and the kernels now raise
    # vmem_limit_bytes to 100 MB (ops/fused_attention.py:_VMEM_LIMIT),
    # lifting the caps to fwd<=64 (51.5 MB) and bwd<=32 (~66 MB),
    # AOT-measured scaling. Takes precedence over fused_attention when
    # set. Single-device only (like fused_attention and fused_dw_adamw):
    # train() raises on a mesh.
    fused_attention_v2: bool = False
    fa2_tile_fwd: int = 64
    fa2_tile_bwd: int = 32
    # Sheet decoder. "linear" is the reference architecture (model.py:152):
    # one 6400x19200 projection — a per-(slot, pixel) dictionary, 99.99% of
    # all parameters. "conv" replaces it with a position-equivariant
    # upsampling decoder: the frontend's per-slot features form a coarse
    # [grid_rows, grid_cols] latent image that a shared-weight conv pyramid
    # upsamples to the sheet. Same ink-painting weights at every position —
    # the structural fix for proportional layouts, where glyphs land at
    # arbitrary kerned x-offsets and the linear dictionary underfits
    # (RESULTS.md: Montserrat parity plateaus at val 0.0169, train == val).
    # "conv_ps" is the same architecture family with pixel-shuffle
    # upsampling: convs run at LOW resolution with cout*fy*fx channels then
    # depth-to-space — identical FLOPs, but channel widths stay >= 64 so
    # the MXU's 128-lane tiles stay full (the resize variant's 16-channel
    # full-res convs run at ~11% utilization).
    decoder: str = "linear"
    # Latent grid for the conv decoder; rows*cols must equal max_length.
    # (5, 20) tiles the 80x240 sheet into 16x12-px cells.
    decoder_grid: tuple[int, int] = (5, 20)
    # Channel plan: decoder_channels[0] is the latent projection width;
    # each later entry is one resize->conv3x3->relu stage's output width.
    # Spatial sizes double per stage (capped at the sheet size, which the
    # last stage always hits exactly).
    decoder_channels: tuple[int, ...] = (128, 128, 64, 32, 16)
    # Round the output projection's backward cotangent to bf16 so the dX
    # and dW GEMMs run bf16 x bf16 (MXU-native) instead of f32 x bf16 —
    # the bwd pass is the step's largest segment and half of it is the dX
    # GEMM (RESULTS.md perf decomposition). Forward is bit-identical to
    # bf16_matmul; opt-in fast-profile knob like bf16_frontend.
    bf16_cotangent: bool = False
    # Training-only leaky clamp slope. The reference clamps the output to
    # [0,1] (model.py:202); a saturated pixel then has zero gradient, and
    # wide variants can die entirely: the 16000-wide Montserrat config
    # drives every pixel past 1.0 ("all white") in the first epochs and
    # freezes at the all-white MSE with no gradient signal at lr 1e-3 AND
    # 5e-4 (RESULTS.md). With slope s > 0, training keeps s*x outside the
    # bounds (y = clip(x) + s*(x - clip(x))) so saturated pixels pull back;
    # eval/inference always hard-clamps. 0.0 = reference-exact.
    leaky_clamp: float = 0.0


@dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (model.py:64-84)."""

    num_epochs: int = 10000
    learning_rate: float = 1e-3
    batch_size: int = 1024
    early_stopping_patience: int = 70
    validation_split: float = 0.2
    weight_decay: float = 5e-4
    adam_b1: float = 0.9
    adam_b2: float = 0.99  # model.py:273 betas=(0.9, 0.99)
    scheduler_patience: int = 20
    scheduler_factor: float = 0.7
    min_learning_rate: float = 1e-6
    seed: int = 42
    num_samples: int = 150000
    # LR schedule: "plateau" is the reference's ReduceLROnPlateau
    # (model.py:276-278); "cosine" is the fast profile (linear warmup then
    # cosine decay to min_learning_rate over num_epochs) for
    # best-loss-in-a-time-budget runs. Early stopping applies to both.
    schedule: str = "plateau"
    warmup_epochs: int = 1
    peak_learning_rate: float | None = None  # cosine peak; None -> learning_rate
    # Dropout PRNG implementation. 'rbg' is ~10% faster per train step on
    # TPU (measured 15.5 vs 17.2 ms at batch 1024); 'threefry2x32' is jax's
    # default splittable generator. Dropout noise quality is equivalent.
    prng_impl: str = "rbg"
    # Keep AdamW's first moment in bf16 (optax mu_dtype): halves mu traffic
    # on 123M params; second moment stays f32 for accuracy.
    adam_mu_bf16: bool = True
    # Use the fused dW+AdamW Pallas path for the output projection
    # (train/step.py:train_step_fused + ops/fused_dw_adamw.py): out_w's
    # gradient never materializes in HBM. Mathematically identical to the
    # standard step; opt-in because the measured A/B currently favors XLA
    # (RESULTS.md).
    fused_dw_adamw: bool = False
    # Hand-rolled projection backward: the clamp-mask/MSE chain is written
    # out explicitly (no autodiff/custom-VJP boundary), the masked
    # cotangent is cast to bf16 ONCE, and both projection backward GEMMs
    # (dX, dW) run native bf16 x bf16 on the MXU. Round-3 roofline
    # (RESULTS.md): the autodiff dX GEMM runs at 2.3x its roofline on the
    # f32 cotangent. Requires decoder='linear', leaky_clamp=0. Numerics
    # delta vs the standard step: bf16 rounding of the projection
    # cotangent only.
    handrolled_bwd: bool = False
    # Rematerialization policy for the frontend inside the hand-rolled
    # step (VERDICT r4's non-kernel lever on the traffic-bound frontend
    # backward — fwd 3.31 ms vs ~0.4 ms HBM roofline, RESULTS.md):
    #   "none" — store all residuals (default; standard autodiff memory);
    #   "dots" — jax.checkpoint with dots_with_no_batch_dims_saveable:
    #            keep GEMM outputs, recompute the elementwise/softmax/
    #            dropout chains in the backward instead of round-tripping
    #            their residuals (attention probs are ~80-160 MB/step)
    #            through HBM;
    #   "full" — jax.checkpoint with nothing saved: recompute the whole
    #            frontend in the backward (trades maximum HBM traffic for
    #            a full extra frontend forward).
    # Gradients are bit-identical in expectation (PRNG keys replay
    # deterministically under checkpoint). Requires handrolled_bwd.
    remat_frontend: str = "none"
    # Wall-clock training budget in seconds (None = unlimited). Checked
    # after each epoch: the run stops cleanly with best-weights restore and
    # manifest semantics identical to early stopping. Useful when a
    # plateau-scheduled run keeps finding marginal bests (each one resets
    # the patience counter, so patience alone may never trigger).
    max_train_seconds: float | None = None
    # How often to log + render eval strings (model.py:349 renders every 5).
    eval_every: int = 5
    # Checkpoint every N epochs (0 = only final). The reference only saves
    # final weights (helpers.py:76-79); periodic checkpointing is new.
    checkpoint_every: int = 25

    def __post_init__(self):
        # Validate here, not only inside _handrolled_step: under the default
        # standard step the flag is never consumed, so a bad value (or a
        # remat A/B run without handrolled_bwd) would otherwise no-op
        # silently and "measure" nothing.
        if self.remat_frontend not in ("none", "dots", "full"):
            raise ValueError(
                f"remat_frontend must be none|dots|full, got "
                f"{self.remat_frontend!r}"
            )
        if self.remat_frontend != "none" and not self.handrolled_bwd:
            raise ValueError(
                "remat_frontend only applies to the hand-rolled step; "
                "set handrolled_bwd=True"
            )


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit sharding.

    ``data`` shards the batch (DP, gradient psum over ICI); ``model`` shards
    the dominant 6400x19200 output projection (TP). Defaults collapse to
    single-device when only one chip is present.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = 1
    model_parallel: int = 1


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)
