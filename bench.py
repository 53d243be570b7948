"""Headline benchmark: batched atlas-render glyphs/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The reference's inference path is structurally one sheet per device call in a
Python loop (helpers.py:46-74); the driver target (BASELINE.json) is >=10k
glyphs/sec batched atlas inference, which this script uses as the baseline
denominator. We render max-length (100-glyph) sheets in fixed 2048-sheet
device batches and count glyphs/sec with everything blocked to completion.
Batch 2048 is the measured serving sweet spot (tools/bench_batch_sweep.py,
extended_runs/batch_sweep.log): throughput rises to 2048 then falls —
29.9M vs 26.2M glyphs/sec full precision within the sweep — because the
eval forward is launch/bandwidth-bound below that and HBM-pressured above.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from ai_font_renderer_tpu.config import ModelConfig, TrainConfig
from ai_font_renderer_tpu.models import font_renderer

BASELINE_GLYPHS_PER_SEC = 10_000.0  # driver target (BASELINE.md)


def main() -> None:
    # Trained weights if present, random otherwise — throughput is
    # weight-independent. The checkpoint's own architecture (embedded config
    # or shape inference) drives the forward: a conv/conv_ps checkpoint at
    # the default weights path must bench its actual model, not KeyError on
    # a missing linear head.
    import os

    smoke = bool(os.environ.get("AFR_BENCH_SMOKE"))
    if os.path.exists("font_renderer.npz"):
        from ai_font_renderer_tpu.utils.checkpoint import load_params_with_config

        params, mcfg = load_params_with_config("font_renderer.npz")
    else:
        mcfg = ModelConfig()
        params = font_renderer.init(jax.random.PRNGKey(0), mcfg)

    batch = 128 if smoke else 2048  # sweet spot
    glyphs_per_sheet = mcfg.max_length  # 100-char sheets
    key = jax.random.PRNGKey(1)
    codes = jax.random.randint(key, (batch, mcfg.max_length), 65, 91, jnp.int32)

    # Timing uses a data-dependent chain: each forward's output perturbs the
    # next input, and the window ends with a scalar fetch. This defeats any
    # async/deferred execution in the runtime — the wall time provably
    # contains every forward pass.
    @jax.jit
    def fwd_chain(p, c):
        out = font_renderer.apply(p, c, mcfg, train=False)
        delta = (out[:, :1, : mcfg.max_length] * 7).astype(jnp.int32)
        nxt = (c + delta.reshape(c.shape)) % 26 + 65
        return out, nxt

    out, c = fwd_chain(params, codes)
    jax.block_until_ready((out, c))

    iters = 2 if smoke else 50
    best_dt = float("inf")
    for _ in range(3):  # best of 3 measured windows
        t0 = time.perf_counter()
        cc = codes
        for _ in range(iters):
            out, cc = fwd_chain(params, cc)
        float(out.mean())  # force the whole chain
        best_dt = min(best_dt, time.perf_counter() - t0)
    dt = best_dt

    sheets_per_sec = batch * iters / dt
    glyphs_per_sec = sheets_per_sec * glyphs_per_sheet

    # Extra: the int8xint8 serving path (ops/quantized.py — per-channel int8
    # weights x dynamic per-row int8 activations, int32 MXU accumulation).
    # Same chained-timing discipline; reported alongside, not as the
    # headline, which stays on the full-precision parity path.
    from ai_font_renderer_tpu.ops.quantized import (
        apply_quantized_int8,
        quantize_params,
    )

    # int8 quantizes the linear head; a conv checkpoint has none, so the
    # int8 row falls back to random flagship-linear weights (throughput is
    # weight-independent).
    if "out_w" in params:
        q8_mcfg, q8_params = mcfg, params
    else:
        q8_mcfg = ModelConfig()
        q8_params = font_renderer.init(jax.random.PRNGKey(0), q8_mcfg)
    served = quantize_params(q8_params)

    @jax.jit
    def fwd_chain_q8(p, c):
        out = apply_quantized_int8(p, c, q8_mcfg)
        delta = (out[:, :1, : q8_mcfg.max_length] * 7).astype(jnp.int32)
        nxt = (c + delta.reshape(c.shape)) % 26 + 65
        return out, nxt

    q8_codes = jax.random.randint(
        key, (batch, q8_mcfg.max_length), 65, 91, jnp.int32
    )
    out, c = fwd_chain_q8(served, q8_codes)
    jax.block_until_ready((out, c))
    q8_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        cc = q8_codes
        for _ in range(iters):
            out, cc = fwd_chain_q8(served, cc)
        float(out.mean())
        q8_dt = min(q8_dt, time.perf_counter() - t0)
    int8_glyphs_per_sec = batch * iters * q8_mcfg.max_length / q8_dt

    # int8 head + bf16 frontend: a measured NEGATIVE combo (RESULTS.md
    # "Serving tiers": 28.3M vs plain int8's 34.1M — eval has no dropout
    # traffic to save, so the casts around the f32 softmax/LN stats are
    # pure overhead). Kept in the artifact so the claim stays bracketed
    # by the driver's own numbers.
    import dataclasses

    q8f_mcfg = dataclasses.replace(q8_mcfg, bf16_frontend=True)

    @jax.jit
    def fwd_chain_q8f(p, c):
        out = apply_quantized_int8(p, c, q8f_mcfg)
        delta = (out[:, :1, : q8f_mcfg.max_length] * 7).astype(jnp.int32)
        nxt = (c + delta.reshape(c.shape)) % 26 + 65
        return out, nxt

    out, c = fwd_chain_q8f(served, q8_codes)
    jax.block_until_ready((out, c))
    q8f_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        cc = q8_codes
        for _ in range(iters):
            out, cc = fwd_chain_q8f(served, cc)
        float(out.mean())
        q8f_dt = min(q8f_dt, time.perf_counter() - t0)
    int8_bf16_glyphs_per_sec = batch * iters * q8f_mcfg.max_length / q8f_dt

    # Secondary: train-step throughput at the flagship batch size, measured
    # on the SAME path the real loop runs (train/loop.py): the whole-epoch
    # `lax.scan` with device-resident data and rbg dropout keys. Per-call
    # `train_step` adds ~1.5 ms of dispatch + host-side key folding that the
    # production path never pays.
    from ai_font_renderer_tpu.train import init_state, train_epoch

    # Train-step throughput is always measured on the flagship LINEAR
    # architecture (fresh random state) so the number stays comparable
    # across rounds regardless of which checkpoint sits at the weights path.
    train_mcfg = ModelConfig()
    tcfg = TrainConfig()
    tb = 32 if smoke else tcfg.batch_size
    n_fake = 4 * tb
    codes_all = jax.random.randint(
        key, (n_fake, train_mcfg.max_length), 65, 91, jnp.int32
    )
    targets_all = jax.random.randint(
        key,
        (n_fake, train_mcfg.sheet_height, train_mcfg.sheet_width),
        0,
        256,
        jnp.int32,
    ).astype(jnp.uint8)
    # Production epoch length: 150k samples, 80/20 split, batch 1024 ->
    # 117 train steps. Round 4's profiler trace proved a 20-step epoch
    # over-charges each step ~1.5 ms of per-epoch dispatch+fetch overhead
    # that amortizes at this length (RESULTS.md "The last 2.7 ms":
    # 14.39 ms/step at 20 steps vs 12.85 at 117, same jit, same weights;
    # device busy is 12.60). AFR_BENCH_SMOKE=1 shrinks everything for a
    # CPU plumbing check.
    steps = 4 if smoke else 117
    batch_idx = (
        jnp.arange(steps * tb, dtype=jnp.int32).reshape(steps, tb) % n_fake
    )
    lr = jnp.float32(1e-3)
    step_key = jax.random.key(1, impl=tcfg.prng_impl)

    def time_train(m, t=tcfg):
        # Warmup/compile; the scan chains state through all `steps`
        # batches, so the timed windows are data-dependent end to end.
        st = init_state(jax.random.PRNGKey(0), m, t)
        st, loss = train_epoch(
            st, codes_all, targets_all, batch_idx, lr, step_key, m, t
        )
        float(loss)
        dt = float("inf")
        for i in range(4):  # best-of-4: the remote tunnel adds ~4% noise
            t0 = time.perf_counter()
            st, loss = train_epoch(
                st,
                codes_all,
                targets_all,
                batch_idx,
                lr,
                jax.random.fold_in(step_key, i),
                m,
                t,
            )
            float(loss)  # scalar fetch forces the chained scan
            dt = min(dt, time.perf_counter() - t0)
        return dt

    # Parity profile (reference-default flags) is the headline train number;
    # the shipped fast profile (bf16 frontend + bits dropout + hand-rolled
    # projection backward — each measured quality-neutral, RESULTS.md) is
    # reported alongside.
    train_dt = time_train(train_mcfg)
    fast_dt = time_train(
        ModelConfig(bf16_frontend=True, bits_dropout=True),
        TrainConfig(handrolled_bwd=True),
    )

    # --- MFU (VERDICT r4 weak #4): utilization next to every throughput.
    # Model FLOPs per forward sheet: attention (qkvo projections +
    # logits/PV) + fc1 + the dominant output projection; train steps are
    # counted at the standard 3x forward (each GEMM's dX and dW backward).
    # Peak reference: v5e bf16 MXU 197 TFLOP/s, int8 394 TOP/s (the same
    # constants as the RESULTS.md roofline tables). Emitted only when the
    # device is recognizably a v5e so the ratio is honest.
    def fwd_flops_per_sheet(m):
        e, h, S = m.embedding_dim, m.hidden_dim, m.max_length
        attn = 4 * 2 * S * e * e + 2 * 2 * S * S * e
        fc1 = 2 * S * e * h
        if m.decoder == "linear":
            head = 2 * (S * h) * (m.sheet_height * m.sheet_width)
        else:  # conv decoders: count 3x3 convs over the stage plan
            head = 0
            gh, gw = m.decoder_grid
            hh, ww, cin = gh, gw, m.decoder_channels[0]
            head += 2 * S * h * cin
            n = len(m.decoder_channels) - 1
            for i, cout in enumerate(m.decoder_channels[1:]):
                if m.decoder == "conv":
                    hh = m.sheet_height if i == n - 1 else min(hh * 2, m.sheet_height)
                    ww = m.sheet_width if i == n - 1 else min(ww * 2, m.sheet_width)
                head += 2 * hh * ww * 9 * cin * cout
                cin = cout
            head += 2 * m.sheet_height * m.sheet_width * 9 * cin
        return attn + fc1 + head

    dev = str(jax.devices()[0])
    mfu: dict = {}
    if "v5" in dev:
        peak_bf16, peak_int8 = 197e12, 394e12
        f_fwd = fwd_flops_per_sheet(mcfg)
        mfu["mfu_atlas_pct"] = round(100 * sheets_per_sec * f_fwd / peak_bf16, 1)
        f_q8 = fwd_flops_per_sheet(q8_mcfg)
        mfu["mfu_int8_serving_pct"] = round(
            100 * (int8_glyphs_per_sec / q8_mcfg.max_length) * f_q8 / peak_int8, 1
        )
        f_train = 3 * fwd_flops_per_sheet(train_mcfg) * tb
        mfu["mfu_train_pct"] = round(100 * (steps / train_dt) * f_train / peak_bf16, 1)
        mfu["mfu_fast_train_pct"] = round(
            100 * (steps / fast_dt) * f_train / peak_bf16, 1
        )
        mfu["mfu_peaks"] = "bf16 197e12, int8 394e12 (v5e)"

    # --- Neural-render throughput (VERDICT r4 weak #1): the headline
    # all-neural capability, measured from the COMMITTED artifacts.
    # `exact` re-evaluates the SIREN per window pixel (the quality-
    # reference path); `phased` is the TPU-native fast path — per-glyph
    # coverage blocks pre-baked at PxP subpixel phases, placed by one-hot
    # positioning GEMMs on the MXU (compose_phased composite='matmul';
    # measured 80.7x exact at P=8, +8.8e-5 MSE — RESULTS.md round 5).
    neural: dict = {}
    art = os.path.join("artifacts", "firacode")
    if os.path.exists(os.path.join(art, "siren_finetuned.npz")):
        from ai_font_renderer_tpu.config import FIRACODE_PATH
        from ai_font_renderer_tpu.fontgen.ttf import TrueTypeFont
        from ai_font_renderer_tpu.render.implicit_sheet import (
            bake_bank_phased,
            build_layout,
            compose,
            compose_phased,
            place_glyphs,
        )
        from ai_font_renderer_tpu.utils.checkpoint import load_siren

        sp, scfg, ncharset = load_siren(os.path.join(art, "siren_finetuned.npz"))
        nfont = TrueTypeFont.load(FIRACODE_PATH)
        nlay = build_layout(nfont, cell=scfg.cell)
        nb = 32 if smoke else 256
        nstrs = [("HELLO WORLD " * 9)[: 10 + (i * 7) % 90] for i in range(nb)]
        nids, norg, nval = place_glyphs(nstrs, nfont, nlay, charset=ncharset)
        nids, norg, nval = map(jnp.asarray, (nids, norg, nval))
        n_glyphs = float(nval.sum())
        baked = bake_bank_phased(sp, scfg, nlay, phases=8)
        jax.block_until_ready(baked)

        def time_compose(fn):
            @jax.jit
            def chain(o, c):
                out = fn(o + c * 1e-6)
                return out, out[:, 0, 0].mean()

            out, c = chain(norg, jnp.float32(0.0))
            jax.block_until_ready(out)
            n_it = 2 if smoke else 20
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                cc = jnp.float32(0.0)
                for _ in range(n_it):
                    out, cc = chain(norg, cc)
                float(cc)
                best = min(best, time.perf_counter() - t0)
            return n_glyphs * n_it / best

        neural["neural_render_glyphs_per_sec"] = round(
            time_compose(lambda o: compose(sp, nids, o, nval, scfg, nlay)), 1
        )
        neural["neural_render_phased_glyphs_per_sec"] = round(
            time_compose(
                lambda o: compose_phased(
                    baked, nids, o, nval, scfg, nlay, 8, composite="matmul"
                )
            ),
            1,
        )

    print(
        json.dumps(
            {
                "metric": "atlas_render_glyphs_per_sec",
                "value": round(glyphs_per_sec, 1),
                "unit": "glyphs/sec",
                "vs_baseline": round(glyphs_per_sec / BASELINE_GLYPHS_PER_SEC, 2),
                "sheets_per_sec": round(sheets_per_sec, 1),
                "int8_serving_glyphs_per_sec": round(int8_glyphs_per_sec, 1),
                "int8_bf16_serving_glyphs_per_sec": round(
                    int8_bf16_glyphs_per_sec, 1
                ),
                "train_epoch_steps": steps,
                "train_steps_per_sec": round(steps / train_dt, 2),
                "train_samples_per_sec": round(steps * tb / train_dt, 1),
                "fast_train_steps_per_sec": round(steps / fast_dt, 2),
                **neural,
                **mfu,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
