"""Product-surface training for the learned-placement pipeline.

``afr train-placement`` — the CLI home of the campaign that produced the
committed artifacts (artifacts/MANIFEST.md): supervised placement
training against the layout engine's own targets, SIREN-bank reuse or
retraining, the end-to-end pixel fine-tune, and the joint
SIREN+placement fine-tune with warm-restart/resume support. Every flag
here is a campaign-proven protocol knob (RESULTS.md "Learned glyph
placement" queues 12-23); `tools/train_placement.py` is now a thin shim
over this module, so the full supervised → fine-tune → joint chain runs
from `afr` alone (VERDICT r3 #3).

The reference's training surface is `python model.py --train`
(reference model.py:425-443); its layout is a hardcoded engine
(generate_font.ts:75-97) with no learned counterpart, so this subcommand
has no reference twin — the parity bar it clears is this framework's
own: the newest capability trains from the CLI like the flagship does.

Capacity flags (``--embed-dim/--hidden-dim/--heads``) vary the placement
transformer's frontend dimensions — the axis VERDICT r3 #2 flagged as
never explored (every campaign run used the flagship dims 32/64/4). The
dims are embedded in saved checkpoints (``__config__``), so
continuations (``--init-from``) recover them automatically and refuse
conflicting flags.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from ..config import (
    FIRACODE_PATH,
    MONTSERRAT_PATH,
    PRINTABLE_ASCII,
    ModelConfig,
    SheetSpec,
    replace,
)
from ..fontgen.layout import AdvanceTable, encode_codes


def build_table(
    font_path: str, spec: SheetSpec, charset: str, kerned: bool
) -> AdvanceTable:
    """Advance/kerning metrics the supervision targets are built from."""
    from ..fontgen.ttf import TrueTypeFont

    font = TrueTypeFont.load(font_path)
    adv = np.array(
        [
            font.advance(font.glyph_id(ord(c))) * spec.font_size / font.units_per_em
            for c in charset
        ]
    )
    kern = None
    if kerned:
        from ..fontgen.kerning import KerningTable

        kern = KerningTable(font_path, charset, spec.font_size)
    return AdvanceTable(charset, adv, kern)


def add_args(ap: argparse.ArgumentParser) -> None:
    """Register the train-placement flags on ``ap`` (shared by the afr
    subcommand and the tools/ shim)."""
    ap.add_argument("--font", default="montserrat", choices=["montserrat", "firacode"])
    ap.add_argument("--samples", type=int, default=50000)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument(
        "--embed-dim",
        type=int,
        default=None,
        metavar="E",
        help="placement-frontend embedding width (default: the flagship "
        "32). The capacity axis of the placement net — the campaign's "
        "supervised/joint protocol at 2x dims is the VERDICT-r3 lever "
        "for FiraCode's placement residual. Head dim stays 8 unless "
        "--heads overrides",
    )
    ap.add_argument(
        "--hidden-dim",
        type=int,
        default=None,
        metavar="H",
        help="placement-frontend MLP/feature width (default: the "
        "flagship 64)",
    )
    ap.add_argument(
        "--heads",
        type=int,
        default=None,
        metavar="N",
        help="attention heads (default: embed-dim/8 when --embed-dim is "
        "given, else the flagship 4)",
    )
    ap.add_argument(
        "--blocks",
        type=int,
        default=None,
        metavar="B",
        help="attention DEPTH: number of (MHA -> residual -> post-LN) "
        "blocks in the placement frontend (default: the flagship 1). "
        "The last untried architectural axis (VERDICT r4 #3): width, "
        "restart schedule, and objective family measured to a ~0.0063 "
        "floor on FiraCode, and the residual failure mode (line-break "
        "decisions) is multi-token reasoning extra depth buys",
    )
    ap.add_argument(
        "--line-head",
        type=int,
        default=0,
        metavar="L",
        help="use the line-classification head with L line classes "
        "(models/placement.py init(lines=L)): y decoded from a line "
        "distribution instead of regressed — targets the wrap-outlier "
        "failure mode (worst-case ~1 sheet width) the long runs exposed",
    )
    ap.add_argument(
        "--structured",
        action="store_true",
        help="use the structured head (requires --line-head L): x derived "
        "from the predicted break structure via per-line prefix sums over "
        "the checkpoint-carried advance/kern tables (models/placement.py "
        "structured_x) plus a learned residual — targets the x component "
        "of the wrap-outlier failure mode the line-head runs left open",
    )
    ap.add_argument(
        "--detach-structure",
        action="store_true",
        help="stop-gradient the structure probabilities inside "
        "structured_x during training: x MSE trains only the residual "
        "and advance/kern tables; line/contribution logits train purely "
        "from CE/BCE (counters the measured hedging failure — coupled x "
        "gradients soften the line distributions, RESULTS.md)",
    )
    ap.add_argument(
        "--schedule",
        default="const",
        choices=["const", "cosine"],
        help="const = round-3 baseline protocol; cosine = 5%% linear "
        "warmup then cosine decay to 0 over the full epoch budget "
        "(for the longer runs — constant 1e-3 never anneals the tail)",
    )
    ap.add_argument(
        "--boundary-boost",
        type=int,
        default=1,
        metavar="F",
        help="oversample (replicate F-1 extra times in the train split) "
        "strings containing a near-boundary wrap decision — a line whose "
        "rightmost glyph extent comes within --boundary-margin px of the "
        "usable width. These are where the residual ~2%% break errors "
        "live (RESULTS.md: val-worst pinned at ~1 sheet width); the val "
        "split is untouched so metrics stay comparable",
    )
    ap.add_argument(
        "--boundary-margin",
        type=float,
        default=12.0,
        help="margin in px for --boundary-boost's near-boundary test",
    )
    ap.add_argument(
        "--boundary-mode",
        default="extent",
        choices=["extent", "break"],
        help="hardness test for --boundary-boost. 'extent' (queue-12 "
        "baseline): some line's rightmost glyph extent comes within the "
        "margin of the usable width — crisp on monospace, diffuse under "
        "kerning (measured split, RESULTS.md). 'break': some wrap "
        "DECISION was within the margin of flipping — min over the "
        "engine's accept/reject choices of |measure(candidate) − "
        "usable_width|, the kerning-aware signal (a rejected word that "
        "barely overflowed, or an accepted one that barely fit)",
    )
    ap.add_argument(
        "--break-ce-boost",
        type=float,
        default=0.0,
        metavar="B",
        help="loss-side alternative to --boundary-boost (measured out "
        "for proportional fonts, RESULTS.md): weight each slot's line "
        "CE by 1+B when the slot's own wrap decision was within "
        "--boundary-margin px of flipping (placement_targets margins). "
        "Emphasizes exactly the contested decisions without diluting "
        "the average case the way resampling does. Requires a line "
        "head",
    )
    ap.add_argument(
        "--uncertainty-weights",
        action="store_true",
        help="learn the loss-term balance (Kendall-style homoscedastic "
        "uncertainty weighting: one log-variance per term, combined as "
        "sum(exp(-s)*L + s), initialized to reproduce the fixed weights "
        "exactly). Targets the measured queue-12..15 diagnosis that "
        "gradient competition among x-MSE / line CE / visibility BCE "
        "on the shared trunk binds the pixel metric",
    )
    ap.add_argument(
        "--init-from",
        default=None,
        metavar="NPZ",
        help="initialize params from a saved placement checkpoint instead "
        "of random init (head mode and frontend dims must match the "
        "flags; dims are recovered from the checkpoint's embedded "
        "config). With --epochs 0 this turns the run into a pure "
        "pixel-objective fine-tuner over an existing supervised run",
    )
    ap.add_argument(
        "--finetune-schedule",
        default="const",
        choices=["const", "cosine"],
        help="fine-tune LR schedule: const = 1e-4 throughout (round-3 "
        "baseline); cosine = decay 1e-4 -> 0 over --finetune-steps "
        "(the measured queue-18 trajectories oscillate batch-to-batch "
        "at constant LR — anneal the tail to convert that into "
        "convergence)",
    )
    ap.add_argument(
        "--finetune-lr",
        type=float,
        default=1e-4,
        metavar="LR",
        help="fine-tune LR (const) or cosine peak. The 1e-4 default is "
        "the round-3 baseline; warm-restart continuations from an "
        "already-annealed checkpoint should restart at a lower peak "
        "(a full-height restart re-injects the noise the first anneal "
        "just removed)",
    )
    ap.add_argument(
        "--finetune-joint",
        action="store_true",
        help="pixel fine-tune the SIREN bank JOINTLY with the placement "
        "net (the campaign's largest single win, RESULTS.md queue 21): "
        "the sheet MSE differentiates through compose() into both the "
        "window origins (placement) and the glyph fields themselves "
        "(SIREN), so glyph shapes can absorb residuals placement cannot "
        "— e.g. sub-pixel phase the bank baked in at its own anchoring. "
        "Saves siren_finetuned.npz next to placement_finetuned.npz; the "
        "e2e eval row uses the tuned bank, the oracle row keeps the "
        "original bank (engine layout never saw the tuned one)",
    )
    ap.add_argument(
        "--finetune-samples",
        type=int,
        default=256,
        help="corpus train strings the pixel fine-tune optimizes over "
        "(ground truth synthesized on device). The round-3 default 256 "
        "revisits each sheet every 4 steps at batch 64 — raise it "
        "together with --finetune-steps to scale the pixel objective",
    )
    ap.add_argument(
        "--siren-from",
        default=None,
        metavar="NPZ",
        help="load the e2e SIREN bank from a save_siren checkpoint "
        "instead of retraining it (--e2e-steps is then ignored). Makes "
        "fine-tune continuations exact: a --finetune-joint run must "
        "resume the TUNED bank, not a fresh same-seed retrain",
    )
    ap.add_argument(
        "--ft-checkpoint-every",
        type=int,
        default=2000,
        metavar="N",
        help="checkpoint the fine-tune (tunable + Adam state + step) to "
        "<out>/ft_ckpt every N steps (0 = off). The multi-hour pixel "
        "fine-tunes are the longest unprotected stretch in the repo — a "
        "restart once cost the whole 21000-step chain (RESULTS.md "
        "queue 20)",
    )
    ap.add_argument(
        "--ft-resume",
        action="store_true",
        help="resume the fine-tune from <out>/ft_ckpt's latest step. The "
        "batch schedule is a deterministic function of the step index, so "
        "a resumed run replays the exact uninterrupted trajectory",
    )
    ap.add_argument(
        "--mesh",
        type=int,
        default=None,
        metavar="DATA",
        help="data-parallel ways: shard every training batch over a "
        "DATA-device mesh axis (placement params replicate — the net is "
        "small; the 123M-param sheet decoder never materializes here). "
        "Applies to the supervised loop, the eval pass, and the pixel/"
        "joint fine-tune steps. GSPMD inserts the gradient all-reduce; "
        "the same code path runs single-device when omitted (VERDICT r4 "
        "#4: every trainer on the product surface shards like the "
        "flagship's --mesh DATA,MODEL)",
    )
    ap.add_argument("--out", default=None)
    ap.add_argument("--e2e-steps", type=int, default=3000)
    ap.add_argument("--no-e2e", action="store_true")
    ap.add_argument(
        "--finetune-steps",
        type=int,
        default=200,
        help="end-to-end pixel fine-tune: gradients flow from sheet MSE "
        "through the differentiable SIREN composition into the placement "
        "net, absorbing anchoring residuals supervision can't see "
        "(0 = skip; requires the e2e SIREN bank)",
    )


def _placement_config(args, ap: argparse.ArgumentParser) -> ModelConfig:
    """Resolve the placement frontend dims from flags / --init-from."""
    from ..utils.checkpoint import load_params_with_config

    pcfg = ModelConfig()
    if args.init_from:
        # Dims travel in the checkpoint; flags may confirm, not conflict.
        _, loaded_cfg = load_params_with_config(args.init_from)
        if loaded_cfg is not None:
            pcfg = loaded_cfg
        for flag, field in (
            ("embed_dim", "embedding_dim"),
            ("hidden_dim", "hidden_dim"),
            ("heads", "num_heads"),
            ("blocks", "num_blocks"),
        ):
            v = getattr(args, flag)
            if v is not None and v != getattr(pcfg, field):
                ap.error(
                    f"--{flag.replace('_', '-')} {v} conflicts with the "
                    f"--init-from checkpoint's {field}="
                    f"{getattr(pcfg, field)}"
                )
        return pcfg
    kw = {}
    if args.embed_dim is not None:
        kw["embedding_dim"] = args.embed_dim
        # Keep 8-dim heads unless told otherwise — the flagship's ratio.
        kw["num_heads"] = args.heads or max(1, args.embed_dim // 8)
    if args.heads is not None:
        kw["num_heads"] = args.heads
    if args.hidden_dim is not None:
        kw["hidden_dim"] = args.hidden_dim
    if args.blocks is not None:
        kw["num_blocks"] = args.blocks
    return replace(pcfg, **kw) if kw else pcfg


def _dp_shardings(mesh):
    """(replicated, batch-sharded) NamedShardings for a (data, model) mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    return NamedSharding(mesh, P()), NamedSharding(mesh, P(DATA_AXIS))


def make_supervised_step(pcfg, opt, detach_structure=False, mesh=None):
    """The jitted supervised placement step, optionally DP-sharded.

    With ``mesh`` (a parallel.mesh make_mesh result): params/optimizer
    state replicate, every [B, ...] batch operand shards over the data
    axis, and GSPMD inserts the gradient all-reduce — the same
    annotate-don't-communicate pattern as the flagship trainer
    (train/loop.py). ``mesh=None`` is the identical single-device jit the
    campaign always ran. Shared by the CLI, the virtual-mesh tests, and
    the driver's dryrun sub-check so all three exercise one code path.
    """
    import jax
    import optax

    from ..models import placement

    def _step(params, opt_state, c, m, v, lt, ct, cw, key):
        # lt/ct/cw are None (empty pytrees under jit) when the head or
        # flag doesn't use them; loss_fn dispatches on the params' own
        # head mode.
        loss, grads = jax.value_and_grad(placement.loss_fn)(
            params, c, m, v, pcfg, key=key, train=True, line_tgt=lt,
            contrib_tgt=ct, detach_structure=detach_structure, ce_w=cw,
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    if mesh is None:
        return jax.jit(_step)
    rep, dp = _dp_shardings(mesh)
    return jax.jit(
        _step,
        in_shardings=(rep, rep, dp, dp, dp, dp, dp, dp, rep),
        out_shardings=(rep, rep, None),
    )


def make_finetune_step(pixel_loss, ft_opt, mesh=None):
    """The jitted pixel/joint fine-tune step, optionally DP-sharded.

    ``tunable`` (placement params, or (placement, siren) under
    --finetune-joint) replicates; the per-step sheet batch (codes, glyph
    ids, validity, ground truth) shards over the data axis.
    """
    import jax
    import optax

    def _ft_step(t, st, c, ids, valid, gt):
        loss, grads = jax.value_and_grad(pixel_loss)(t, c, ids, valid, gt)
        updates, st = ft_opt.update(grads, st)
        return optax.apply_updates(t, updates), st, loss

    if mesh is None:
        return jax.jit(_ft_step)
    rep, dp = _dp_shardings(mesh)
    return jax.jit(
        _ft_step,
        in_shardings=(rep, rep, dp, dp, dp, dp),
        out_shardings=(rep, rep, None),
    )


def run(args, ap: argparse.ArgumentParser) -> int:
    """Execute the full train-placement pipeline for parsed ``args``."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..cli import TEST_STRINGS
    from ..models import placement

    font_path = MONTSERRAT_PATH if args.font == "montserrat" else FIRACODE_PATH
    out_dir = args.out or f"extended_runs/placement_{args.font}"
    os.makedirs(out_dir, exist_ok=True)
    metrics = open(os.path.join(out_dir, "metrics.jsonl"), "a", buffering=1)

    spec = SheetSpec()
    pcfg = _placement_config(args, ap)
    charset = PRINTABLE_ASCII  # index 0 is space, the engine convention
    kerned = args.font == "montserrat"  # proportional pipeline kerns
    table = build_table(font_path, spec, charset, kerned)

    if args.structured and args.line_head < 2:
        ap.error("--structured requires --line-head L (L >= 2)")
    if args.break_ce_boost > 0 and args.line_head < 2:
        ap.error("--break-ce-boost weights a line CE; needs --line-head")

    mesh = None
    if args.mesh and args.mesh > 1:
        from ..parallel.mesh import make_mesh

        if args.batch % args.mesh:
            ap.error(
                f"--batch {args.batch} not divisible by --mesh {args.mesh}"
            )
        if args.finetune_steps > 0 and 64 % args.mesh:
            ap.error(
                f"--mesh {args.mesh} must divide the fine-tune batch (64)"
            )
        mesh = make_mesh(data=args.mesh, model=1)
        print(
            f"mesh: {args.mesh}-way data parallel over "
            f"{mesh.devices.size} devices",
            flush=True,
        )

    from ..fontgen.textgen import generate_corpus

    t0 = time.time()
    strings = generate_corpus(args.samples)
    codes_np = encode_codes(strings, spec.max_chars)
    want_margins = args.break_ce_boost > 0
    margin_np = None
    if args.structured:
        tgts = placement.placement_targets(
            strings, table, spec, full=True, margins=want_margins
        )
        mids_np, vis_np, line_np, contrib_np = tgts[:4]
        if want_margins:
            margin_np = tgts[4]
    else:
        tgts = placement.placement_targets(
            strings, table, spec, margins=want_margins
        )
        mids_np, vis_np = tgts[:2]
        if want_margins:
            margin_np = tgts[2]
    print(f"targets built in {time.time() - t0:.1f} s", flush=True)

    n_val = args.samples // 5
    rng = np.random.default_rng(42)
    perm = rng.permutation(args.samples)
    tr, va = perm[n_val:], perm[:n_val]
    if args.boundary_boost > 1:
        # Replicate HARD train indices so the CE sees the ambiguous
        # boundary cases boost-times as often. Two hardness tests
        # (--boundary-mode): 'extent' — some line's rightmost glyph
        # extent (midpoint + half-advance = the pen's right edge) comes
        # within the margin of the usable width; 'break' — some wrap
        # decision was within the margin of flipping (the kerning-aware
        # per-decision signal, replaying the engine's greedy accept/
        # reject walk with table.measure).
        if args.boundary_mode == "break":
            max_w = spec.width - 2 * spec.padding
            S = spec.max_chars

            def min_decision_margin(text: str) -> float:
                m = np.inf
                cur = ""
                for w in text[:S].split(" "):
                    test = f"{cur} {w}" if cur else w
                    meas = table.measure(test)
                    if meas > max_w and cur:
                        m = min(m, meas - max_w)  # rejected: overflow
                        cur = w
                    else:
                        if cur and meas <= max_w:
                            m = min(m, max_w - meas)  # accepted: slack
                        cur = test
                return m

            margins = np.array([min_decision_margin(s) for s in strings])
            hard = margins < args.boundary_margin
        else:
            adv_px = np.full(128, table.advances_px[0], np.float32)
            for i, c in enumerate(charset):
                adv_px[ord(c)] = table.advances_px[i]
            half_adv = 0.5 * adv_px[np.clip(codes_np, 0, 127)]
            extent = np.where(vis_np, mids_np[..., 0] + half_adv, 0.0).max(
                axis=1
            )
            hard = extent > (spec.width - spec.padding - args.boundary_margin)
        boosted = tr[hard[tr]]
        tr = np.concatenate([tr] + [boosted] * (args.boundary_boost - 1))
        print(
            f"boundary boost: {len(boosted)}/{args.samples - n_val} hard "
            f"train strings x{args.boundary_boost} "
            f"(epoch now {len(tr)} samples)",
            flush=True,
        )
    codes = jnp.asarray(codes_np)
    mids = jnp.asarray(mids_np)
    vis = jnp.asarray(vis_np)
    ce_w = None
    if args.break_ce_boost > 0:
        hard_slot = margin_np < args.boundary_margin
        ce_w = jnp.asarray(
            1.0 + args.break_ce_boost * hard_slot.astype(np.float32)
        )
        print(
            f"break-CE boost: {hard_slot.mean():.3f} of slots weighted "
            f"x{1 + args.break_ce_boost:g} (margin < {args.boundary_margin})",
            flush=True,
        )
    if args.structured:
        line_t = jnp.asarray(line_np)
        contrib_t = jnp.asarray(contrib_np)
        adv128 = np.full(128, table.advances_px[0], np.float32)
        for i, c in enumerate(charset):
            adv128[ord(c)] = table.advances_px[i]
        kern128 = np.zeros((128, 128), np.float32)
        if kerned:
            for a in charset:
                for b in charset:
                    k = table.kern(a, b)
                    if k:
                        kern128[ord(a), ord(b)] = k
        params = placement.init(
            jax.random.PRNGKey(0),
            pcfg,
            lines=args.line_head,
            advances=adv128,
            kerning=kern128,
            uncertainty=args.uncertainty_weights,
        )
    else:
        params = placement.init(
            jax.random.PRNGKey(0),
            pcfg,
            lines=args.line_head,
            uncertainty=args.uncertainty_weights,
        )
    if args.init_from:
        from ..utils.checkpoint import load_params

        loaded = load_params(args.init_from)
        if placement.head_lines(loaded) != placement.head_lines(params) or (
            placement.head_structured(loaded)
            != placement.head_structured(params)
        ):
            ap.error(
                f"--init-from checkpoint head (lines="
                f"{placement.head_lines(loaded)}, structured="
                f"{placement.head_structured(loaded)}) does not match the "
                "requested flags"
            )
        params = loaded
    total_steps = max(args.epochs * (len(tr) // args.batch), 1)
    if args.schedule == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, max(total_steps // 20, 1), total_steps
        )
    else:
        lr = args.lr
    opt = optax.adamw(lr, weight_decay=1e-4)
    opt_state = opt.init(params)

    step = make_supervised_step(pcfg, opt, args.detach_structure, mesh)

    def _evaluate(params, c, m, v):
        xy, logit = placement.apply(params, c, pcfg, train=False)
        vf = v.astype(jnp.float32)
        n = jnp.maximum(vf.sum(), 1.0)
        se = jnp.sum((xy - m) ** 2, -1)
        rmse = jnp.sqrt(jnp.sum(se * vf) / n)
        worst = jnp.max(jnp.where(v, jnp.sqrt(se), 0.0))
        acc = jnp.mean(((jax.nn.sigmoid(logit) > 0.5) == v).astype(jnp.float32))
        if args.line_head:
            lh = spec.line_height
            ll = placement.line_logits(params, c, pcfg, train=False)
            tgt = jnp.clip(
                jnp.round(m[..., 1] / lh).astype(jnp.int32) - 1,
                0, args.line_head - 1,
            )
            lacc = jnp.sum((jnp.argmax(ll, -1) == tgt) * vf) / n
        else:
            lacc = jnp.zeros(())
        return rmse, worst, acc, lacc

    if mesh is None:
        evaluate = jax.jit(_evaluate)
    else:
        rep, dp = _dp_shardings(mesh)
        evaluate = jax.jit(_evaluate, in_shardings=(rep, dp, dp, dp))

    bsz = args.batch
    steps_per_epoch = len(tr) // bsz
    if args.epochs > 0 and steps_per_epoch == 0:
        # Same guard the fine-tune phase has: a train split smaller than
        # one batch would "train" zero steps per epoch and silently save
        # the random init.
        raise SystemExit(
            f"--epochs {args.epochs} needs at least --batch ({bsz}) train "
            f"samples per step (have {len(tr)} train strings); raise "
            "--samples or lower --batch"
        )
    key = jax.random.PRNGKey(7)
    for epoch in range(args.epochs):
        t0 = time.time()
        order = rng.permutation(tr)
        loss_sum = 0.0
        for s in range(steps_per_epoch):
            idx = jnp.asarray(order[s * bsz : (s + 1) * bsz])
            key, sub = jax.random.split(key)
            lt = line_t[idx] if args.structured else None
            ct = contrib_t[idx] if args.structured else None
            cw = ce_w[idx] if ce_w is not None else None
            params, opt_state, loss = step(
                params, opt_state, codes[idx], mids[idx], vis[idx], lt, ct,
                cw, sub
            )
            loss_sum += float(loss)
        n_eval = 4096 if mesh is None else 4096 // args.mesh * args.mesh
        vi = jnp.asarray(va[:n_eval])
        rmse, worst, acc, lacc = evaluate(params, codes[vi], mids[vi], vis[vi])
        rec = {
            "epoch": epoch,
            "train_loss": loss_sum / max(steps_per_epoch, 1),
            "val_rmse_px": float(rmse),
            "val_worst_px": float(worst),
            "val_vis_acc": float(acc),
            "seconds": time.time() - t0,
        }
        if args.line_head:
            rec["val_line_acc"] = float(lacc)
        if args.uncertainty_weights:
            rec["loss_logvar"] = [
                round(float(v), 4) for v in np.asarray(params["loss_logvar"])
            ]
        print(json.dumps(rec), flush=True)
        metrics.write(json.dumps(rec) + "\n")

    from ..utils.checkpoint import save_params

    save_params(params, os.path.join(out_dir, "placement.npz"), mcfg=pcfg)

    # End-to-end neural render vs bitmap ground truth (SIREN bank trained
    # here, ~2 min), with the ENGINE-layout hybrid as the oracle floor —
    # the gap between the two rows is the placement net's contribution.
    from ..fontgen.dataset import (
        bake_font_atlas,
        synthesize_ground_truth,
        unit_ground_truth,
    )
    from ..models import siren
    from ..render.implicit_sheet import (
        render_implicit_sheets,
        render_learned_sheets,
    )
    from ..train.implicit import train_siren

    if args.no_e2e:
        metrics.close()
        return 0
    from ..utils.checkpoint import load_siren, save_siren

    if args.siren_from:
        sp, scfg, siren_charset = load_siren(args.siren_from)
        if siren_charset != charset:
            raise SystemExit(
                f"--siren-from bank charset ({len(siren_charset)} chars) "
                f"does not match the run charset ({len(charset)} chars)"
            )
        losses = [float("nan")]  # no training loss for a loaded bank
    else:
        scfg = siren.SirenConfig(n_chars=len(charset), cell=64)
        sp, losses, _ = train_siren(
            font_path, scfg, charset=charset, steps=args.e2e_steps, lr=3e-4
        )
    save_siren(
        sp, scfg, charset, os.path.join(out_dir, "siren.npz"), font=font_path
    )

    atlas = bake_font_atlas(font_path, proportional=args.font == "montserrat")

    sp_eval = sp  # replaced by the tuned bank under --finetune-joint
    if args.finetune_steps > 0:
        # End-to-end pixel fine-tune: sheet MSE -> compose() -> placement.
        # compose is differentiable in the window origins (coords enter the
        # SIREN input as (px - origin)/r), so pixels correct the anchoring
        # residuals position supervision cannot express (e.g. the prop
        # pipeline anchors cells by bearing_x, the SIREN cell by advance
        # midpoint).
        from ..fontgen.layout import encode_codes as _enc
        from ..fontgen.ttf import TrueTypeFont as _TTF
        from ..render.implicit_sheet import (
            build_layout,
            compose,
            origins_from_midpoints,
        )

        # Round to a whole number of batch-64 slices so every jitted
        # fine-tune step sees the same shapes.
        ft_n = min(args.finetune_samples, len(tr)) // 64 * 64
        if ft_n == 0:
            raise SystemExit(
                f"--finetune-steps needs at least 64 train samples per batch "
                f"(have {len(tr)} train strings, --finetune-samples "
                f"{args.finetune_samples}); raise --samples/--finetune-samples"
            )
        ft_strings = [strings[i] for i in tr[:ft_n]]
        # Unit-range floats from every synthesizer path (see
        # dataset.unit_ground_truth).
        gt_ft = jnp.asarray(
            np.asarray(
                synthesize_ground_truth(atlas, ft_strings, on_device=True),
                np.float32,
            )
        )
        lay = build_layout(
            _TTF.load(font_path), spec, scfg.cell, max_glyphs=pcfg.max_length
        )
        ft_codes = jnp.asarray(_enc(ft_strings, pcfg.max_length))
        cidx = {c: i for i, c in enumerate(charset)}
        ids_np = np.zeros((ft_n, pcfg.max_length), np.int32)
        val_np = np.zeros((ft_n, pcfg.max_length), bool)
        for si, s in enumerate(ft_strings):
            for ci, ch in enumerate(s[: pcfg.max_length]):
                k = cidx.get(ch)
                if k is not None and ch != " ":
                    ids_np[si, ci] = k
                    val_np[si, ci] = True
        ft_ids, ft_valid = jnp.asarray(ids_np), jnp.asarray(val_np)

        def pixel_loss(tunable, c, ids, valid, gt):
            # `tunable` is (placement, siren) under --finetune-joint, else
            # just the placement params with the bank frozen in closure.
            if args.finetune_joint:
                p, bank = tunable
            else:
                p, bank = tunable, sp
            xy, _ = placement.apply(p, c, pcfg, train=False)
            origins = origins_from_midpoints(xy, lay)
            sheets = compose(bank, ids, origins, valid, scfg, lay)
            return jnp.mean((sheets - gt) ** 2)

        if args.finetune_schedule == "cosine":
            ft_lr = optax.cosine_decay_schedule(
                args.finetune_lr, args.finetune_steps
            )
        else:
            ft_lr = args.finetune_lr
        ft_opt = optax.adam(ft_lr)
        tunable = (params, sp) if args.finetune_joint else params
        ft_state = ft_opt.init(tunable)
        ft_step = make_finetune_step(pixel_loss, ft_opt, mesh)

        bs = 64
        first_px = last_px = None
        start_step = 0
        ft_mgr = None
        if args.ft_checkpoint_every > 0 or args.ft_resume:
            from ..utils.checkpoint import CheckpointManager

            ft_mgr = CheckpointManager(os.path.join(out_dir, "ft_ckpt"), keep=2)
        if args.ft_resume and ft_mgr is not None and ft_mgr.latest_step():
            # The schedule (cosine or const) and the batch slices are pure
            # functions of the step index, so restoring (tunable, Adam
            # state) at step k replays the uninterrupted run exactly.
            start_step, (tunable, ft_state), host = ft_mgr.restore(
                template=(tunable, ft_state)
            )
            if host.get("joint", False) != args.finetune_joint:
                raise SystemExit(
                    "ft_ckpt was written with a different --finetune-joint "
                    "setting; refusing to resume across head structures"
                )
            first_px = host.get("first_px")
            print(f"fine-tune resumed at step {start_step}", flush=True)
        for s in range(start_step, args.finetune_steps):
            lo = (s * bs) % ft_n
            sl = slice(lo, lo + bs)
            tunable, ft_state, px_loss = ft_step(
                tunable, ft_state, ft_codes[sl], ft_ids[sl], ft_valid[sl],
                gt_ft[sl]
            )
            if first_px is None:
                first_px = float(px_loss)
            last_px = float(px_loss)
            if (s + 1) % 500 == 0:
                # Progress heartbeat so long fine-tunes are pollable and
                # an interrupted run still reports its trajectory.
                metrics.write(
                    json.dumps(
                        {"finetune_step": s + 1, "pixel_mse": last_px}
                    )
                    + "\n"
                )
            if (
                ft_mgr is not None
                and args.ft_checkpoint_every > 0
                and (s + 1) % args.ft_checkpoint_every == 0
                and (s + 1) < args.finetune_steps
            ):
                ft_mgr.save(
                    s + 1,
                    (tunable, ft_state),
                    {"joint": args.finetune_joint, "first_px": first_px},
                )
        if args.finetune_joint:
            params, sp_tuned = tunable
        else:
            params, sp_tuned = tunable, None
        rec = {
            "finetune_pixel_mse_first": first_px,
            "finetune_pixel_mse_last": last_px,
        }
        print(json.dumps(rec), flush=True)
        metrics.write(json.dumps(rec) + "\n")
        save_params(
            params, os.path.join(out_dir, "placement_finetuned.npz"), mcfg=pcfg
        )
        if sp_tuned is not None:
            save_siren(
                sp_tuned, scfg, charset,
                os.path.join(out_dir, "siren_finetuned.npz"),
                font=font_path,
            )
            # The e2e eval row should measure what joint training bought:
            # the tuned bank renders the learned sheets. The oracle row
            # below keeps the ORIGINAL bank — engine layout never trained
            # against the tuned one, so that row stays the same floor as
            # the non-joint runs.
            sp_eval = sp_tuned
        else:
            sp_eval = sp

    learned = render_learned_sheets(
        sp_eval, params, TEST_STRINGS, font_path, scfg, pcfg, spec,
        charset=charset
    )
    oracle = render_implicit_sheets(
        sp, TEST_STRINGS, font_path, scfg, spec, charset=charset
    )
    gt = unit_ground_truth(atlas, TEST_STRINGS)
    rec = {
        "end_to_end_neural_render_mse": float(np.mean((learned - gt) ** 2)),
        "engine_layout_oracle_mse": float(np.mean((oracle - gt) ** 2)),
        "siren_final_loss": (
            None if np.isnan(losses[-1]) else float(losses[-1])
        ),
        "font": args.font,
    }
    if sp_eval is not sp:
        # Joint runs tune the bank; the row above keeps the ORIGINAL bank
        # as the cross-run-comparable floor, but the tuned bank's own
        # engine-layout oracle is what the artifact locks pin (round 5:
        # Montserrat's tuned bank measured 0.00221 vs the fresh bank's
        # 0.00362 — the gap is the bank's share of the joint win), so log
        # it too instead of leaving it to an offline re-measurement.
        oracle_tuned = render_implicit_sheets(
            sp_eval, TEST_STRINGS, font_path, scfg, spec, charset=charset
        )
        rec["engine_layout_oracle_tuned_mse"] = float(
            np.mean((oracle_tuned - gt) ** 2)
        )
    print(json.dumps(rec), flush=True)
    metrics.write(json.dumps(rec) + "\n")
    metrics.close()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="afr train-placement")
    add_args(ap)
    return run(ap.parse_args(argv), ap)
