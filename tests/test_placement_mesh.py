"""DP mesh path of afr train-placement (VERDICT r4 #4).

The placement trainer's step builders (train/placement_cli.py:
make_supervised_step / make_finetune_step) must produce the same
training trajectory on a data-parallel mesh as on a single device —
params replicate, batches shard, GSPMD inserts the gradient all-reduce.
Runs on the conftest 8-device virtual CPU mesh.
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ai_font_renderer_tpu.config import FIRACODE_PATH, ModelConfig, SheetSpec
from ai_font_renderer_tpu.models import placement, siren
from ai_font_renderer_tpu.parallel.mesh import make_mesh
from ai_font_renderer_tpu.train import placement_cli


def _toy_batch(key, b=16, structured=False):
    kc, km = jax.random.split(key)
    codes = jax.random.randint(kc, (b, 100), 32, 127, jnp.int32)
    mids = 10.0 * jax.random.uniform(km, (b, 100, 2))
    vis = jnp.ones((b, 100), bool)
    if structured:
        line = jnp.zeros((b, 100), jnp.int32)
        contrib = jnp.ones((b, 100), bool)
        return codes, mids, vis, line, contrib
    return codes, mids, vis


@pytest.mark.parametrize("data", [2, 4, 8])
def test_supervised_step_matches_single_device(data):
    pcfg = ModelConfig()
    params = placement.init(jax.random.PRNGKey(0), pcfg, lines=5)
    opt = optax.adamw(1e-3, weight_decay=1e-4)
    codes, mids, vis = _toy_batch(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)

    def run_steps(mesh):
        step = placement_cli.make_supervised_step(pcfg, opt, mesh=mesh)
        p, st = params, opt.init(params)
        losses = []
        for i in range(3):
            p, st, loss = step(
                p, st, codes, mids, vis, None, None, None,
                jax.random.fold_in(key, i),
            )
            losses.append(float(loss))
        return p, losses

    p1, l1 = run_steps(None)
    pm, lm = run_steps(make_mesh(data=data, model=1))
    np.testing.assert_allclose(lm, l1, rtol=2e-5)
    for k in ("place_w", "wq", "fc1_w"):
        np.testing.assert_allclose(
            np.asarray(pm[k]), np.asarray(p1[k]), atol=3e-6, err_msg=k
        )


def test_supervised_step_structured_head_on_mesh():
    pcfg = ModelConfig()
    params = placement.init(
        jax.random.PRNGKey(0), pcfg, lines=5,
        advances=np.full(128, 2.0, np.float32),
    )
    opt = optax.adamw(1e-3, weight_decay=1e-4)
    codes, mids, vis, line, contrib = _toy_batch(
        jax.random.PRNGKey(1), structured=True
    )
    step1 = placement_cli.make_supervised_step(
        pcfg, opt, detach_structure=True, mesh=None
    )
    stepm = placement_cli.make_supervised_step(
        pcfg, opt, detach_structure=True, mesh=make_mesh(data=4, model=1)
    )
    k = jax.random.PRNGKey(2)
    _, _, loss1 = step1(
        params, opt.init(params), codes, mids, vis, line, contrib, None, k
    )
    _, _, lossm = stepm(
        params, opt.init(params), codes, mids, vis, line, contrib, None, k
    )
    np.testing.assert_allclose(float(lossm), float(loss1), rtol=2e-5)


def test_finetune_step_matches_single_device():
    # The real pixel path: placement.apply -> origins -> SIREN compose,
    # tiny bank, joint (placement, siren) tunable.
    from ai_font_renderer_tpu.fontgen.ttf import TrueTypeFont
    from ai_font_renderer_tpu.render.implicit_sheet import (
        build_layout,
        compose,
        origins_from_midpoints,
    )

    pcfg = ModelConfig()
    spec = SheetSpec()
    scfg = siren.SirenConfig(n_chars=95, cell=16, hidden_dim=16, n_layers=1)
    sp = siren.init(jax.random.PRNGKey(3), scfg)
    pparams = placement.init(jax.random.PRNGKey(0), pcfg, lines=5)
    font = TrueTypeFont.load(FIRACODE_PATH)
    lay = build_layout(font, spec, scfg.cell, max_glyphs=pcfg.max_length)

    b = 8
    codes = jax.random.randint(jax.random.PRNGKey(4), (b, 100), 33, 127, jnp.int32)
    ids = jnp.clip(codes - 32, 0, 94)
    valid = jnp.ones((b, 100), bool)
    gt = jnp.ones((b, lay.height, lay.width), jnp.float32)

    def pixel_loss(tunable, c, ids, valid, gt):
        p, bank = tunable
        xy, _ = placement.apply(p, c, pcfg, train=False)
        origins = origins_from_midpoints(xy, lay)
        sheets = compose(bank, ids, origins, valid, scfg, lay)
        return jnp.mean((sheets - gt) ** 2)

    ft_opt = optax.adam(1e-4)
    tunable = (pparams, sp)

    def one(mesh):
        step = placement_cli.make_finetune_step(pixel_loss, ft_opt, mesh)
        t, st, loss = step(tunable, ft_opt.init(tunable), codes, ids, valid, gt)
        return t, float(loss)

    t1, l1 = one(None)
    tm, lm = one(make_mesh(data=4, model=1))
    assert np.isfinite(lm)
    np.testing.assert_allclose(lm, l1, rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(tm[0]["place_w"]), np.asarray(t1[0]["place_w"]), atol=3e-6
    )


def test_cli_mesh_flag_registered_and_guarded():
    ap = argparse.ArgumentParser()
    placement_cli.add_args(ap)
    args = ap.parse_args(["--mesh", "4"])
    assert args.mesh == 4
    # The batch guard trips before any data work (run() front matter).
    bad = ap.parse_args(["--mesh", "3", "--batch", "1024", "--samples", "100"])
    with pytest.raises(SystemExit):
        placement_cli.run(bad, ap)
