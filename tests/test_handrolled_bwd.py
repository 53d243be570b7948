"""Hand-rolled projection backward (TrainConfig.handrolled_bwd).

Round-3 roofline work (RESULTS.md): autodiff feeds the projection's
backward GEMMs an f32 cotangent (dX at 2.3x roofline); the hand-rolled
step writes the clamp-mask/MSE chain out explicitly and casts the masked
cotangent to bf16 once for both GEMMs. These tests pin (a) exact gradient
agreement with autodiff in strict-f32 mode, (b) the epoch path running
end-to-end with matching losses, (c) the unsupported-config guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_font_renderer_tpu.config import ModelConfig, TrainConfig
from ai_font_renderer_tpu.models import font_renderer
from ai_font_renderer_tpu.train.step import (
    TrainState,
    _handrolled_step,
    init_state,
    loss_fn,
    make_optimizer,
    train_eval_epoch,
)

SMALL = dict(max_length=24, sheet_height=16, sheet_width=48)


def test_handrolled_grads_match_autodiff_f32():
    """In strict-f32 mode the hand-rolled backward must reproduce
    jax.grad to float rounding (<=1e-6 rel, with an absolute floor for
    mathematically-zero gradients like bk's: softmax is shift-invariant
    in the key bias, so its true gradient is ~0 and both paths emit
    noise there)."""
    mcfg = ModelConfig(bf16_matmul=False, **SMALL)
    key = jax.random.PRNGKey(0)
    params = font_renderer.init(key, mcfg)
    codes = jax.random.randint(key, (16, 24), 65, 91, jnp.int32)
    targets = jax.random.uniform(jax.random.PRNGKey(2), (16, 16, 48))
    dkey = jax.random.key(1, impl="rbg")

    g_auto = jax.grad(loss_fn)(params, codes, targets, mcfg, dkey, True)

    # Re-derive the hand-rolled grads through one optimizer-free probe:
    # run _handrolled_step with a zero-lr SGD-free surrogate is awkward
    # (optax state), so mirror its gradient block directly.
    rest = {k: v for k, v in params.items() if k != "out_w"}

    def front(rp):
        return font_renderer.frontend(rp, codes, mcfg, train=True, key=dkey)

    flat, vjp = jax.vjp(front, rest)
    pre = (
        jnp.dot(flat, params["out_w"], preferred_element_type=jnp.float32)
        + params["out_b"]
    )
    out = jnp.clip(pre, 0.0, 1.0)
    t = targets.reshape(16, -1).astype(jnp.float32)
    d = out - t
    gm = jnp.where((out > 0.0) & (out < 1.0), (2.0 / d.size) * d, 0.0)
    dflat = jnp.dot(gm, params["out_w"].T, preferred_element_type=jnp.float32)
    (gr,) = vjp(dflat)
    gh = dict(gr)
    gh["out_b"] = jnp.sum(gm, axis=0)
    gh["out_w"] = jax.lax.dot_general(
        flat, gm, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    for k in g_auto:
        a = np.asarray(g_auto[k], np.float64)
        c = np.asarray(gh[k], np.float64)
        tol = 1e-6 * np.max(np.abs(a)) + 1e-10
        assert np.max(np.abs(a - c)) <= tol, k


def test_handrolled_epoch_matches_losses():
    """train_eval_epoch with handrolled_bwd runs end-to-end; the forward
    is identical so train/val losses agree tightly (the bf16 cotangent
    only perturbs gradients)."""
    mcfg = ModelConfig(**SMALL)
    key = jax.random.PRNGKey(0)
    n, b, steps = 64, 16, 3
    codes = jax.random.randint(key, (n, 24), 65, 91, jnp.int32)
    targets = jax.random.randint(key, (n, 16, 48), 0, 256, jnp.int32).astype(
        jnp.uint8
    )
    bi = jnp.arange(steps * b, dtype=jnp.int32).reshape(steps, b) % n
    vi, vw = bi[:1], jnp.ones((1, b), jnp.float32)
    lr = jnp.float32(1e-3)
    skey = jax.random.key(1, impl="rbg")

    losses = {}
    for name, tcfg in [
        ("std", TrainConfig()),
        ("hand", TrainConfig(handrolled_bwd=True)),
    ]:
        st = init_state(jax.random.PRNGKey(0), mcfg, tcfg)
        st, tl, vl = train_eval_epoch(
            st, codes, targets, bi, vi, vw, lr, skey, mcfg, tcfg
        )
        losses[name] = (float(tl), float(vl))
        assert np.isfinite(losses[name]).all()
    np.testing.assert_allclose(losses["hand"], losses["std"], rtol=1e-3)


@pytest.mark.parametrize("policy", ["dots", "full"])
def test_remat_frontend_step_matches_none(policy):
    """TrainConfig.remat_frontend must be a pure scheduling choice: the
    checkpointed frontend replays the same PRNG-keyed dropout, so one
    hand-rolled step produces bit-identical params/loss vs remat='none'
    (strict f32 so no bf16 rounding enters the comparison)."""
    mcfg = ModelConfig(bf16_matmul=False, **SMALL)
    codes = jax.random.randint(jax.random.PRNGKey(3), (16, 24), 65, 91, jnp.int32)
    targets = jax.random.uniform(jax.random.PRNGKey(4), (16, 16, 48))
    lr = jnp.float32(1e-3)
    dkey = jax.random.key(1, impl="rbg")

    outs = {}
    for rf in ("none", policy):
        tcfg = TrainConfig(handrolled_bwd=True, remat_frontend=rf)
        st = init_state(jax.random.PRNGKey(0), mcfg, tcfg)
        st2, loss = _handrolled_step(st, codes, targets, lr, dkey, mcfg, tcfg)
        outs[rf] = (jax.tree.map(np.asarray, st2.params), float(loss))
    assert outs["none"][1] == outs[policy][1]
    for k in outs["none"][0]:
        np.testing.assert_array_equal(outs["none"][0][k], outs[policy][0][k], err_msg=k)


def test_remat_frontend_rejects_unknown_policy():
    # Validation fires at construction (TrainConfig.__post_init__), so a
    # bad policy can never reach the step.
    with pytest.raises(ValueError, match="remat_frontend"):
        TrainConfig(handrolled_bwd=True, remat_frontend="bogus")


def test_remat_frontend_requires_handrolled_step():
    # Under the default standard step the flag is never consumed; a config
    # that sets it without handrolled_bwd would silently "measure" nothing,
    # so construction rejects the combination.
    with pytest.raises(ValueError, match="handrolled_bwd"):
        TrainConfig(remat_frontend="dots")


def test_handrolled_refuses_unsupported_configs():
    tcfg = TrainConfig(handrolled_bwd=True)
    codes = jnp.full((4, 24), 65, jnp.int32)
    targets = jnp.zeros((4, 16, 48), jnp.float32)
    lr = jnp.float32(1e-3)
    dkey = jax.random.key(1, impl="rbg")
    for bad in (
        ModelConfig(decoder="conv_ps", decoder_grid=(4, 6), **SMALL),
        ModelConfig(leaky_clamp=0.1, **SMALL),
    ):
        params = font_renderer.init(jax.random.PRNGKey(0), bad)
        st = TrainState(params, make_optimizer(tcfg).init(params))
        with pytest.raises(ValueError, match="handrolled_bwd"):
            _handrolled_step(st, codes, targets, lr, dkey, bad, tcfg)
