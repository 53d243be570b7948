"""Driver entry points: compile-check entry() and the multichip dry run."""

import jax
import pytest

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 80, 240)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_dryrun_multichip_odd_counts():
    graft.dryrun_multichip(4)
    graft.dryrun_multichip(3)  # non-even: model_par falls back to 1
