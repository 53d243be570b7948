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


def test_dryrun_self_provisions_from_one_device(tmp_path):
    """The driver path: a 1-device parent with a hostile sitecustomize on
    PYTHONPATH must still complete dryrun_multichip(8).

    This is the exact failure mode of MULTICHIP_r01/r02: the parent env
    carries a sitecustomize (axon's claims the TPU on interpreter start)
    that must NOT reach the re-exec'd child. We plant a sentinel
    sitecustomize that records every interpreter it runs in; after the
    dry run, the sentinel must have fired only for the 1-device parent,
    never the 8-device child.
    """
    import os
    import subprocess
    import sys

    site_dir = tmp_path / "hostile_site"
    site_dir.mkdir()
    log = tmp_path / "sitecustomize_ran.log"
    (site_dir / "sitecustomize.py").write_text(
        "import os\n"
        f"with open({str(log)!r}, 'a') as f:\n"
        "    f.write(os.environ.get('AFR_DRYRUN_CHILD', 'parent') + '\\n')\n"
    )

    repo = os.path.dirname(os.path.abspath(graft.__file__))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = str(site_dir) + os.pathsep + repo
    # Simulate the axon trigger var: the fix must drop it for the child.
    env["PALLAS_AXON_POOL_IPS"] = "127.0.0.1"
    env.pop("AFR_DRYRUN_CHILD", None)

    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; assert len(jax.devices()) == 1; "
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    ran_in = log.read_text().splitlines() if log.exists() else []
    assert "1" not in ran_in, f"sitecustomize reached the dryrun child: {ran_in}"


def test_dryrun_child_guard_refuses_reexec(tmp_path, monkeypatch):
    """A child that still sees too few devices must raise, not fork again."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.abspath(graft.__file__))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = repo
    env["AFR_DRYRUN_CHILD"] = "1"
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode != 0
    assert "refusing to re-exec" in proc.stderr
