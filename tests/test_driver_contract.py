"""Driver-contract smoke tests: __graft_entry__.entry(), dryrun_multichip, bench.py
and parity.py output format. These are the interfaces the build driver invokes; a
regression here fails the round even if the framework itself is healthy."""

import json
import runpy
import sys

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 8
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


@pytest.mark.slow
def test_dryrun_multichip_8(capsys):
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    assert "dryrun_multichip ok" in capsys.readouterr().out


@pytest.mark.slow
def test_dryrun_multichip_odd_device_count():
    import __graft_entry__ as g

    g.dryrun_multichip(3)  # non-even → model axis 1, pure dp


@pytest.mark.slow
def test_dryrun_multichip_self_bootstraps_without_conftest():
    """The driver calls dryrun_multichip(8) in an environment with ONE real device and
    no conftest bootstrapping — dryrun must re-exec itself onto a virtual CPU mesh.
    Pin exactly that invocation mode: a subprocess whose env has no
    xla_force_host_platform_device_count (so it sees 1 device)."""
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if "xla_force_host_platform_device_count" not in v or k != "XLA_FLAGS"
    }
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"  # 1 CPU device, same count the driver's chip gives
    env.pop("PYTHONPATH", None)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout


@pytest.mark.slow
def test_bench_prints_driver_json(capsys):
    sys.argv = ["bench.py"]
    runpy.run_path("bench.py", run_name="__main__")
    line = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(line)
    assert set(data) == {"metric", "value", "unit", "vs_baseline"}
    assert data["value"] > 0
    assert data["metric"] == "audio_sec_per_sec_per_chip"


@pytest.mark.slow
def test_parity_prints_json(capsys):
    sys.argv = ["parity.py"]
    runpy.run_path("parity.py", run_name="__main__")
    data = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert data["pass"] is True
