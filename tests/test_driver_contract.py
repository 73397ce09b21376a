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


def _clean_env(platform: str) -> dict:
    """Env for a driver-mode subprocess: no conftest device-count flags, ambient
    JAX_PLATFORMS pinned to `platform` (possibly a nonexistent one, simulating the
    driver's axon preset with the tunnel down)."""
    import os

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = platform
    return env


@pytest.mark.slow
def test_dryrun_multichip_driver_env_matrix():
    """Pin the driver's EXACT round-4 failing invocation (MULTICHIP_r04.json rc=1):
    ambient env intact — including this environment's axon platform plugin, which
    pre-registers and wins over JAX_PLATFORMS — plus the driver's two overrides:

        XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
            python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

    Round 4's probe subprocess replayed jax_platforms=cpu and saw 8 virtual CPU
    devices, then gated an AMBIENT direct call where the plugin won and only 1
    device existed → make_mesh raised. The fix: no ambient path at all — the impl
    always runs in the hermetic virtual-CPU-mesh subprocess."""
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)  # keep ambient plugin registration intact
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.pop("PYTHONPATH", None)
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_survives_dead_backend():
    """Round-3 regression: the driver calls dryrun_multichip(8) with ambient
    JAX_PLATFORMS=axon and the tunnel down — backend init hangs/raises. The probe
    must degrade to 0 devices in a bounded subprocess and the virtual-CPU-mesh
    fallback must still produce 'dryrun_multichip ok' (MULTICHIP_r03.json rc=124)."""
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = "import __graft_entry__ as g; g.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=repo,
        env=_clean_env("no_such_platform"),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout


def test_bench_fails_fast_with_parseable_diagnostic_on_dead_backend():
    """Round-3 regression: bench.py died at backend init with rc=1 and a 40-line
    traceback, leaving BENCH_r03.json unparseable. With an unavailable backend it
    must exit nonzero quickly with a one-line JSON diagnostic as the last stdout
    line (VERDICT r3 #1b)."""
    import os
    import subprocess
    import time as _time

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = _clean_env("no_such_platform")
    env["BENCH_PROBE_BUDGET_S"] = "8"
    t0 = _time.monotonic()
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    elapsed = _time.monotonic() - t0
    assert proc.returncode != 0
    data = json.loads(proc.stdout.strip().splitlines()[-1])
    assert data["error"] == "tpu_backend_unavailable"
    assert data["metric"] == "audio_sec_per_sec_per_chip"
    assert elapsed < 100, f"diagnostic path too slow: {elapsed:.0f}s"


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
