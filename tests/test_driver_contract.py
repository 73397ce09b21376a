"""Driver-contract smoke tests: __graft_entry__.entry(), dryrun_multichip, bench.py
and parity.py output format. These are the interfaces the build driver invokes; a
regression here fails the round even if the framework itself is healthy."""

import json
import runpy
import sys

import jax
import numpy as np
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 8
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_dryrun_multichip_8(capsys):
    import __graft_entry__ as g

    g.dryrun_multichip(8)
    assert "dryrun_multichip ok" in capsys.readouterr().out


def test_dryrun_multichip_odd_device_count():
    import __graft_entry__ as g

    g.dryrun_multichip(3)  # non-even → model axis 1, pure dp


def test_bench_prints_driver_json(capsys):
    sys.argv = ["bench.py"]
    runpy.run_path("bench.py", run_name="__main__")
    line = capsys.readouterr().out.strip().splitlines()[-1]
    data = json.loads(line)
    assert set(data) == {"metric", "value", "unit", "vs_baseline"}
    assert data["value"] > 0
    assert data["metric"] == "audio_sec_per_sec_per_chip"


def test_parity_prints_json(capsys):
    sys.argv = ["parity.py"]
    runpy.run_path("parity.py", run_name="__main__")
    data = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert data["pass"] is True
