"""Parity gate as a test: bf16 compute path vs f32 reference path (BASELINE metric)."""

import json
import runpy
import sys

import pytest


@pytest.mark.slow
def test_parity_gate(capsys):
    sys.argv = ["parity.py"]
    runpy.run_path("parity.py", run_name="__main__")
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pass"], out
    assert out["mel_mse"] < 1e-2
    assert out["mcd_db"] < 1.0
