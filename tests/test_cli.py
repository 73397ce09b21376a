"""CLI tests: info, voices, offline synth end-to-end."""

import json

import numpy as np
import pytest

from gonova_tts_tpu import cli
from gonova_tts_tpu.utils import read_wav

TINY_YAML = """
model:
  d_model: 64
  n_heads: 2
  d_ff: 128
  encoder_layers: 1
  decoder_layers: 1
  speaker_dim: 32
  upsample_initial_channel: 32
  vocos_dim: 128
  vocos_ff: 256
  vocos_layers: 2
  compute_dtype: float32
engine:
  warmup_shapes: [[1, 32]]
voice_cloning:
  cache_dir: "{voices}"
  default_voice_path: null
logging:
  level: "WARNING"
"""


def test_cli_info(capsys):
    assert cli.main(["info"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["jax_backend"] == "cpu"
    assert "novatts" in out["model_families"]


def test_cli_voices_empty(tmp_path, capsys):
    cfg = tmp_path / "config.yaml"
    cfg.write_text(TINY_YAML.format(voices=tmp_path / "voices"))
    assert cli.main(["voices", "--config", str(cfg)]) == 0
    assert json.loads(capsys.readouterr().out) == []


def test_cli_synth_writes_wav(tmp_path, capsys):
    cfg = tmp_path / "config.yaml"
    cfg.write_text(TINY_YAML.format(voices=tmp_path / "voices"))
    out_path = str(tmp_path / "out.wav")
    rc = cli.main(
        ["synth", "Hello from the command line.", "-o", out_path, "--config", str(cfg)]
    )
    assert rc == 0
    audio, sr = read_wav(out_path)
    assert sr == 24000
    assert len(audio) > 0 and np.isfinite(audio).all()
