"""Config loading tests — the reference schema must actually load (SURVEY.md §5.6)."""

import pytest

from gonova_tts_tpu.config import Config, load_config


def test_defaults():
    cfg = Config()
    assert cfg.model.sample_rate == 24000
    assert cfg.queues.input_queue_size == 500
    assert cfg.queues.output_queue_size == 2000
    assert cfg.server.max_connections == 50
    assert cfg.rate_limiting.max_requests_per_minute == 100
    assert cfg.voice_cloning.min_duration == 3.0
    assert cfg.voice_cloning.max_duration == 10.0
    assert cfg.voice_cloning.min_snr == 5.0


def test_loads_reference_schema(tmp_path):
    """The reference's own config.yaml must parse into our Config."""
    yaml_text = """
model:
  model_path: null
  device: "cuda"
  device_index: 0
  chunk_size: 50
  sample_rate: 24000
voice_cloning:
  enabled: true
  cache_dir: "./voices"
  max_cached_voices: 100
  default_voice_path: "./voices/urek.wav"
  min_duration: 3.0
  max_duration: 10.0
  min_snr: 5.0
synthesis:
  default_exaggeration: 0.5
  default_cfg_weight: 3.0
  enable_streaming: true
server:
  host: "0.0.0.0"
  port: 8002
  max_connections: 50
  connection_timeout: 300
queues:
  input_queue_size: 500
  output_queue_size: 2000
rate_limiting:
  enabled: true
  max_requests_per_minute: 100
  window_seconds: 60
logging:
  level: "INFO"
  format: "json"
  file: "./logs/tts.log"
  log_syntheses: true
  log_voice_registrations: true
monitoring:
  enable_health_endpoint: true
  enable_metrics_endpoint: true
"""
    p = tmp_path / "config.yaml"
    p.write_text(yaml_text)
    cfg = load_config(str(p))
    assert cfg.model.device == "cuda"
    assert cfg.voice_cloning.default_voice_path == "./voices/urek.wav"
    assert cfg.logging.file == "./logs/tts.log"


def test_env_override(monkeypatch):
    monkeypatch.setenv("TTS_PORT", "9999")
    cfg = load_config(None)
    assert cfg.server.port == 9999


def test_explicit_missing_path_raises(tmp_path):
    """A typo'd --config must fail loudly, not silently serve defaults."""
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        load_config(str(tmp_path / "missing.yaml"))


def test_kwarg_override_is_validated():
    """Overrides go through pydantic validation: coerced, not stored verbatim."""
    cfg = load_config(None, **{"server.port": "9000"})
    assert cfg.server.port == 9000 and isinstance(cfg.server.port, int)
    import pytest as _pytest

    with _pytest.raises(Exception):
        load_config(None, **{"server.port": "not-a-port"})


def test_kwarg_override():
    cfg = load_config(None, **{"server.port": 1234, "engine.max_batch": 8})
    assert cfg.server.port == 1234
    assert cfg.engine.max_batch == 8


def test_bad_override_key():
    with pytest.raises(KeyError):
        load_config(None, **{"server.nonexistent": 1})
