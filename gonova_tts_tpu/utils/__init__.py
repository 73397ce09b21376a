"""Shared utilities: WAV codec, structured logging."""

from .jsonlog import configure as configure_logging
from .jsonlog import get_logger
from .wavio import WavError, read_wav, write_wav

__all__ = ["configure_logging", "get_logger", "WavError", "read_wav", "write_wav"]


def enable_compile_cache(default_dir=None) -> None:
    """Point JAX's persistent compilation cache at a stable directory.

    Resolution: TTS_JAX_CACHE_DIR env > `default_dir` > <cwd>/.jax_cache. One
    shared helper — the engine, train loop, bench harnesses and driver entry all
    need the identical setup, and the copies had already drifted. Never fatal:
    the cache is an optimization."""
    import os as _os

    import jax as _jax

    try:
        cache_dir = (
            _os.environ.get("TTS_JAX_CACHE_DIR")
            or default_dir
            or _os.path.join(_os.getcwd(), ".jax_cache")
        )
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001
        pass
