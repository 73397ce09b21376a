"""Shared utilities: WAV codec, structured logging."""

from .jsonlog import configure as configure_logging
from .jsonlog import get_logger
from .wavio import WavError, read_wav, write_wav

__all__ = ["configure_logging", "get_logger", "WavError", "read_wav", "write_wav"]
