"""Serving engine: bucketed compile cache, dynamic batching, streaming vocoder."""

from .batcher import DynamicBatcher
from .engine import TTSEngine
from .voice_cache import VoiceEmbeddingCache

__all__ = ["DynamicBatcher", "TTSEngine", "VoiceEmbeddingCache"]
