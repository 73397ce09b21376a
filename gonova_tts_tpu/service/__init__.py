"""Service layer: protocol-compatible WS/REST server, queues, voices, rate limiting."""

from .queue_manager import AudioChunk, SynthesisRequest, TTSQueueManager
from .rate_limiter import RateLimiter
from .synthesizer import StreamingSynthesizer
from .voice_manager import VoiceManager, sanitize_voice_id, validate_reference_audio

__all__ = [
    "AudioChunk",
    "SynthesisRequest",
    "TTSQueueManager",
    "RateLimiter",
    "StreamingSynthesizer",
    "VoiceManager",
    "sanitize_voice_id",
    "validate_reference_audio",
]
