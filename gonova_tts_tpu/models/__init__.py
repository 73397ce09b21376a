"""Model stack: acoustic (NovaSpeech), vocoder (NovaGAN), speaker encoder (NovaSpk),
combined pipeline (novatts), and the model-family registry."""

from . import acoustic, layers, registry, speaker, tts, vocoder, vocos

__all__ = ["acoustic", "layers", "registry", "speaker", "tts", "vocoder", "vocos"]
