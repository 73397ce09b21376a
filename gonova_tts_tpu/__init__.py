"""gonova_tts_tpu — TPU-native streaming TTS framework.

A ground-up JAX/XLA/Pallas rebuild of the gonova-tts capability surface (see SURVEY.md):
text frontend → FastPitch-class acoustic model → HiFi-GAN-class vocoder, served through a
protocol-identical WebSocket streaming API with dynamic batching on TPU.
"""

__version__ = "0.1.0"

from .config import Config, load_config

__all__ = ["Config", "load_config", "__version__"]
