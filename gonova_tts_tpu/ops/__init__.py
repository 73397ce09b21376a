"""Pallas TPU kernels (the framework's native compute layer) with pure-JAX oracles.

The reference has no native code of its own (SURVEY.md §2.4 — its GPU work lives in
the external torch package); here the native layer is Mosaic/Pallas kernels for the
DSP hot paths, each allclose-tested against the pure-JAX implementation it fuses.
"""

from .convnext_kernel import convnext_block_pallas
from .vocos_stack_kernel import vocos_stack_pallas
from .mel_kernel import mel_spectrogram_pallas

__all__ = ["convnext_block_pallas", "mel_spectrogram_pallas", "vocos_stack_pallas"]
