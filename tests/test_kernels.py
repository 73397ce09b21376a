"""Pallas kernel tests (interpret mode on CPU; the same kernels compile on TPU).

Oracle: the pure-JAX DSP implementations in gonova_tts_tpu/audio."""

import jax.numpy as jnp
import numpy as np
import pytest

from gonova_tts_tpu.audio import mel_spectrogram
from gonova_tts_tpu.ops import mel_spectrogram_pallas


@pytest.fixture(scope="module")
def audio(rng):
    # 2 batch, 2 s @ 24 kHz — covers multiple 128-frame blocks (187 frames).
    return jnp.asarray(rng.standard_normal((2, 48000 - 48000 % 256)).astype(np.float32) * 0.3)


def test_fused_mel_matches_oracle(audio):
    ours = np.asarray(mel_spectrogram_pallas(audio, interpret=True))
    oracle = np.asarray(mel_spectrogram(audio))
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=2e-4, rtol=1e-4)


def test_fused_mel_single_example(audio):
    one = audio[0]
    ours = np.asarray(mel_spectrogram_pallas(one, interpret=True))
    oracle = np.asarray(mel_spectrogram(one))
    assert ours.ndim == 2
    np.testing.assert_allclose(ours, oracle, atol=2e-4, rtol=1e-4)


def test_fused_mel_block_boundary(rng):
    """Exactly one block (128 frames) and just over (129 frames)."""
    for frames in (128, 129):
        x = jnp.asarray(rng.standard_normal((1, frames * 256)).astype(np.float32))
        ours = np.asarray(mel_spectrogram_pallas(x, interpret=True))
        oracle = np.asarray(mel_spectrogram(x))
        assert ours.shape == (1, frames, 80)
        np.testing.assert_allclose(ours, oracle, atol=2e-4, rtol=1e-4)


def test_fused_mel_rejects_bad_hop():
    with pytest.raises(ValueError):
        mel_spectrogram_pallas(jnp.zeros((1, 1000)), n_fft=1000, hop_length=300, interpret=True)
