"""Mel filterbank and log-mel features (pure JAX; the Pallas-fused variant lives in
gonova_tts_tpu/ops and must match this module bit-for-bit within tolerance — it is the
parity oracle for the kernel tests).

Slaney-style mel scale + area normalization, matching librosa.filters.mel defaults,
which is what HiFi-GAN-family vocoders train against.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .stft import spectrogram


def hz_to_mel(f, htk: bool = False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney: linear below 1 kHz, log above.
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    safe_f = np.maximum(f, 1e-30)
    return np.where(f >= min_log_hz, min_log_mel + np.log(safe_f / min_log_hz) / logstep, mel)


def mel_to_hz(m, htk: bool = False):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freq = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freq)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sr: int = 24000,
    n_fft: int = 1024,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = 12000.0,
    htk: bool = False,
    norm: str = "slaney",
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank, shape [n_fft // 2 + 1, n_mels] (ready for frames @ fb)."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)

    fb = np.zeros((n_mels, n_bins), dtype=np.float64)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    for m in range(n_mels):
        lower = -ramps[m] / fdiff[m]
        upper = ramps[m + 2] / fdiff[m + 1]
        fb[m] = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        fb *= enorm[:, None]
    return fb.T.astype(dtype)


def mel_spectrogram(
    x: jnp.ndarray,
    sr: int = 24000,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = 12000.0,
    log: bool = True,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """[..., T] audio → [..., n_frames, n_mels] (natural-log-compressed by default,
    the HiFi-GAN convention: log(clamp(mel, eps)))."""
    mag = spectrogram(x, n_fft, hop_length, win_length, power=1.0)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = mag @ fb
    if log:
        mel = jnp.log(jnp.maximum(mel, eps))
    return mel


def mel_mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean-squared error between two log-mel tensors (the parity metric)."""
    return jnp.mean((a - b) ** 2)


def mcd(a: jnp.ndarray, b: jnp.ndarray, n_coeffs: int = 13) -> jnp.ndarray:
    """Mel-cepstral distortion (dB) between two log-mel tensors [..., T, n_mels].

    Standard MCD (Kubichek): c_i = sqrt(2/N) * DCT-II of the log-mel, drop c0,
    10/ln(10)*sqrt(2*sum((da-db)^2)). The sqrt(2/N) cepstral normalization is
    what makes the number literature-comparable — without it every coefficient
    (and the reported dB) is inflated by sqrt(N/2) ≈ 6.3 at N=80.
    """
    n_mels = a.shape[-1]
    k = jnp.arange(n_mels)
    basis = jnp.sqrt(2.0 / n_mels) * jnp.cos(
        jnp.pi * jnp.arange(n_coeffs)[:, None] * (2 * k[None, :] + 1) / (2 * n_mels)
    )
    ca = a @ basis.T
    cb = b @ basis.T
    diff = (ca - cb)[..., 1:]  # drop c0 (overall energy)
    return jnp.mean(10.0 / jnp.log(10.0) * jnp.sqrt(2.0 * jnp.sum(diff**2, axis=-1)))
