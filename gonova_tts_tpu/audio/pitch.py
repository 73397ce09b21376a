"""Frame-wise F0 estimation (autocorrelation method, YIN-style normalization).

Host-side (numpy) — used by the training data pipeline to build pitch targets; not on
the serving hot path.  The reference has no training pipeline at all (SURVEY.md §1);
this is part of making the in-repo model stack trainable.
"""

from __future__ import annotations

import numpy as np


def estimate_f0(
    audio: np.ndarray,
    sr: int = 24000,
    hop_length: int = 256,
    frame_length: int = 1024,
    fmin: float = 60.0,
    fmax: float = 500.0,
    threshold: float = 0.3,
) -> np.ndarray:
    """Per-frame F0 in Hz (0 = unvoiced). Output length = len(audio) // hop_length."""
    audio = np.asarray(audio, np.float64)
    n_frames = len(audio) // hop_length
    pad = frame_length // 2
    x = np.pad(audio, (pad, pad + frame_length))
    lag_min = max(2, int(sr / fmax))
    lag_max = min(frame_length - 1, int(sr / fmin))

    f0 = np.zeros(n_frames)
    for i in range(n_frames):
        frame = x[i * hop_length : i * hop_length + frame_length]
        frame = frame - frame.mean()
        energy = np.sum(frame * frame)
        if energy < 1e-8:
            continue
        # Normalized autocorrelation via FFT.
        spec = np.fft.rfft(frame, n=2 * frame_length)
        ac = np.fft.irfft(spec * np.conj(spec))[:frame_length]
        ac = ac / (ac[0] + 1e-12)
        seg = ac[lag_min : lag_max + 1]
        if len(seg) == 0:
            continue
        best = int(np.argmax(seg))
        if seg[best] < threshold:
            continue
        lag = lag_min + best
        # Parabolic interpolation around the peak for sub-sample lag.
        if 0 < best < len(seg) - 1:
            a, b, c = seg[best - 1], seg[best], seg[best + 1]
            denom = a - 2 * b + c
            if abs(denom) > 1e-12:
                lag = lag + 0.5 * (a - c) / denom
        f0[i] = sr / lag
    return f0.astype(np.float32)


def f0_to_feature(f0: np.ndarray) -> np.ndarray:
    """Hz → normalized log-pitch feature (0 where unvoiced): log(f0/220)."""
    out = np.zeros_like(f0, np.float32)
    voiced = f0 > 1.0
    out[voiced] = np.log(f0[voiced] / 220.0)
    return out
