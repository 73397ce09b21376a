"""STFT / inverse STFT in pure JAX, implemented as matmul-DFT.

This is the mel-space foundation the whole stack is measured in (parity metric is mel
MSE/MCD — BASELINE.md).  The reference delegates all DSP to torch/torchaudio inside the
external chatterbox package; here it is an in-repo, jit-compilable op.

Why matmul-DFT and not jnp.fft: (a) the TPU backend in this environment does not
implement FFT, and (b) a [frames, n_fft] @ [n_fft, bins] real matmul pair maps directly
onto the MXU and fuses with the windowing and the mel projection — the Pallas kernel in
gonova_tts_tpu/ops fuses the full frame→window→DFT→mel chain using the same bases.

Convention: HiFi-GAN-style framing — reflect-pad (n_fft - hop) // 2 on both sides,
center=False — so an audio clip of T samples (T % hop == 0) produces exactly T // hop
frames.  That exact frame/sample correspondence is what lets the streaming vocoder map
fixed mel windows to fixed audio windows with no drift.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window / scipy 'hann', fftbins=True)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(dtype)


@functools.lru_cache(maxsize=8)
def dft_bases(n_fft: int, dtype=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    """Real-DFT bases: cos/sin matrices of shape [n_fft, n_fft // 2 + 1] such that
    rfft(x)[k] = x @ cos[:, k] - i * (x @ sin[:, k])."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


@functools.lru_cache(maxsize=8)
def idft_bases(n_fft: int, dtype=np.float32) -> Tuple[np.ndarray, np.ndarray]:
    """Inverse real-DFT bases [n_fft // 2 + 1, n_fft]:
    irfft(R - iS)[n] = R @ icos[:, n] + S @ isin[:, n], with conjugate-symmetry weights."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    w = np.full((n_bins, 1), 2.0 / n_fft)
    w[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        w[-1] = 1.0 / n_fft
    return (np.cos(ang) * w).astype(dtype), (np.sin(ang) * w).astype(dtype)


def _full_window(n_fft: int, win_length: int) -> jnp.ndarray:
    window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    return window


def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Split [..., T] into overlapping frames [..., n_frames, n_fft].

    Reflect-pads (n_fft - hop) // 2 on each side so n_frames == T // hop_length
    for hop-aligned T.

    When hop divides n_fft (all configs here), frames are built from a hop-row
    reshape + r statically-shifted slices instead of a gather — TPU gathers are slow
    (the same insight as the fused mel kernel), and this path also sits under the
    training losses' multi-resolution STFT.
    """
    pad = (n_fft - hop_length) // 2
    if x.shape[-1] <= pad:
        # Reflect padding needs T > pad. Clips shorter than that (possible for
        # the multi-resolution training losses' larger n_fft on tail chunks)
        # zero-extend first — the analysis of a near-empty clip is near-silence
        # either way, and crashing beats nothing but this.
        deficit = pad + 1 - x.shape[-1]
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, deficit)])
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    total = x.shape[-1]
    n_frames = 1 + (total - n_fft) // hop_length
    if n_fft % hop_length == 0:
        r = n_fft // hop_length
        n_rows = n_frames - 1 + r
        rows = x[..., : n_rows * hop_length].reshape(x.shape[:-1] + (n_rows, hop_length))
        return jnp.concatenate(
            [rows[..., k : k + n_frames, :] for k in range(r)], axis=-1
        )
    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return x[..., idx]


def stft_ri(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real/imag STFT of [..., T] → two arrays [..., n_frames, n_fft // 2 + 1]."""
    frames = frame_signal(x, n_fft, hop_length) * _full_window(n_fft, win_length)
    cos_b, sin_b = dft_bases(n_fft)
    real = frames @ jnp.asarray(cos_b)
    imag = -(frames @ jnp.asarray(sin_b))
    return real, imag


def stft(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
) -> jnp.ndarray:
    """Complex STFT (convenience wrapper over :func:`stft_ri` for host-side use)."""
    real, imag = stft_ri(x, n_fft, hop_length, win_length)
    return jax.lax.complex(real, imag)


def spectrogram(
    x: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    power: float = 1.0,
    eps: float = 1e-9,
) -> jnp.ndarray:
    """Magnitude (power=1) or power (power=2) spectrogram."""
    real, imag = stft_ri(x, n_fft, hop_length, win_length)
    sq = real * real + imag * imag
    if power == 2.0:
        return sq
    mag = jnp.sqrt(jnp.maximum(sq, eps))
    if power == 1.0:
        return mag
    return mag**power


def istft(
    spec,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    length: Optional[int] = None,
) -> jnp.ndarray:
    """Inverse STFT with windowed overlap-add (NOLA-normalized).

    Accepts a complex array [..., n_frames, n_fft//2+1] or an (real, imag) tuple.
    Inverts the framing convention of :func:`stft` (reflect pad (n_fft-hop)//2).
    """
    if isinstance(spec, tuple):
        real, imag = spec
    else:
        real, imag = spec.real, spec.imag
    icos, isin = idft_bases(n_fft)
    # stft_ri produced (R, I) with I = -x@sin, i.e. X = R + iI; irfft needs R - i(-I).
    frames = real @ jnp.asarray(icos) + (-imag) @ jnp.asarray(isin)
    window = _full_window(n_fft, win_length)
    frames = frames * window

    n_frames = frames.shape[-2]
    total = n_fft + (n_frames - 1) * hop_length
    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, n_fft))

    def overlap_add(fr):
        out = jnp.zeros((total,), dtype=fr.dtype)
        wsum = jnp.zeros((total,), dtype=fr.dtype)
        win_sq = window * window

        def body(i, carry):
            out, wsum = carry
            start = i * hop_length
            out = jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(out, (start,), (n_fft,)) + fr[i], (start,)
            )
            wsum = jax.lax.dynamic_update_slice(
                wsum, jax.lax.dynamic_slice(wsum, (start,), (n_fft,)) + win_sq, (start,)
            )
            return out, wsum

        out, wsum = jax.lax.fori_loop(0, n_frames, body, (out, wsum))
        return out / jnp.maximum(wsum, 1e-8)

    y = jax.vmap(overlap_add)(flat)
    pad = (n_fft - hop_length) // 2
    y = y[:, pad : total - pad]
    y = y.reshape(batch_shape + (y.shape[-1],))
    if length is not None:
        y = y[..., :length]
    return y
