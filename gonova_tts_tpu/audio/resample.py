"""Polyphase sample-rate conversion in pure JAX.

Replaces the reference's torchaudio.functional.resample call in the voice-reference path
(reference: services/tts/core/synthesizer.py:389-394).  Implemented as a single fused
`lax.conv_general_dilated` with input dilation = upsample factor and stride = downsample
factor — exactly the upfirdn structure scipy.signal.resample_poly uses, so it is
golden-testable against scipy with identical taps, and on TPU it compiles to one conv.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=32)
def _kaiser_sinc_filter(up: int, down: int, width_mult: int = 64, beta: float = 14.769656459379492) -> np.ndarray:
    """Kaiser-windowed sinc lowpass for rational resampling (scipy resample_poly defaults)."""
    max_rate = max(up, down)
    f_c = 1.0 / max_rate  # normalized cutoff (Nyquist of the lower rate)
    half_len = width_mult * max_rate
    n = np.arange(-half_len, half_len + 1)
    taps = f_c * np.sinc(f_c * n) * np.kaiser(2 * half_len + 1, beta)
    return (taps * up).astype(np.float64)


def resample(x: jnp.ndarray, orig_sr: int, new_sr: int, dtype=jnp.float32) -> jnp.ndarray:
    """Resample [..., T] from orig_sr to new_sr. Output length = ceil(T * new / orig)."""
    if orig_sr == new_sr:
        return jnp.asarray(x, dtype=dtype)
    g = math.gcd(int(orig_sr), int(new_sr))
    up, down = new_sr // g, orig_sr // g

    taps = _kaiser_sinc_filter(up, down)
    n_taps = len(taps)
    half = (n_taps - 1) // 2

    x = jnp.asarray(x, dtype=dtype)
    batch_shape = x.shape[:-1]
    t_in = x.shape[-1]
    x2 = x.reshape((-1, 1, t_in))  # [N, C=1, W]

    t_out = -(-t_in * up // down)  # ceil

    # upfirdn: zero-stuff by `up` (lhs_dilation), FIR, take every `down`-th sample.
    # Align so output sample k corresponds to input time k * down / up (filter
    # centered). Right padding is computed EXACTLY to yield >= t_out strided
    # outputs — a fixed `half + down` undershoots by one sample whenever
    # up/down > 2 (e.g. 8 kHz -> 24 kHz), crashing the final reshape.
    dilated = (t_in - 1) * up + 1
    pad_r = max(down, (t_out - 1) * down + n_taps - dilated - half)
    kernel = jnp.asarray(taps[::-1].copy(), dtype=dtype).reshape((1, 1, n_taps))
    y = lax.conv_general_dilated(
        x2,
        kernel,
        window_strides=(down,),
        padding=[(half, pad_r)],
        lhs_dilation=(up,),
        dimension_numbers=("NCW", "IOW", "NCW"),
    )
    y = y[..., :t_out]
    return y.reshape(batch_shape + (t_out,))


def resample_np(x: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Host-side convenience wrapper (voice upload path — not jit)."""
    return np.asarray(resample(jnp.asarray(x, dtype=jnp.float32), orig_sr, new_sr))
