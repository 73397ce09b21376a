"""Golden tests for the DSP core (gonova_tts_tpu/audio/) against scipy/numpy references.

These pin the mel space used for all parity metrics (SURVEY.md §7 step 1), so they are
deliberately strict.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from gonova_tts_tpu.audio import (
    frame_signal,
    hann_window,
    istft,
    mel_filterbank,
    mel_spectrogram,
    resample,
    spectrogram,
    stft,
    stitch,
)
from gonova_tts_tpu.audio.mel import hz_to_mel, mel_to_hz, mcd, mel_mse
from gonova_tts_tpu.audio.resample import _kaiser_sinc_filter


def _noise(rng, n=24000):
    return rng.standard_normal(n).astype(np.float32) * 0.3


# ---------------------------------------------------------------- STFT


def test_hann_window_matches_scipy():
    np.testing.assert_allclose(
        hann_window(1024), scipy.signal.get_window("hann", 1024, fftbins=True), atol=1e-6
    )


def test_frame_count_is_t_over_hop(rng):
    x = _noise(rng, 2560)
    frames = frame_signal(jnp.asarray(x), n_fft=1024, hop_length=256)
    assert frames.shape == (10, 1024)


def test_stft_matches_numpy_reference(rng):
    """Independent numpy implementation of the same framing convention."""
    x = _noise(rng, 4096)
    n_fft, hop = 1024, 256
    pad = (n_fft - hop) // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    win = np.asarray(hann_window(n_fft), dtype=np.float64)
    n_frames = 1 + (len(xp) - n_fft) // hop
    ref = np.stack(
        [np.fft.rfft(xp[i * hop : i * hop + n_fft] * win) for i in range(n_frames)]
    )
    ours = np.asarray(stft(jnp.asarray(x), n_fft, hop, n_fft))
    assert ours.shape == ref.shape == (16, 513)
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_stft_batched(rng):
    x = rng.standard_normal((3, 2048)).astype(np.float32)
    s = spectrogram(jnp.asarray(x), 1024, 256, 1024)
    assert s.shape == (3, 8, 513)
    single = spectrogram(jnp.asarray(x[1]), 1024, 256, 1024)
    np.testing.assert_allclose(np.asarray(s[1]), np.asarray(single), atol=1e-5)


def test_istft_reconstruction(rng):
    x = _noise(rng, 4096)
    s = stft(jnp.asarray(x), 1024, 256, 1024)
    y = np.asarray(istft(s, 1024, 256, 1024, length=4096))
    # Edges lose energy to windowing; check the interior strictly.
    np.testing.assert_allclose(y[512:-512], x[512:-512], atol=1e-3)


# ---------------------------------------------------------------- mel


def test_mel_scale_roundtrip():
    f = np.array([0.0, 440.0, 1000.0, 4000.0, 11999.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f, htk=True), htk=True), f, rtol=1e-10)


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(24000, 1024, 80, 0.0, 12000.0)
    assert fb.shape == (513, 80)
    assert np.all(fb >= 0)
    # Every mel band has support; every frequency below fmax is covered by some band.
    assert np.all(fb.sum(axis=0) > 0)
    row_support = fb.sum(axis=1)
    assert np.all(row_support[2:-2] > 0)


def test_mel_filterbank_matches_independent_construction():
    """Independent in-test reimplementation of the slaney filterbank definition
    (linear below 1 kHz, log(6.4)/27 step above; triangles; 2/bandwidth norm)."""
    sr, n_fft, n_mels, fmin, fmax = 24000, 1024, 80, 0.0, 12000.0

    def to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        lin = f / (200.0 / 3)
        log_region = 15.0 + np.log(np.maximum(f, 1e-30) / 1000.0) / (np.log(6.4) / 27.0)
        return np.where(f >= 1000.0, log_region, lin)

    def to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        lin = m * (200.0 / 3)
        log_region = 1000.0 * np.exp((m - 15.0) * (np.log(6.4) / 27.0))
        return np.where(m >= 15.0, log_region, lin)

    mels = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    hz = to_hz(mels)
    freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    expected = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(n_mels):
        left, center, right = hz[m], hz[m + 1], hz[m + 2]
        rise = (freqs - left) / (center - left)
        fall = (right - freqs) / (right - center)
        tri = np.maximum(0.0, np.minimum(rise, fall))
        expected[m] = tri * 2.0 / (right - left)

    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax).T
    np.testing.assert_allclose(fb, expected, atol=1e-6)


def test_mel_spectrogram_shape(rng):
    x = rng.standard_normal((2, 24000 - 24000 % 256)).astype(np.float32)
    m = mel_spectrogram(jnp.asarray(x))
    assert m.shape == (2, x.shape[1] // 256, 80)
    assert np.all(np.isfinite(np.asarray(m)))


def test_mel_metrics_zero_on_identical(rng):
    x = jnp.asarray(rng.standard_normal((4, 80)).astype(np.float32))
    assert float(mel_mse(x, x)) == 0.0
    assert float(mcd(x, x)) == 0.0
    y = x + 0.1
    assert float(mel_mse(x, y)) > 0
    assert float(mcd(x, y)) > 0


# ---------------------------------------------------------------- resample


@pytest.mark.parametrize("orig,new", [(48000, 24000), (16000, 24000), (44100, 24000), (22050, 24000)])
def test_resample_matches_scipy_upfirdn(rng, orig, new):
    import math

    x = _noise(rng, orig // 2)  # 0.5 s
    g = math.gcd(orig, new)
    up, down = new // g, orig // g
    taps = _kaiser_sinc_filter(up, down)
    ref = scipy.signal.resample_poly(x.astype(np.float64), up, down, window=taps / up)
    ours = np.asarray(resample(jnp.asarray(x), orig, new))
    assert len(ours) == len(ref)
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_resample_identity(rng):
    x = _noise(rng, 1000)
    y = np.asarray(resample(jnp.asarray(x), 24000, 24000))
    np.testing.assert_allclose(y, x, atol=0)


def test_resample_preserves_tone_frequency(rng):
    sr_in, sr_out = 48000, 24000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), sr_in, sr_out))
    spec = np.abs(np.fft.rfft(y[1000:-1000] * np.hanning(len(y) - 2000)))
    freq = np.fft.rfftfreq(len(y) - 2000, 1 / sr_out)
    assert abs(freq[spec.argmax()] - 1000.0) < 5.0


# ---------------------------------------------------------------- stitch


def test_stitch_no_overlap():
    a, b = np.ones(100, np.float32), np.zeros(50, np.float32)
    out = stitch([a, b])
    assert len(out) == 150


def test_stitch_crossfade_constant_signal():
    """Equal-power crossfade of identical constant signals must stay constant."""
    a = np.ones(100, np.float32)
    out = stitch([a, a, a], overlap=20)
    assert len(out) == 300 - 40
    np.testing.assert_allclose(out, 1.0, atol=1e-6)


def test_stitch_empty():
    assert len(stitch([])) == 0
    assert len(stitch([np.zeros(0, np.float32)])) == 0


def test_stitch_short_clip_keeps_level():
    """Regression: when a clip is shorter than the requested overlap, the ramps
    must be recomputed at the shorter length — slicing the long ramps selected the
    near-zero tails of BOTH and the seam dipped to silence."""
    a = np.ones(1000, np.float32)
    short = np.ones(100, np.float32)
    out = stitch([a, short, a], overlap=500)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)


def test_resample_length_contract_all_ratios():
    """Regression: right padding undershot one output sample whenever
    up/down > 2 (8 kHz and 22.05 kHz references crashed the embed path)."""
    from gonova_tts_tpu.audio.resample import resample_np

    rng = np.random.default_rng(0)
    for orig, new, n in [(8000, 24000, 1000), (22050, 48000, 1234), (16000, 24000, 511)]:
        y = resample_np(rng.standard_normal(n).astype(np.float32), orig, new)
        assert len(y) == -(-n * new // orig), (orig, new, len(y))


def test_f0_tiny_lag_window_no_crash():
    """Regression: a lag-search window of width <= 2 crashed the vectorized
    parabolic interpolation with an IndexError."""
    from gonova_tts_tpu.audio.pitch import estimate_f0

    x = np.sin(2 * np.pi * 470 * np.arange(8000) / 8000).astype(np.float32)
    f0 = estimate_f0(x, sr=8000, fmin=450, fmax=500)
    assert np.isfinite(f0).all()


def test_mel_short_clip_no_reflect_crash():
    """Regression: clips shorter than the reflect pad crashed jnp.pad instead of
    returning the (near-empty) analysis."""
    import jax.numpy as jnp

    from gonova_tts_tpu.audio import mel_spectrogram

    m = np.asarray(mel_spectrogram(jnp.zeros((1, 100), jnp.float32)))
    assert np.isfinite(m).all()
