"""WAV codec round-trip and format-matrix tests (gonova_tts_tpu/utils/wavio.py)."""

import io
import struct

import numpy as np
import pytest

from gonova_tts_tpu.utils import wavio


def make_sine(sr=24000, secs=0.5, freq=440.0):
    t = np.arange(int(sr * secs)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_roundtrip_float32():
    x = make_sine()
    data = wavio.write_wav(None, x, 24000, dtype="float32")
    y, sr = wavio.read_wav(data)
    assert sr == 24000
    np.testing.assert_allclose(y, x, atol=1e-7)


def test_roundtrip_int16():
    x = make_sine()
    data = wavio.write_wav(None, x, 16000, dtype="int16")
    y, sr = wavio.read_wav(data)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1.0 / 32767)


def test_roundtrip_stereo():
    x = np.stack([make_sine(), make_sine(freq=220.0)], axis=1)
    data = wavio.write_wav(None, x, 44100, dtype="int16")
    y, sr = wavio.read_wav(data)
    assert y.shape == x.shape
    assert sr == 44100


def test_stdlib_wave_interop(tmp_path):
    """Our int16 output must be readable by the stdlib wave module and vice versa."""
    import wave

    x = make_sine(sr=8000)
    path = str(tmp_path / "a.wav")
    wavio.write_wav(path, x, 8000, dtype="int16")
    with wave.open(path) as w:
        assert w.getframerate() == 8000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        raw = w.readframes(w.getnframes())
    ours, _ = wavio.read_wav(path)
    theirs = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    # write scale is 32767 on write, 32768 on read: match against raw bytes directly
    np.testing.assert_allclose(ours, theirs, atol=0)


def test_pcm24():
    # Hand-assemble a 24-bit PCM file.
    samples = np.array([0, 1 << 22, -(1 << 22), (1 << 23) - 1], dtype=np.int64)
    payload = b"".join(struct.pack("<i", int(s))[:3] for s in samples)
    header = (
        b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 48000, 48000 * 3, 3, 24)
        + b"data" + struct.pack("<I", len(payload))
    )
    y, sr = wavio.read_wav(header + payload)
    assert sr == 48000
    np.testing.assert_allclose(y, samples / 8388608.0, atol=1e-12)


def test_reject_garbage():
    with pytest.raises(wavio.WavError):
        wavio.read_wav(b"not a wav file at all")
    with pytest.raises(wavio.WavError):
        wavio.read_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data


def test_write_to_buffer():
    buf = io.BytesIO()
    x = make_sine()
    wavio.write_wav(buf, x, 24000)
    y, sr = wavio.read_wav(buf.getvalue())
    assert sr == 24000 and len(y) == len(x)


def test_reads_reference_default_voice():
    """The reference's default voice asset must decode (16-bit PCM, 48 kHz, mono)."""
    import os

    path = "/root/reference/services/tts/voices/urek.wav"
    if not os.path.exists(path):
        pytest.skip("reference asset not mounted")
    y, sr = wavio.read_wav(path)
    assert sr == 48000
    assert y.ndim == 1
    assert 16.0 < len(y) / sr < 17.5


def test_malformed_wavs_raise_waverror_not_raw_exceptions():
    """Regression: truncated fmt chunks raised struct.error and sample_rate=0
    parsed fine (dividing by zero downstream) — all must be WavError so the
    voice-registration handler classifies them as invalid payloads."""
    import struct

    import pytest

    from gonova_tts_tpu.utils.wavio import WavError, read_wav

    truncated_fmt = (
        b"RIFF" + struct.pack("<I", 100) + b"WAVE" + b"fmt " + struct.pack("<I", 16) + b"\x01\x00"
    )
    with pytest.raises(WavError):
        read_wav(truncated_fmt)

    fmt0 = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    sr_zero = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt0
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(WavError):
        read_wav(sr_zero)

    # Odd-length 16-bit data (truncated upload): trimmed to whole samples, no crash.
    fmt = struct.pack("<HHIIHH", 1, 1, 24000, 48000, 2, 16)
    odd = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 3) + b"\x00" * 3
    )
    audio, sr = read_wav(odd)
    assert sr == 24000 and len(audio) == 1


def test_write_wav_rejects_riff_overflow_cleanly():
    """Regression: size-field overflow escaped as a bare struct.error (and only
    after materializing the payload); it must be a WavError with limits named."""
    import numpy as np
    import pytest

    from gonova_tts_tpu.utils.wavio import WavError, write_wav

    with pytest.raises(WavError, match="65535 channels|WAV limits"):
        write_wav(None, np.zeros((4, 70000), np.float32), 24000)
