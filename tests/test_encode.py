"""Audio encoding tests (audio/encode.py): WAV/PCM framing exactness, MP3 via
libmp3lame (structural + bitrate sanity), Ogg Opus via libopus (full round-trip
decode with libopus's own decoder — the strongest correctness check available
without shipping a parser).

Implements the reference's promised `encoding:` config section
(reference services/tts/README.md:296-300)."""

from __future__ import annotations

import ctypes
import struct

import numpy as np
import pytest

from gonova_tts_tpu.audio import encode as enc


def tone(sr: int, seconds: float = 0.5, hz: float = 440.0) -> np.ndarray:
    t = np.arange(int(sr * seconds), dtype=np.float32) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


# --------------------------------------------------------------------- pcm/wav


def test_available_formats_always_include_raw():
    fmts = enc.available_formats()
    assert "pcm" in fmts and "wav" in fmts


def test_pcm_encoder_is_identity():
    e = enc.make_encoder("pcm", 24000)
    x = tone(24000, 0.1)
    assert e.encode(x) == x.tobytes()
    assert e.flush() == b""


def test_wav_stream_header_and_pcm16():
    e = enc.make_encoder("wav", 24000)
    x = tone(24000, 0.25)
    out = e.encode(x[: len(x) // 2]) + e.encode(x[len(x) // 2 :]) + e.flush()
    assert out[:4] == b"RIFF" and out[8:16] == b"WAVEfmt "
    fmt_size, audio_fmt, channels, sr, byte_rate, block, bits = struct.unpack(
        "<IHHIIHH", out[16:36]
    )
    assert (audio_fmt, channels, sr, bits) == (1, 1, 24000, 16)
    assert out[36:40] == b"data"
    pcm = np.frombuffer(out[44:], np.int16)
    assert len(pcm) == len(x)
    ref = np.clip(x * 32767.0, -32767.0, 32767.0).astype(np.int16)
    np.testing.assert_array_equal(pcm, ref)


def test_unknown_format_raises():
    with pytest.raises(enc.EncoderUnavailable, match="supported"):
        enc.make_encoder("flac", 24000)


def test_available_formats_sample_rate_aware():
    """ADVICE r3 (medium): admission must drop formats whose codec rejects the
    model's rate — opus accepts only 8/12/16/24/48 kHz, so at 22050 Hz it must
    vanish from the supported list even when libopus is present."""
    fmts_22k = enc.available_formats(22050)
    assert "opus" not in fmts_22k
    assert "pcm" in fmts_22k and "wav" in fmts_22k
    if "opus" in enc.available_formats():
        assert "opus" in enc.available_formats(24000)
        assert enc.probe_format("opus", 24000) is None
        assert "unsupported sample rate" in enc.probe_format("opus", 22050)


def test_probe_format_matches_make_encoder():
    for fmt in enc.available_formats(24000):
        assert enc.probe_format(fmt, 24000) is None
    assert enc.probe_format("flac", 24000) is not None


def test_ogg_crc_table_built_at_import():
    """The lazy-init race fix: the table must be complete before any encode."""
    assert len(enc._OGG_CRC_TABLE) == 256
    assert enc._OGG_CRC_TABLE[0] == 0
    assert all(isinstance(v, int) for v in enc._OGG_CRC_TABLE)


# ------------------------------------------------------------------------- mp3

mp3_available = pytest.mark.skipif(
    "mp3" not in enc.available_formats(), reason="libmp3lame not on this host"
)


@mp3_available
def test_mp3_stream_structure_and_bitrate():
    sr, kbps = 24000, 192
    e = enc.make_encoder("mp3", sr, mp3_bitrate=kbps)
    x = tone(sr, 1.0)
    chunks = [e.encode(c) for c in np.array_split(x, 7)]
    out = b"".join(chunks) + e.flush()
    # Frame sync: LAME output starts with an MPEG frame header (0xFFE sync) or an
    # ID3/Xing info tag frame which itself starts with the sync.
    assert out[0] == 0xFF and (out[1] & 0xE0) == 0xE0, out[:4].hex()
    # CBR sanity: 1 s at 192 kbps ≈ 24000 bytes (±35% for padding + info frame).
    assert 0.65 * kbps * 1000 / 8 < len(out) < 1.35 * kbps * 1000 / 8 + 2000


@mp3_available
def test_mp3_streaming_equals_one_shot():
    """Feeding chunk-by-chunk must produce the same bytes as one call — the
    encoder is stateful across chunk boundaries (WS streaming correctness)."""
    sr = 24000
    x = tone(sr, 0.7, 313.0)
    e1 = enc.make_encoder("mp3", sr)
    one = e1.encode(x) + e1.flush()
    e2 = enc.make_encoder("mp3", sr)
    parts = [e2.encode(c) for c in np.array_split(x, 11)]
    many = b"".join(parts) + e2.flush()
    assert one == many


# ------------------------------------------------------------------------ opus

opus_available = pytest.mark.skipif(
    "opus" not in enc.available_formats(), reason="libopus not on this host"
)


def _parse_ogg_packets(data: bytes):
    """Minimal Ogg reader for the muxer's 1-packet-per-page output; verifies the
    page CRCs with an independent recomputation."""
    packets, off = [], 0
    granules = []
    while off < len(data):
        assert data[off : off + 4] == b"OggS", f"bad capture at {off}"
        header = data[off : off + 27]
        _, _, htype, granule, serial, seq, crc, nseg = struct.unpack(
            "<4sBBqIIIB", header
        )
        lacing = data[off + 27 : off + 27 + nseg]
        plen = sum(lacing)
        payload = data[off + 27 + nseg : off + 27 + nseg + plen]
        page = bytearray(header + lacing + payload)
        page[22:26] = b"\x00\x00\x00\x00"
        assert enc._ogg_crc(bytes(page)) == crc, "page CRC mismatch"
        packets.append(payload)
        granules.append(granule)
        off += 27 + nseg + plen
    return packets, granules


@opus_available
def test_opus_ogg_structure():
    sr = 24000
    e = enc.make_encoder("opus", sr, opus_bitrate=64)
    x = tone(sr, 0.5)
    out = e.encode(x) + e.flush()
    packets, granules = _parse_ogg_packets(out)
    assert packets[0][:8] == b"OpusHead"
    ver, ch, preskip, in_sr, gain, mapping = struct.unpack("<BBHIhB", packets[0][8:19])
    assert (ver, ch, in_sr, mapping) == (1, 1, sr, 0)
    assert packets[1][:8] == b"OpusTags"
    # Final granule = preskip + true sample count in 48 kHz units (RFC 7845 §4.5).
    assert granules[-1] == preskip + len(x) * (48000 // sr)


@opus_available
def test_opus_round_trip_decode():
    """Decode the Ogg Opus stream with libopus's decoder: sample count must match
    exactly after pre-skip/end trimming, and the decoded tone must correlate with
    the input (codec is lossy; r > 0.9 at 64 kbps is comfortable)."""
    lib = enc._get_opus()
    sr = 24000
    x = tone(sr, 0.5, 440.0)
    e = enc.make_encoder("opus", sr, opus_bitrate=64)
    out = e.encode(x) + e.flush()
    packets, granules = _parse_ogg_packets(out)
    head = packets[0]
    preskip48 = struct.unpack("<H", head[10:12])[0]

    lib.opus_decoder_create.restype = ctypes.c_void_p
    lib.opus_decoder_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    lib.opus_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    err = ctypes.c_int(0)
    dec = lib.opus_decoder_create(sr, 1, ctypes.byref(err))
    assert err.value == 0
    frame = sr * enc.OpusEncoder.FRAME_MS // 1000
    pcm = []
    for pkt in packets[2:]:
        if not pkt:
            continue  # EOS marker page
        buf = np.zeros((frame * 3,), np.int16)
        n = lib.opus_decode(dec, pkt, len(pkt), buf.ctypes.data_as(ctypes.c_void_p), len(buf), 0)
        assert n > 0
        pcm.append(buf[:n].copy())
    lib.opus_decoder_destroy.argtypes = [ctypes.c_void_p]
    lib.opus_decoder_destroy(dec)
    y = np.concatenate(pcm).astype(np.float32) / 32767.0
    # Trim pre-skip and end padding (granule bookkeeping → exact length).
    preskip = preskip48 // (48000 // sr)
    true_len = (granules[-1] - preskip48) // (48000 // sr)
    y = y[preskip : preskip + true_len]
    assert len(y) == len(x)
    # Correlation over the steady-state middle (skip codec warmup edges).
    a, b = x[2000:-2000], y[2000:-2000]
    r = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert r > 0.9, f"round-trip correlation {r}"


@opus_available
@pytest.mark.parametrize("n", [12479, 12240, 12000, 479, 200])
def test_opus_eos_granule_never_exceeds_decodable(n):
    """Regression: a final partial frame longer than (frame - preskip) used to
    push the EOS granule past the decodable total, violating RFC 7845 §4.5 and
    losing trailing audio. The encoder must pad with fully-trimmed silence
    frames so every granule stays <= cumulative decoded samples and the exact
    sample count round-trips."""
    lib = enc._get_opus()
    sr = 24000
    rng = np.random.default_rng(n)
    x = (rng.standard_normal(n) * 0.1).astype(np.float32)
    e = enc.make_encoder("opus", sr, opus_bitrate=64)
    out = e.encode(x) + e.flush()
    packets, granules = _parse_ogg_packets(out)
    preskip48 = struct.unpack("<H", packets[0][10:12])[0]

    lib.opus_decoder_create.restype = ctypes.c_void_p
    lib.opus_decoder_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    lib.opus_decode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    err = ctypes.c_int(0)
    dec = lib.opus_decoder_create(sr, 1, ctypes.byref(err))
    assert err.value == 0
    frame = sr * enc.OpusEncoder.FRAME_MS // 1000
    decoded48 = 0
    for pkt, g in zip(packets[2:], granules[2:]):
        buf = np.zeros((frame * 3,), np.int16)
        m = lib.opus_decode(dec, pkt, len(pkt), buf.ctypes.data_as(ctypes.c_void_p), len(buf), 0)
        assert m > 0
        decoded48 += m * (48000 // sr)
        assert g <= decoded48, f"granule {g} exceeds decoded total {decoded48}"
    lib.opus_decoder_destroy.argtypes = [ctypes.c_void_p]
    lib.opus_decoder_destroy(dec)
    # Exact length recovery from the EOS granule.
    assert granules[-1] == preskip48 + n * (48000 // sr)
    assert (granules[-1] - preskip48) // (48000 // sr) == n
    # Monotone non-decreasing granules (Ogg requirement).
    assert all(b >= a for a, b in zip(granules, granules[1:]))


@opus_available
def test_opus_empty_stream_valid():
    """Zero input still yields a spec-valid stream: headers + one fully-trimmed
    silence frame (packets must not be empty; the EOS granule trims it away)."""
    e = enc.make_encoder("opus", 24000)
    out = e.flush()
    packets, granules = _parse_ogg_packets(out)
    assert packets[0][:8] == b"OpusHead" and packets[1][:8] == b"OpusTags"
    assert len(packets) == 3 and len(packets[2]) > 0
    preskip48 = struct.unpack("<H", packets[0][10:12])[0]
    assert granules[-1] == preskip48  # true end = 0 samples


def test_encode_after_flush_raises_not_segfaults():
    """Regression: encode() after flush() passed a NULL codec handle into the C
    library — SIGSEGV instead of a catchable error."""
    for fmt in ("mp3", "opus"):
        if fmt not in enc.available_formats():
            continue
        e = enc.make_encoder(fmt, 24000)
        e.encode(tone(24000, 0.1))
        e.flush()
        with pytest.raises(RuntimeError):
            e.encode(tone(24000, 0.1))


@opus_available
def test_opus_encode_does_not_alias_caller_buffer():
    """Regression: a contiguous int16 input was adopted by reference; a caller
    refilling its chunk buffer corrupted samples queued for the next frame."""
    e = enc.make_encoder("opus", 24000)
    buf = (np.sin(np.arange(100) / 10.0) * 1000).astype(np.int16)  # < frame: queued
    e.encode(buf)
    assert not np.shares_memory(e._buf, buf)
    queued = e._buf.copy()
    buf[:] = 0  # caller reuses its buffer
    np.testing.assert_array_equal(e._buf, queued)
    e.flush()
