"""Native audio runtime tests: the C++ path (when built) must match the numpy
fallback exactly; the fallback itself is the behavioral spec."""

import numpy as np
import pytest

from gonova_tts_tpu.utils import native


def test_f32_i16_roundtrip(rng):
    x = np.clip(rng.standard_normal(10000) * 0.3, -1.0, 1.0).astype(np.float32)
    i16 = native.f32_to_i16(x)
    back = native.i16_to_f32(i16)
    assert i16.dtype == np.int16 and back.dtype == np.float32
    # Scale mismatch (write 32767, read /32768) + quantization → ~2/32768 bound.
    np.testing.assert_allclose(back, x, atol=2.0 / 32768)


def test_f32_to_i16_clips():
    x = np.asarray([2.0, -2.0, 0.0], np.float32)
    i16 = native.f32_to_i16(x)
    assert i16[0] == 32767 and i16[1] == -32767 and i16[2] == 0


def test_crossfade_join_constant():
    a = np.ones(100, np.float32)
    out = native.crossfade_join(a, a, 20)
    assert len(out) == 180
    np.testing.assert_allclose(out, 1.0, atol=1e-5)


def test_crossfade_join_matches_stitch(rng):
    from gonova_tts_tpu.audio import stitch

    a = rng.standard_normal(500).astype(np.float32)
    b = rng.standard_normal(300).astype(np.float32)
    ours = native.crossfade_join(a, b, 64)
    ref = stitch([a, b], overlap=64)
    assert len(ours) == len(ref)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_audio_stats(rng):
    x = (rng.standard_normal(48000) * 0.3).astype(np.float32)
    ms, pk = native.audio_stats(x)
    assert ms == pytest.approx(float(np.mean(np.square(x))), rel=1e-5)
    assert pk == pytest.approx(float(np.max(np.abs(x))), rel=1e-6)


def test_audio_stats_empty():
    ms, pk = native.audio_stats(np.zeros(0, np.float32))
    assert ms == 0.0 and pk == 0.0


def test_declick_fades_edges():
    x = native.declick(np.ones(1000, np.float32), 64)
    assert x[0] == 0.0
    assert abs(x[-1]) < 1e-6 or x[-1] == 0.0
    assert x[500] == 1.0


def test_native_matches_fallback_when_built(rng):
    """If the .so is built, force the fallback and compare against native output."""
    if not native.native_available():
        pytest.skip("native library not built")
    x = (rng.standard_normal(5000) * 0.7).astype(np.float32)
    got = native.f32_to_i16(x)
    lib, native._LIB = native._LIB, None
    try:
        want = native.f32_to_i16(x)
    finally:
        native._LIB = lib
    # lrintf vs numpy round: allow off-by-one on exact .5 boundaries.
    assert np.abs(got.astype(np.int32) - want.astype(np.int32)).max() <= 1


def test_crossfade_overlap_one_matches_python(rng):
    """Regression: the C++ overlap==1 case output b[0] while the numpy paths
    output a[-1] — native and fallback must agree sample-for-sample."""
    from gonova_tts_tpu.audio.ola import stitch

    a = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    nat = native.crossfade_join(a, b, 1)
    ref = stitch([a, b], overlap=1)
    np.testing.assert_allclose(nat, ref, atol=1e-6)


def test_audio_stats_empty_matches_native():
    assert native.audio_stats(np.zeros(0, np.float32)) == (0.0, 0.0)
