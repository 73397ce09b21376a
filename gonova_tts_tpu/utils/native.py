"""ctypes binding for the native audio runtime (native/audio_runtime.cpp).

Loads native/libaudio_runtime.so if present (build: `make -C native`); every entry
point has a numpy fallback so the framework runs without the native build.  The native
path removes the per-chunk numpy overhead on the service send/validate paths.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
        "libaudio_runtime.so",
    )
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.f32_to_i16.restype = ctypes.c_int64
        lib.i16_to_f32.restype = ctypes.c_int64
        lib.crossfade_join.restype = ctypes.c_int64
        lib.audio_stats.restype = None
        lib.declick.restype = None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def f32_to_i16(audio: np.ndarray) -> np.ndarray:
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    lib = _lib()
    if lib is None:
        return (np.clip(audio, -1.0, 1.0) * 32767.0).round().astype(np.int16)
    out = np.empty(audio.shape, np.int16)
    lib.f32_to_i16(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ctypes.c_int64(audio.size),
    )
    return out


def i16_to_f32(pcm: np.ndarray) -> np.ndarray:
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    lib = _lib()
    if lib is None:
        return pcm.astype(np.float32) / 32768.0
    out = np.empty(pcm.shape, np.float32)
    lib.i16_to_f32(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(pcm.size),
    )
    return out


def crossfade_join(a: np.ndarray, b: np.ndarray, overlap: int) -> np.ndarray:
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    overlap = int(min(overlap, len(a), len(b)))
    lib = _lib()
    if lib is None:
        from ..audio.ola import stitch

        return stitch([a, b], overlap=overlap)
    out = np.empty((len(a) + len(b) - overlap,), np.float32)
    n = lib.crossfade_join(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(a)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(b)),
        ctypes.c_int64(overlap),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if n < 0:
        raise ValueError("invalid crossfade arguments")
    return out


def audio_stats(audio: np.ndarray) -> Tuple[float, float]:
    """(mean_square_energy, peak_abs) — the voice-validation scan in one pass."""
    audio = np.ascontiguousarray(audio, np.float32)
    lib = _lib()
    if lib is None:
        if audio.size == 0:
            return 0.0, 0.0  # match the native scan (np.mean of empty is nan)
        return float(np.mean(np.square(audio))), float(np.max(np.abs(audio)))
    ms = ctypes.c_double()
    pk = ctypes.c_double()
    lib.audio_stats(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(audio.size),
        ctypes.byref(ms),
        ctypes.byref(pk),
    )
    return ms.value, pk.value


def declick(audio: np.ndarray, n_fade: int = 64) -> np.ndarray:
    """Half-Hann fade-in/out. Mutates in place WHEN the input is a writable
    contiguous float32 array (and returns it); otherwise operates on a copy and
    returns that — callers must use the return value. The writability check
    matters: np.frombuffer(bytes) arrays are read-only views of the underlying
    bytes object, and writing through the native pointer would silently corrupt
    every other reference to those bytes."""
    audio = np.require(audio, np.float32, ["C", "W"])
    lib = _lib()
    if lib is None:
        n_fade = min(n_fade, len(audio) // 2)
        if n_fade > 0:
            w = 0.5 - 0.5 * np.cos(np.pi * np.arange(n_fade) / n_fade)
            audio[:n_fade] *= w
            audio[-n_fade:] *= w[::-1]
        return audio
    lib.declick(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(audio.size),
        ctypes.c_int64(n_fade),
    )
    return audio
