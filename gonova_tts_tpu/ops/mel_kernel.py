"""Fused log-mel feature kernel (Pallas/TPU): frame → window → DFT → mel → log.

The pure-JAX path (gonova_tts_tpu/audio/mel.py) materializes the [frames, n_fft] frame
matrix and the [frames, n_bins] spectrum in HBM between ops.  This kernel DMAs one
block of audio into VMEM, builds the overlapped frame matrix in-register via static
hop-row slicing (requires n_fft % hop == 0, true for 1024/256), and runs the whole
chain — window (VPU), two real-DFT matmuls (MXU), squared magnitude (VPU), mel
projection (MXU), log (VPU) — before writing only the [block, n_mels] mel block back.
HBM traffic: audio in (overlap re-read is (r-1)/block ≈ 2%), mel out. ~17× less than
the unfused chain's intermediate traffic.

Audio stays in HBM (`memory_space=ANY`) because consecutive frame blocks overlap by
n_fft - hop samples — BlockSpec index maps can only express disjoint block tilings, so
the kernel issues its own `make_async_copy` per grid step (pallas_guide: Async DMA).

allclose-tested against the pure-JAX oracle in tests/test_kernels.py (interpret mode on
CPU; compiled on TPU).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..audio.mel import mel_filterbank
from ..audio.stft import dft_bases, hann_window

FRAME_BLOCK = 128  # frames per grid step (MXU-aligned)


_ROW_PAD = 8  # extra hop-rows per DMA so slice lengths stay sublane-aligned (Mosaic)


def _mel_kernel(
    rows_ref,  # [B, n_rows_total, hop] in HBM/ANY (audio as non-overlapping hop rows)
    wcos_ref,  # [n_fft, n_bins] VMEM — window ⊙ cos basis (host-folded)
    wsin_ref,  # [n_fft, n_bins] VMEM — window ⊙ sin basis
    fb_ref,  # [n_bins, n_mels] VMEM
    out_ref,  # [1, FRAME_BLOCK, n_mels] VMEM block
    *,
    n_fft: int,
    hop: int,
    eps: float,
):
    b_idx = pl.program_id(0)
    blk_idx = pl.program_id(1)
    r = n_fft // hop  # frame span in hop-rows
    read_rows = FRAME_BLOCK + _ROW_PAD  # >= FRAME_BLOCK + r - 1, 8-aligned

    def body(scratch, sem):
        dma = pltpu.make_async_copy(
            rows_ref.at[b_idx, pl.ds(blk_idx * FRAME_BLOCK, read_rows), :],
            scratch,
            sem,
        )
        dma.start()
        dma.wait()
        rows = scratch[:]  # [read_rows, hop]
        # Overlapped framed DFT without materializing the frame matrix (Mosaic cannot
        # concat differently-offset slices): with the window folded into the bases,
        #   (frame_i ⊙ w) @ cos  ==  Σ_k rows[i+k] @ wcos[k*hop:(k+1)*hop]
        # — r row-shifted matmuls accumulated in f32 on the MXU.
        real = jnp.zeros((FRAME_BLOCK, wcos_ref.shape[1]), jnp.float32)
        imag = jnp.zeros((FRAME_BLOCK, wcos_ref.shape[1]), jnp.float32)
        for k in range(r):
            seg = rows[k : k + FRAME_BLOCK, :]
            real = real + jnp.dot(
                seg, wcos_ref[k * hop : (k + 1) * hop, :],
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )
            imag = imag + jnp.dot(
                seg, wsin_ref[k * hop : (k + 1) * hop, :],
                preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
            )
        mag = jnp.sqrt(jnp.maximum(real * real + imag * imag, 1e-9))
        mel = jnp.dot(
            mag, fb_ref[:, :],
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        out_ref[0, :, :] = jnp.log(jnp.maximum(mel, eps))

    pl.run_scoped(
        body,
        pltpu.VMEM((read_rows, hop), jnp.float32),
        pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(
    jax.jit,
    static_argnames=("sr", "n_fft", "hop_length", "win_length", "n_mels", "fmin", "fmax", "interpret"),
)
def mel_spectrogram_pallas(
    x: jnp.ndarray,
    sr: int = 24000,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: Optional[float] = 12000.0,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, T] audio (T % hop == 0) → [B, T // hop, n_mels] log-mel, fused on TPU."""
    if n_fft % hop_length != 0:
        raise ValueError("fused mel kernel requires n_fft % hop_length == 0")
    if n_fft // hop_length - 1 > _ROW_PAD:
        # The fixed _ROW_PAD row overhang only covers n_fft/hop <= _ROW_PAD + 1
        # (each frame spans r hop-rows; a block must read FRAME_BLOCK + r - 1).
        # Valid-but-unsupported framings (e.g. n_fft=1024, hop=64) fall back to
        # the XLA mel rather than crash at trace time with a shape error.
        from ..audio.mel import mel_spectrogram

        return mel_spectrogram(
            x, sr=sr, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
            n_mels=n_mels, fmin=fmin, fmax=fmax,
        )
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    b, t = x.shape
    n_frames = t // hop_length
    pad = (n_fft - hop_length) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")

    n_blocks = -(-n_frames // FRAME_BLOCK)
    # Right-pad so every block (incl. its aligned row overhang) is in range, then lay
    # the audio out as non-overlapping hop-rows: [B, n_rows_total, hop]. (2-D scratch
    # DMA — Mosaic rejects 1-D→2-D reshapes of VMEM scratch.)
    target = (n_blocks * FRAME_BLOCK + _ROW_PAD) * hop_length
    xp = jnp.pad(xp, ((0, 0), (0, max(0, target - xp.shape[1]))))
    xp = xp[:, : target].reshape(b, target // hop_length, hop_length)

    import numpy as _np

    window = _np.asarray(hann_window(win_length), _np.float64)
    if win_length < n_fft:
        lp = (n_fft - win_length) // 2
        window = _np.pad(window, (lp, n_fft - win_length - lp))
    cos_b, sin_b = dft_bases(n_fft)
    wcos = (window[:, None] * _np.asarray(cos_b, _np.float64)).astype(_np.float32)
    wsin = (window[:, None] * _np.asarray(sin_b, _np.float64)).astype(_np.float32)
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)

    out = pl.pallas_call(
        functools.partial(_mel_kernel, n_fft=n_fft, hop=hop_length, eps=eps),
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # audio stays in HBM; kernel DMAs
            pl.BlockSpec(
                (n_fft, n_fft // 2 + 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_fft, n_fft // 2 + 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_fft // 2 + 1, n_mels), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, FRAME_BLOCK, n_mels), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_blocks * FRAME_BLOCK, n_mels), jnp.float32),
        interpret=interpret,
    )(xp, jnp.asarray(wcos), jnp.asarray(wsin), jnp.asarray(fb))
    out = out[:, :n_frames, :]
    return out[0] if squeeze else out
