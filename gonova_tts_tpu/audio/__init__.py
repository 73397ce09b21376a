"""DSP ops: STFT/iSTFT, mel features, resampling, overlap-add (pure JAX)."""

from .mel import mcd, mel_filterbank, mel_mse, mel_spectrogram
from .ola import crossfade_pair, hann_fade, stitch
from .resample import resample, resample_np
from .stft import frame_signal, hann_window, istft, spectrogram, stft, stft_ri

__all__ = [
    "mcd",
    "mel_filterbank",
    "mel_mse",
    "mel_spectrogram",
    "crossfade_pair",
    "hann_fade",
    "stitch",
    "resample",
    "resample_np",
    "frame_signal",
    "hann_window",
    "istft",
    "spectrogram",
    "stft",
    "stft_ri",
]
