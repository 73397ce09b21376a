"""Training losses: acoustic (mel/duration/pitch), vocoder (multi-res STFT + GAN).

The reference contains no training code (SURVEY.md §1, §2.4); these implement the
standard FastPitch + HiFi-GAN objectives (PAPERS.md: HiFi-GAN §2.4: LSGAN adversarial
loss, feature matching, mel reconstruction) so the in-repo models can actually be
trained on TPU via gonova_tts_tpu/train/step.py.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp

from ..audio.stft import spectrogram


def masked_l1(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean |pred - target| over valid frames. mask: [B, T], inputs [B, T, C]."""
    m = mask[..., None]
    denom = jnp.maximum(jnp.sum(m) * pred.shape[-1], 1.0)
    return jnp.sum(jnp.abs(pred - target) * m) / denom


def masked_mse(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(((pred - target) ** 2) * mask) / denom


def duration_loss(log_dur_pred: jnp.ndarray, dur_target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """MSE in log domain (FastSpeech convention: target = log(d + 1))."""
    target = jnp.log(dur_target.astype(jnp.float32) + 1.0)
    return masked_mse(log_dur_pred, target, mask)


def acoustic_loss(
    outputs: Dict[str, jnp.ndarray],
    mel_target: jnp.ndarray,
    dur_target: jnp.ndarray,
    pitch_target: jnp.ndarray,
    token_mask: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    l_mel = masked_l1(outputs["mel"], mel_target, outputs["frame_mask"])
    l_dur = duration_loss(outputs["log_durations"], dur_target, token_mask)
    l_pitch = masked_mse(outputs["pitch"], pitch_target, token_mask)
    total = l_mel + 0.1 * l_dur + 0.1 * l_pitch
    return total, {"mel": l_mel, "dur": l_dur, "pitch": l_pitch}


# ---------------------------------------------------------------- vocoder losses

_MRSTFT_CONFIGS: Sequence[Tuple[int, int, int]] = ((512, 128, 512), (1024, 256, 1024), (2048, 512, 2048))


def multi_resolution_stft_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Sum of spectral-convergence + log-magnitude L1 over three STFT resolutions."""
    total = 0.0
    for n_fft, hop, win in _MRSTFT_CONFIGS:
        sp = spectrogram(pred, n_fft, hop, win)
        st = spectrogram(target, n_fft, hop, win)
        sc = jnp.linalg.norm(st - sp) / jnp.maximum(jnp.linalg.norm(st), 1e-6)
        lm = jnp.mean(jnp.abs(jnp.log(jnp.maximum(sp, 1e-5)) - jnp.log(jnp.maximum(st, 1e-5))))
        total = total + sc + lm
    return total / len(_MRSTFT_CONFIGS)


def mel_reconstruction_loss(
    wav_pred: jnp.ndarray,  # [B, T*hop]
    mel_target: jnp.ndarray,  # [B, T, n_mels] log-mel (the corpus/GT convention)
    frame_mask: jnp.ndarray,  # [B, T]
    cfg,
) -> jnp.ndarray:
    """L1 between log-mel(vocoded audio) and the target log-mel (HiFi-GAN's λ_mel
    term).  The multi-res STFT loss alone plateaus (linear-magnitude emphasis);
    this term optimizes exactly the metric the eval grades (tools/eval_checkpoint.py
    mel L1), pulling perceptual band energy into place."""
    from ..audio.mel import mel_spectrogram

    mel_pred = mel_spectrogram(
        wav_pred, sr=cfg.sample_rate, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
        win_length=cfg.win_length, n_mels=cfg.n_mels, fmin=cfg.fmin, fmax=cfg.fmax,
    )
    t = min(mel_pred.shape[-2], mel_target.shape[-2])
    return masked_l1(mel_pred[..., :t, :], mel_target[..., :t, :], frame_mask[..., :t])


def lsgan_discriminator_loss(real_outs: List, fake_outs: List) -> jnp.ndarray:
    """HiFi-GAN eq(1): (D(x)-1)^2 + D(G(s))^2, summed over sub-discriminators."""
    loss = 0.0
    for (real_logits, _), (fake_logits, _) in zip(real_outs, fake_outs):
        loss = loss + jnp.mean((real_logits - 1.0) ** 2) + jnp.mean(fake_logits**2)
    return loss


def lsgan_generator_loss(fake_outs: List) -> jnp.ndarray:
    """HiFi-GAN eq(2): (D(G(s))-1)^2."""
    loss = 0.0
    for fake_logits, _ in fake_outs:
        loss = loss + jnp.mean((fake_logits - 1.0) ** 2)
    return loss


def feature_matching_loss(real_outs: List, fake_outs: List) -> jnp.ndarray:
    """HiFi-GAN eq(3): L1 between real/fake intermediate discriminator features.

    SUM over (sub-discriminator × layer) terms, exactly as the paper/official
    repo define it — λ_fm=2 in the generator objective is calibrated against
    that sum. Normalizing by the ~30-term count here (the pre-round-3b bug)
    silently ran the generator with a ~25–30× weaker feature-matching term than
    the recipe both docstrings cite."""
    loss = 0.0
    for (_, real_feats), (_, fake_feats) in zip(real_outs, fake_outs):
        for rf, ff in zip(real_feats, fake_feats):
            loss = loss + jnp.mean(jnp.abs(rf - ff))
    return loss
