"""The combined TTS pipeline: acoustic + vocoder + speaker encoder as one param bundle.

This is the unit the engine jit-compiles per (batch, token-bucket) shape, and the unit
checkpoints save/restore.  `synthesize` is the flagship jittable function:
tokens → mel → waveform in one XLA graph (no host round-trip between the stages).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import acoustic, aligner as aligner_mod, speaker, vocoder, vocoder_folded, vocos
from .layers import Params


def _vocoder_mod(cfg: ModelConfig):
    if cfg.vocoder_family == "vocos":
        return vocos
    if cfg.vocoder_family == "hifigan":
        return vocoder
    raise ValueError(f"unknown vocoder_family {cfg.vocoder_family!r}")


def hifigan_forward_fn(cfg: ModelConfig):
    """SINGLE source of truth for the HiFi-GAN folded-vs-plain routing — used by
    both the pipeline (_vocoder_forward) and the registry's 'novagan' family, so
    the rule can never drift between the two."""
    return vocoder_folded.forward if cfg.hifigan_folded else vocoder.forward


def _vocoder_forward(cfg: ModelConfig):
    """Forward fn for the configured family; hifigan routes through the lane-folded
    layout (vocoder_folded.py — numerically identical, MXU-shaped) unless disabled."""
    if cfg.vocoder_family == "hifigan":
        return hifigan_forward_fn(cfg)
    return _vocoder_mod(cfg).forward


def init(rng, cfg: ModelConfig, with_aligner: bool = False) -> Params:
    """with_aligner=True adds the MAS aligner subtree (training from raw
    (text, audio) pairs — models/aligner.py); serving never loads it."""
    ka, kv, ks, kal = jax.random.split(rng, 4)
    params = {
        "acoustic": acoustic.init(ka, cfg),
        "vocoder": _vocoder_mod(cfg).init(kv, cfg),
        "speaker": speaker.init(ks, cfg),
    }
    if with_aligner:
        params["aligner"] = aligner_mod.init(kal, cfg)
    return params


def synthesize(
    params: Params,
    tokens: jnp.ndarray,  # [B, L] int32
    token_mask: jnp.ndarray,  # [B, L]
    spk_embedding: jnp.ndarray,  # [B, speaker_dim]
    exaggeration: jnp.ndarray,  # [B]
    cfg: ModelConfig,
    dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """Full pipeline forward. Returns audio [B, T_frames * hop], sample mask, mel, frames."""
    ac = acoustic.forward(
        params["acoustic"], tokens, token_mask, spk_embedding, exaggeration, cfg, dtype=dtype
    )
    wav = _vocoder_forward(cfg)(params["vocoder"], ac["mel"], cfg, dtype=dtype)  # [B, T*hop]
    hop = cfg.hop_length
    total_samples = ac["total_frames"] * hop
    sample_mask = (
        jnp.arange(wav.shape[-1])[None, :] < total_samples[:, None]
    )
    return {
        "audio": wav * sample_mask.astype(wav.dtype),
        "sample_mask": sample_mask,
        "total_samples": total_samples,
        "mel": ac["mel"],
        "frame_mask": ac["frame_mask"],
        "total_frames": ac["total_frames"],
        "durations": ac["durations"],
    }


def embed_speaker(
    params: Params, mel: jnp.ndarray, frame_mask: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    return speaker.forward(params["speaker"], mel, frame_mask, dtype=dtype)


def vocode(
    params: Params, mel: jnp.ndarray, cfg: ModelConfig, dtype=jnp.float32
) -> jnp.ndarray:
    return _vocoder_forward(cfg)(params["vocoder"], mel, cfg, dtype=dtype)


def encode_acoustic(
    params: Params,
    tokens: jnp.ndarray,
    token_mask: jnp.ndarray,
    spk_embedding: jnp.ndarray,
    exaggeration: jnp.ndarray,
    cfg: ModelConfig,
    dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """Token-domain half (acoustic.encode): everything that does not depend on the
    frame count. The engine's two-stage path runs this, reads back total_frames,
    then dispatches decode_vocode at a right-sized frame bucket."""
    return acoustic.encode(
        params["acoustic"], tokens, token_mask, spk_embedding, exaggeration, cfg, dtype=dtype
    )


def decode_vocode(
    params: Params,
    enc: jnp.ndarray,  # [B, L, D] from encode_acoustic
    spk: jnp.ndarray,  # [B, D] from encode_acoustic
    durations: jnp.ndarray,  # [B, L] int32 from encode_acoustic
    token_mask: jnp.ndarray,  # [B, L]
    max_frames: int,
    cfg: ModelConfig,
    dtype=jnp.float32,
    local_attention_from: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Frame-domain half: length regulate + decoder + vocoder at `max_frames`.
    Audio below each sequence's total_samples equals the one-graph synthesize()
    result to within one int16 PCM step whenever max_frames covers the batch and
    local_attention_from is the one-graph frame count (pinned in
    tests/test_engine.py; the two modes are different XLA programs, so fusion may
    differ in final-ULP f32 rounding — the math is identical)."""
    d = acoustic.decode(
        params["acoustic"], enc, spk, durations, token_mask, max_frames, cfg,
        dtype=dtype, local_attention_from=local_attention_from or None,
    )
    wav = _vocoder_forward(cfg)(params["vocoder"], d["mel"], cfg, dtype=dtype)
    total_samples = d["total_frames"] * cfg.hop_length
    sample_mask = jnp.arange(wav.shape[-1])[None, :] < total_samples[:, None]
    return {
        "audio": wav * sample_mask.astype(wav.dtype),
        "total_samples": total_samples,
        "total_frames": d["total_frames"],
    }


def acoustic_mel(
    params: Params,
    tokens: jnp.ndarray,
    token_mask: jnp.ndarray,
    spk_embedding: jnp.ndarray,
    exaggeration: jnp.ndarray,
    cfg: ModelConfig,
    dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """Acoustic stage only (used by the streaming engine: mel first, then chunked vocode)."""
    return acoustic.forward(
        params["acoustic"], tokens, token_mask, spk_embedding, exaggeration, cfg, dtype=dtype
    )
