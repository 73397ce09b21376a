"""NovaSpk — speaker encoder for one-shot voice cloning.

Reference WAV → log-mel → strided conv stack → masked mean+std pooling → L2-normalized
embedding.  This replaces the reference's conditioning-by-file-path scheme
(services/tts/core/synthesizer.py:344-350 passes `audio_prompt_path` to the external
model) with an explicit, cacheable embedding while keeping the WAV-in public API:
the voice manager still stores/validates WAVs (services/tts/core/voice_manager.py),
and the engine computes + caches the embedding per voice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import layers
from .layers import Params


def init(rng, cfg: ModelConfig, hidden: int = 256) -> Params:
    ks = jax.random.split(rng, 4)
    return {
        "c1": layers.conv1d_init(ks[0], cfg.n_mels, hidden, 5),
        "c2": layers.conv1d_init(ks[1], hidden, hidden, 5),
        "c3": layers.conv1d_init(ks[2], hidden, hidden, 3),
        "ln1": layers.layernorm_init(hidden),
        "ln2": layers.layernorm_init(hidden),
        "ln3": layers.layernorm_init(hidden),
        "out": layers.dense_init(ks[3], 2 * hidden, cfg.speaker_dim),
    }


def forward(
    params: Params,
    mel: jnp.ndarray,  # [B, T, n_mels]
    frame_mask: jnp.ndarray,  # [B, T] 1 = valid
    dtype=jnp.float32,
) -> jnp.ndarray:
    """→ [B, speaker_dim], L2-normalized."""
    h = mel.astype(dtype)
    mask = frame_mask.astype(dtype)
    for conv, ln in (
        (params["c1"], params["ln1"]),
        (params["c2"], params["ln2"]),
        (params["c3"], params["ln3"]),
    ):
        h = layers.conv1d(conv, h * mask[..., None], stride=2, dtype=dtype)
        h = layers.layernorm(ln, jax.nn.relu(h))
        # Pool the mask at the same stride (any source frame valid → output valid).
        t2 = h.shape[1]
        mask = mask[:, : t2 * 2 : 2]

    m = mask[..., None]
    denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    mean = jnp.sum(h * m, axis=1) / denom
    var = jnp.sum(((h - mean[:, None, :]) ** 2) * m, axis=1) / denom
    std = jnp.sqrt(jnp.maximum(var, 1e-6))
    pooled = jnp.concatenate([mean, std], axis=-1)  # [B, 2H]
    emb = layers.dense(params["out"], pooled, dtype).astype(jnp.float32)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-6)
