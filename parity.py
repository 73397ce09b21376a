"""Parity harness: bf16 fused-path audio vs f32 reference-path audio, in mel space.

BASELINE.md's third metric: "bit-comparable mels (mel MSE / MCD) vs the reference CPU
path".  The reference CPU path here is this framework's own f32 pipeline (the
reference repo's model is an external download we don't ship); the candidate is the
bf16 compute path the TPU engine actually serves.  Run on any backend:

  python parity.py            # prints one JSON line with mel_mse / mcd_db

Pass/fail gate: mel MSE < 1e-2 and MCD < 1.0 dB over a mixed workload (matching the
"bit-comparable" intent: quantization-level differences only).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from gonova_tts_tpu.audio import mel_spectrogram
    from gonova_tts_tpu.audio.mel import mcd, mel_mse
    from gonova_tts_tpu.config import ModelConfig
    from gonova_tts_tpu.models import acoustic, tts
    from gonova_tts_tpu.text import text_to_ids

    cfg = ModelConfig()
    params = jax.jit(lambda k: tts.init(k, cfg))(jax.random.PRNGKey(0))

    texts = [
        "The weather today looks bright and clear over the hills.",
        "Please remember to close the windows before you leave.",
        "Numbers like 42 and 3.14 get verbalized first.",
    ]
    bucket = 64
    tokens = np.zeros((len(texts), bucket), np.int32)
    mask = np.zeros((len(texts), bucket), np.float32)
    for i, t in enumerate(texts):
        ids = text_to_ids(t)[:bucket]
        tokens[i, : len(ids)] = ids
        mask[i, : len(ids)] = 1.0
    spk = np.zeros((len(texts), cfg.speaker_dim), np.float32)
    exagg = np.full((len(texts),), 0.5, np.float32)
    dur = jnp.full(tokens.shape, 5, jnp.int32)

    def run(dtype):
        ac = acoustic.forward(
            params["acoustic"], jnp.asarray(tokens), jnp.asarray(mask),
            jnp.asarray(spk), jnp.asarray(exagg), cfg, durations=dur, dtype=dtype,
        )
        wav = tts.vocode(params, ac["mel"], cfg, dtype=dtype)
        return np.asarray(ac["mel"], np.float32), np.asarray(wav, np.float32)

    mel_ref, wav_ref = run(jnp.float32)
    mel_cand, wav_cand = run(jnp.bfloat16)

    # Mel parity: the mels the acoustic model emits (BASELINE's parity surface).
    mse = float(mel_mse(jnp.asarray(mel_cand), jnp.asarray(mel_ref)))
    mcd_db = float(mcd(jnp.asarray(mel_cand), jnp.asarray(mel_ref)))

    # Vocoder parity: spectral distance between the bf16 and f32 waveforms.
    from gonova_tts_tpu.train.losses import multi_resolution_stft_loss

    mrstft = float(multi_resolution_stft_loss(jnp.asarray(wav_cand), jnp.asarray(wav_ref)))

    print(
        json.dumps(
            {
                "metric": "parity_bf16_vs_f32",
                "mel_mse": round(mse, 6),
                "mcd_db": round(mcd_db, 4),
                "vocoder_mrstft": round(mrstft, 4),
                "pass": bool(mse < 1e-2 and mcd_db < 1.0 and mrstft < 0.3),
            }
        )
    )


if __name__ == "__main__":
    main()
