"""Voice-clone similarity evaluation harness.

The reference claims ">95% voice similarity (same speaker)" qualitatively
(services/tts/README.md:906-908) with no measurement code.  This harness makes the
claim measurable: speaker-encoder cosine similarity between the cloning reference
audio and the synthesized output, compared against the similarity to *other* voices
(the discriminability margin is what matters — with an untrained checkpoint the
absolute numbers are meaningless, but the harness is how a trained model is graded).

  python clone_eval.py [--voices-dir DIR]     # defaults to synthetic test voices

Prints one JSON line: mean same-voice similarity, mean cross-voice similarity, margin.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--voices-dir", default=None, help="dir of reference WAVs (else synthetic)")
    ap.add_argument("--text", default="The quick brown fox jumps over the lazy dog.")
    ap.add_argument("--checkpoint", default=None, help="orbax checkpoint dir (trained weights)")
    args = ap.parse_args()

    from gonova_tts_tpu.config import Config
    from gonova_tts_tpu.engine import TTSEngine
    from gonova_tts_tpu.utils import read_wav

    cfg = Config()
    cfg.engine.warmup_shapes = []
    if args.checkpoint:
        cfg.model.model_path = args.checkpoint
    engine = TTSEngine(cfg)
    engine.load(warmup=False)

    refs = []
    if args.voices_dir:
        for path in sorted(glob.glob(os.path.join(args.voices_dir, "*.wav")))[:8]:
            audio, sr = read_wav(path)
            refs.append((os.path.basename(path), np.asarray(audio, np.float32), sr))
    if not refs:
        rng = np.random.default_rng(0)
        sr = 24000
        for i in range(4):
            t = np.arange(5 * sr) / sr
            f = 120 + 60 * i
            audio = (
                0.4 * np.sin(2 * np.pi * f * t) * (0.6 + 0.4 * np.sin(2 * np.pi * (2 + i) * t))
                + 0.02 * rng.standard_normal(len(t))
            ).astype(np.float32)
            refs.append((f"synthetic_{i}", audio, sr))

    ref_embs = {name: engine.embed_voice(audio, sr) for name, audio, sr in refs}

    same, cross = [], []
    for name, _, _ in refs:
        out = engine.synthesize_batch([args.text], speakers=[ref_embs[name]])[0]
        out_emb = engine.embed_voice(out, engine.sample_rate)
        for other, emb in ref_embs.items():
            sim = float(np.dot(out_emb, emb))
            (same if other == name else cross).append(sim)

    result = {
        "metric": "voice_clone_similarity",
        "voices": len(refs),
        "same_voice_mean": round(float(np.mean(same)), 4),
        "cross_voice_mean": round(float(np.mean(cross)), 4),
        "margin": round(float(np.mean(same) - np.mean(cross)), 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
