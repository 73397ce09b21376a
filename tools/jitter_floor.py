"""Irreducible-error floor for the held-out generalization grades.

The corpus generator seeds per-token duration jitter on (symbol, position,
TEXT) — `train/synth_corpus.py:utterance_durations`. For held-out sentences the
model cannot know the realization, only the class-conditional distribution, so
even a perfect model pays a mel-L1 floor against the ground-truth wav. This
tool quantifies that floor two ways (VERDICT round-4 item 4: "grade the
generator's own resynthesis of held-out text as the floor"):

  floor_alt_jitter : the generator re-renders each held-out utterance with a
                     SALTED jitter key (same distribution, different iid
                     realization) and is graded against its own ground truth —
                     the expected error of a model that sampled from the true
                     duration distribution.
  floor_mean_dur   : re-render with every token at its class-MEAN duration —
                     the error of the optimal deterministic duration predictor
                     (what our regression-trained model converges to).

Both renditions use the generator's own segment synthesis, so spectral content
is exact and the floor isolates pure duration unpredictability. Grading mirrors
tools/eval_checkpoint.py: mel L1 over the overlapping prefix, same mel settings.

Usage: python tools/jitter_floor.py --corpus /tmp/corpus_s250x8 [--heldout 2]
→ one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

try:
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
except Exception:
    pass
import jax.numpy as jnp
import numpy as np

from gonova_tts_tpu.audio.mel import mel_spectrogram
from gonova_tts_tpu.config import ModelConfig
from gonova_tts_tpu.text import text_to_ids
from gonova_tts_tpu.text.symbols import SYMBOLS
from gonova_tts_tpu.train import synth_corpus as sc
from gonova_tts_tpu.utils import read_wav


def _mean_durations(ids, text: str, rate_variation: bool) -> list:
    """Class-mean frame counts — the optimal deterministic predictor's output.
    Means mirror utterance_durations' class ranges: vowels 4+U{0..3} → 5.5,
    sonorants 3+U{0..2} → 4, noise 3.5, stops 2.5, other 3.5."""
    rate = sc.rate_for_text(text) if rate_variation else 1.0
    out = []
    for tok in ids:
        sym = SYMBOLS[tok]
        if sym and sym[-1] in "012":
            sym = sym[:-1]
        if sym in sc._VOWEL_FORMANTS:
            mean = 5.5
        elif sym in sc._SONORANT_FORMANTS:
            mean = 4.0
        elif sym in sc._NOISE_RECIPES:
            mean = 3.5
        elif sym in sc._STOP_RECIPES:
            mean = 2.5
        else:
            mean = 3.5
        out.append(max(1, int(round(mean * rate))))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="synth_corpus output dir")
    ap.add_argument("--heldout", type=int, default=-1,
                    help="last-N sentences per speaker to grade (default: the "
                    "corpus meta's holdout)")
    ap.add_argument("--max-speakers", type=int, default=8)
    ap.add_argument("--salt", default="\x00altseed", help="jitter-key salt")
    args = ap.parse_args()

    meta = sc.load_corpus_meta(args.corpus)
    sentences = meta["sentences"]
    speakers = meta["speakers"][: args.max_speakers]
    variable = meta["variable"]
    rate_variation = meta["rate_variation"]
    n_held = meta["holdout"] if args.heldout < 0 else args.heldout
    if not variable or n_held <= 0:
        print(json.dumps({"error": "corpus has no variable durations or no holdout"}))
        sys.exit(1)

    cfg = ModelConfig()

    def mel_of(wav: np.ndarray) -> np.ndarray:
        # Pad to a coarse length bucket so XLA compiles O(1) mel graphs instead
        # of one per distinct utterance length, then slice the true frames.
        n = len(wav)
        bucket = 1 << max(14, (n - 1).bit_length())  # ≥16384, power of two
        padded = np.zeros(bucket, np.float32)
        padded[:n] = wav
        frames = 1 + n // cfg.hop_length
        return np.asarray(
            mel_spectrogram(
                jnp.asarray(padded, jnp.float32)[None], sr=cfg.sample_rate,
                n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                win_length=cfg.win_length, n_mels=cfg.n_mels,
                fmin=cfg.fmin, fmax=cfg.fmax,
            )[0][:frames]
        )

    idxs = range(len(sentences) - n_held, len(sentences))
    alt_l1, mean_l1, alt_len, mean_len = [], [], [], []
    n_graded = 0
    for spk in speakers:
        for i in idxs:
            text = sentences[i]
            gt_path = os.path.join(args.corpus, f"{spk.name}_{i:02d}.wav")
            if not os.path.exists(gt_path):
                continue
            gt, _ = read_wav(gt_path)
            m_gt = mel_of(np.asarray(gt, np.float32))
            # Alternative iid jitter realization.
            alt, _ = sc.synthesize_utterance(
                text, spk, cfg, variable=True, rate_variation=rate_variation,
                jitter_salt=args.salt,
            )
            m_alt = mel_of(alt)
            t = min(len(m_gt), len(m_alt))
            alt_l1.append(float(np.abs(m_alt[:t] - m_gt[:t]).mean()))
            alt_len.append(len(m_alt) / max(len(m_gt), 1))
            # Optimal deterministic (class-mean) durations.
            ids = text_to_ids(text)
            md = _mean_durations(ids, text, rate_variation)
            mean, _ = sc.synthesize_utterance(
                text, spk, cfg, variable=True, durations=md,
            )
            m_mean = mel_of(mean)
            t = min(len(m_gt), len(m_mean))
            mean_l1.append(float(np.abs(m_mean[:t] - m_gt[:t]).mean()))
            mean_len.append(len(m_mean) / max(len(m_gt), 1))
            n_graded += 1

    print(json.dumps({
        "corpus": args.corpus,
        "n_utterances": n_graded,
        "n_speakers": len(speakers),
        "floor_alt_jitter_mel_l1": round(float(np.mean(alt_l1)), 4),
        "floor_mean_dur_mel_l1": round(float(np.mean(mean_l1)), 4),
        "alt_len_ratio": round(float(np.mean(alt_len)), 4),
        "mean_len_ratio": round(float(np.mean(mean_len)), 4),
    }))


if __name__ == "__main__":
    main()
