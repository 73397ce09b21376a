"""Grade a trained checkpoint end-to-end (TRAIN_EVAL.md evidence).

Measures, through the real engine (the serving compute path, not a test harness):
  1. held-in mel reconstruction: synthesize corpus sentences with each speaker's
     reference embedding and compare the output's mel to the corpus ground truth
     (mel L1 / MSE / MCD over the overlapping frames);
  2. streaming exactness on the trained weights: streamed chunks concatenated must
     equal the batch path within one int16 LSB (the round-1 invariant, re-proven
     on trained weights per VERDICT.md);
  3. voice-clone margin: same-voice vs cross-voice speaker-encoder cosine
     similarity of synthesized outputs (clone_eval.py's metric, inline).

Usage:
  python tools/eval_checkpoint.py --checkpoint /root/ckpts/demo --corpus /root/corpus

Prints one JSON object; exits nonzero if the clone margin is not positive.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--corpus", required=True, help="synth_corpus output dir")
    ap.add_argument("--sentences", type=int, default=3, help="held-in sentences to grade")
    ap.add_argument("--heldout", type=int, default=-1,
                    help="also grade the LAST N sentences (the generalization split "
                         "written by synth_corpus --holdout); -1 = read the corpus "
                         "meta, 0 = disable")
    ap.add_argument("--variable", action="store_true",
                    help="corpus was generated with --variable: grade per-token "
                         "durations against utterance_durations ground truth "
                         "(auto-detected from corpus_meta.json when present)")
    ap.add_argument("--max-speakers", type=int, default=8,
                    help="cap graded speakers on large corpora (0 = all); the cap "
                         "takes an even spread so generated voices are represented")
    ap.add_argument("--unseen-speakers", type=int, default=0,
                    help="additionally grade N NEVER-SEEN voices (one-shot cloning, "
                         "the reference's signature capability — README.md:48-51): "
                         "generates an eval-only corpus of make_unseen_speakers(N) "
                         "voices next to --corpus, embeds each 3-10 s reference "
                         "through the serving path, and reports clone margin / mel "
                         "L1 / durations for speakers the model never trained on")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--f32", action="store_true", help="serve in float32 (default bf16)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from gonova_tts_tpu.audio.mel import mel_spectrogram
    from gonova_tts_tpu.config import Config
    from gonova_tts_tpu.engine import TTSEngine
    from gonova_tts_tpu.train.synth_corpus import load_corpus_meta
    from gonova_tts_tpu.utils import read_wav

    import jax.numpy as jnp

    # Generation parameters from the corpus itself (scaled corpora carry extra
    # sentences/speakers + flags in corpus_meta.json; pre-meta corpora fall back
    # to the 4x12 defaults, which is all they ever were).
    meta = load_corpus_meta(args.corpus)
    SENTENCES, ALL_SPEAKERS = meta["sentences"], meta["speakers"]
    rate_variation = meta["rate_variation"]
    variable = args.variable or meta["variable"]
    n_heldout = meta["holdout"] if args.heldout < 0 else args.heldout
    if args.max_speakers > 0 and len(ALL_SPEAKERS) > args.max_speakers:
        idx = np.linspace(0, len(ALL_SPEAKERS) - 1, args.max_speakers).astype(int)
        SPEAKERS = [ALL_SPEAKERS[i] for i in sorted(set(idx.tolist()))]
    else:
        SPEAKERS = list(ALL_SPEAKERS)

    cfg = Config()
    cfg.model.model_path = args.checkpoint
    cfg.engine.warmup_shapes = []
    if args.f32:
        cfg.model.compute_dtype = "float32"
    engine = TTSEngine(cfg)
    engine.load(warmup=False)
    # Use the ENGINE's model config: load() infers checkpoint-determined knobs
    # (e.g. vocos_head from the restored head width) on its own copy.
    mcfg = engine.mcfg

    def mel_of(wav: np.ndarray) -> np.ndarray:
        return np.asarray(
            mel_spectrogram(
                jnp.asarray(wav, jnp.float32)[None], sr=mcfg.sample_rate,
                n_fft=mcfg.n_fft, hop_length=mcfg.hop_length,
                win_length=mcfg.win_length, n_mels=mcfg.n_mels,
                fmin=mcfg.fmin, fmax=mcfg.fmax,
            )[0]
        )

    # Reference embeddings from the per-speaker reference clips.
    ref_embs = {}
    for spk in SPEAKERS:
        path = os.path.join(args.corpus, f"ref_{spk.name}.wav")
        audio, sr = read_wav(path)
        ref_embs[spk.name] = engine.embed_voice(np.asarray(audio, np.float32), sr)

    # 1. Held-in mel reconstruction per speaker, decomposed into:
    #    e2e        — mel(synthesized audio) vs GT mel: acoustic + vocoder + phase;
    #    acoustic   — predicted mel (pre-vocoder) vs GT mel: the training-loss analog;
    #    voc_floor  — mel(vocode(GT mel)) vs GT mel: the vocoder-only attainable floor
    #                 (e2e below/near this floor means the acoustic stage is not the
    #                 bottleneck).
    from gonova_tts_tpu.models import tts as tmodel
    from gonova_tts_tpu.text import text_to_ids

    from gonova_tts_tpu.text import pick_bucket

    def _bucketed_tokens(ids):
        # Same bucketing as the engine (engine.py synthesize paths) — a fixed 64
        # would crash/mis-grade any sentence longer than 64 tokens. Clamp to the
        # largest bucket as pad_to_bucket does (backstop, not the common path).
        bucket = pick_bucket(len(ids), engine.ecfg.token_buckets)
        ids = list(ids)[:bucket]
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, : len(ids)] = ids
        mask = (np.arange(bucket)[None] < len(ids)).astype(np.float32)
        return tokens, mask, len(ids)

    def acoustic_mel_pred(text: str, emb: np.ndarray) -> np.ndarray:
        ids = text_to_ids(text)
        tokens, mask, _ = _bucketed_tokens(ids)
        out = tmodel.acoustic_mel(
            engine.params, jnp.asarray(tokens), jnp.asarray(mask),
            jnp.asarray(emb, jnp.float32)[None],
            jnp.full((1,), 0.5, jnp.float32), mcfg,
            dtype=engine.compute_dtype,
        )
        t = int(np.asarray(out["total_frames"])[0])
        return np.asarray(out["mel"], np.float32)[0, :t]

    def vocoder_floor(gt_wav: np.ndarray) -> float:
        m_gt = mel_of(gt_wav)
        wav2 = np.asarray(
            tmodel.vocode(
                engine.params, jnp.asarray(m_gt, engine.compute_dtype)[None], mcfg,
                dtype=engine.compute_dtype,
            ),
            np.float32,
        )[0]
        m2 = mel_of(wav2)
        t = min(len(m_gt), len(m2))
        return float(np.abs(m2[:t] - m_gt[:t]).mean())

    def predicted_durations(text: str, emb: np.ndarray):
        ids = text_to_ids(text)
        tokens, mask, n = _bucketed_tokens(ids)
        out = tmodel.acoustic_mel(
            engine.params, jnp.asarray(tokens), jnp.asarray(mask),
            jnp.asarray(emb, jnp.float32)[None],
            jnp.full((1,), 0.5, jnp.float32), mcfg,
            dtype=engine.compute_dtype,
        )
        return np.asarray(out["durations"], np.int32)[0, :n]

    def grade(sentence_indices, corpus_dir=None, speakers=None, embs=None):
        corpus_dir = corpus_dir or args.corpus
        speakers = speakers if speakers is not None else SPEAKERS
        embs = embs if embs is not None else ref_embs
        recon = []
        for spk in speakers:
            for i in sentence_indices:
                text = SENTENCES[i]
                gt, sr = read_wav(os.path.join(corpus_dir, f"{spk.name}_{i:02d}.wav"))
                gt = np.asarray(gt, np.float32)
                out = engine.synthesize_batch([text], speakers=[embs[spk.name]])[0]
                m_gt, m_out = mel_of(gt), mel_of(out)
                m_ac = acoustic_mel_pred(text, embs[spk.name])
                t = min(len(m_gt), len(m_out))
                ta = min(len(m_gt), len(m_ac))
                d = m_out[:t] - m_gt[:t]
                from gonova_tts_tpu.audio.mel import mcd as cepstral_mcd

                row = {
                    "mel_l1": float(np.abs(d).mean()),
                    "mel_mse": float((d**2).mean()),
                    # TRUE cepstral MCD (DCT-II, drop c0, 13 coeffs — audio/mel.mcd;
                    # the literature-comparable number).
                    "mcd_db": float(cepstral_mcd(m_out[:t], m_gt[:t])),
                    # The pre-round-3b metric: dB-scaled L2 over ALL 80 log-mel bins
                    # incl. the energy component — inflated ~sqrt(80/12)x vs
                    # cepstral MCD. Kept under an honest name so older TRAIN_EVAL
                    # tables (recorded at this scale) remain comparable.
                    "logmel_dist_db": float(
                        (10.0 / np.log(10.0))
                        * np.sqrt(2.0 * (d**2).sum(-1)).mean()
                    ),
                    "acoustic_mel_l1": float(np.abs(m_ac[:ta] - m_gt[:ta]).mean()),
                    "voc_floor_mel_l1": vocoder_floor(gt),
                    "len_ratio": float(len(m_out) / max(len(m_gt), 1)),
                }
                if variable:
                    # Per-token duration accuracy vs the corpus generator's ground
                    # truth — the direct evidence that alignment was LEARNED (the
                    # manifest carries no durations; uniform spreading would score
                    # mae ≈ the jitter amplitude with ~zero correlation).
                    from gonova_tts_tpu.text.symbols import SYMBOLS
                    from gonova_tts_tpu.train.synth_corpus import (
                        is_silence_symbol, utterance_durations,
                    )

                    ids = text_to_ids(text)
                    true_d = np.asarray(
                        utterance_durations(ids, text, rate_variation=rate_variation),
                        np.float64,
                    )
                    pred_d = predicted_durations(text, embs[spk.name]).astype(np.float64)
                    # Bucket truncation backstop: grade the overlapping prefix
                    # (a >largest-bucket sentence used to crash the whole eval).
                    n_cmp = min(len(true_d), len(pred_d))
                    true_d, pred_d, ids = true_d[:n_cmp], pred_d[:n_cmp], list(ids)[:n_cmp]
                    row["dur_mae_frames"] = float(np.abs(pred_d - true_d).mean())
                    if true_d.std() > 0 and pred_d.std() > 0:
                        row["dur_corr"] = float(np.corrcoef(pred_d, true_d)[0, 1])
                    # Silence-excluded: splits between adjacent silence tokens are
                    # acoustically unobservable (align_diag.py), so the MAS targets
                    # the predictor learned from are arbitrary there.
                    ns = np.asarray(
                        [not is_silence_symbol(SYMBOLS[x]) for x in ids], bool
                    )
                    if ns.sum() >= 2:
                        row["dur_mae_nonsil"] = float(
                            np.abs(pred_d[ns] - true_d[ns]).mean()
                        )
                        if true_d[ns].std() > 0 and pred_d[ns].std() > 0:
                            row["dur_corr_nonsil"] = float(
                                np.corrcoef(pred_d[ns], true_d[ns])[0, 1]
                            )
                recon.append(row)
        agg = {
            "mel_l1": float(np.mean([r["mel_l1"] for r in recon])),
            "mel_mse": float(np.mean([r["mel_mse"] for r in recon])),
            "mcd_db": float(np.mean([r["mcd_db"] for r in recon])),
            "acoustic_mel_l1": float(np.mean([r["acoustic_mel_l1"] for r in recon])),
            "voc_floor_mel_l1": float(np.mean([r["voc_floor_mel_l1"] for r in recon])),
            "len_ratio": float(np.mean([r["len_ratio"] for r in recon])),
        }
        if variable:
            agg["dur_mae_frames"] = float(np.mean([r["dur_mae_frames"] for r in recon]))
            corrs = [r["dur_corr"] for r in recon if "dur_corr" in r]
            if corrs:
                agg["dur_corr"] = float(np.mean(corrs))
            ns_mae = [r["dur_mae_nonsil"] for r in recon if "dur_mae_nonsil" in r]
            if ns_mae:
                agg["dur_mae_nonsil"] = float(np.mean(ns_mae))
            ns_corr = [r["dur_corr_nonsil"] for r in recon if "dur_corr_nonsil" in r]
            if ns_corr:
                agg["dur_corr_nonsil"] = float(np.mean(ns_corr))
        return agg

    held_in = grade(range(args.sentences))
    mel_l1, mel_mse, mcd = held_in["mel_l1"], held_in["mel_mse"], held_in["mcd_db"]
    ac_l1, floor_l1 = held_in["acoustic_mel_l1"], held_in["voc_floor_mel_l1"]
    len_ratio = held_in["len_ratio"]
    held_out = None
    if n_heldout > 0:
        n = len(SENTENCES)
        held_out = grade(range(n - n_heldout, n))

    # 2. Streaming exactness on trained weights.
    spk0 = SPEAKERS[0]
    text0 = SENTENCES[0]
    batch_out = engine.synthesize_batch([text0], speakers=[ref_embs[spk0.name]])[0]
    stream_out = np.concatenate(
        list(engine.synthesize_stream(text0, speaker=ref_embs[spk0.name]))
    )
    t = min(len(batch_out), len(stream_out))
    stream_exact_lsb = float(
        np.max(np.abs(batch_out[:t] - stream_out[:t])) * 32767.0
    )
    stream_len_match = abs(len(batch_out) - len(stream_out)) <= mcfg.hop_length

    # 3. Clone margin on synthesized audio.
    same, cross = [], []
    for spk in SPEAKERS:
        out = engine.synthesize_batch(
            [SENTENCES[1]], speakers=[ref_embs[spk.name]]
        )[0]
        emb = engine.embed_voice(out, engine.sample_rate)
        for other, ref in ref_embs.items():
            sim = float(np.dot(emb, ref))
            (same if other == spk.name else cross).append(sim)
    margin = float(np.mean(same) - np.mean(cross))

    # 4. NEVER-SEEN speakers (one-shot cloning, the reference's signature
    #    capability — /root/reference/services/tts/README.md:48-51). Every number
    #    above grades speakers the model TRAINED on; this block generates voices
    #    from a disjoint seed pool, embeds each reference clip through the real
    #    serving path (engine.embed_voice), and grades synthesis quality + clone
    #    margin for voices the model has never observed.
    unseen = None
    if args.unseen_speakers > 0:
        from gonova_tts_tpu.train.synth_corpus import (
            generate_corpus, make_unseen_speakers,
        )

        uns_spk = make_unseen_speakers(args.unseen_speakers)
        uns_dir = args.corpus.rstrip("/") + f"_unseen{args.unseen_speakers}"
        if not os.path.exists(os.path.join(uns_dir, "corpus_meta.json")):
            generate_corpus(
                uns_dir, sentences=list(SENTENCES), speakers=uns_spk,
                variable=variable, holdout=n_heldout,
                rate_variation=rate_variation,
            )
        uns_embs = {}
        for spk in uns_spk:
            audio, sr = read_wav(os.path.join(uns_dir, f"ref_{spk.name}.wav"))
            uns_embs[spk.name] = engine.embed_voice(np.asarray(audio, np.float32), sr)

        uns_held_in = grade(range(args.sentences), uns_dir, uns_spk, uns_embs)
        uns_held_out = None
        if n_heldout > 0:
            n = len(SENTENCES)
            uns_held_out = grade(range(n - n_heldout, n), uns_dir, uns_spk, uns_embs)

        # Clone margin with the cross pool = OTHER unseen refs + ALL training
        # refs. Including training refs is the sharp test: a model that collapses
        # a new voice onto its nearest training voice scores high same-voice
        # cosine on training speakers but fails here.
        all_refs = {**ref_embs, **uns_embs}
        u_same, u_cross, u_cross_train = [], [], []
        for spk in uns_spk:
            out = engine.synthesize_batch(
                [SENTENCES[1]], speakers=[uns_embs[spk.name]]
            )[0]
            emb = engine.embed_voice(out, engine.sample_rate)
            for other, ref in all_refs.items():
                sim = float(np.dot(emb, ref))
                if other == spk.name:
                    u_same.append(sim)
                else:
                    u_cross.append(sim)
                    if other in ref_embs:
                        u_cross_train.append(sim)
        unseen = {
            "n_speakers": len(uns_spk),
            "held_in_mel_l1": round(uns_held_in["mel_l1"], 4),
            "held_in_acoustic_mel_l1": round(uns_held_in["acoustic_mel_l1"], 4),
            "len_ratio": round(uns_held_in["len_ratio"], 4),
            "clone_same_voice_mean": round(float(np.mean(u_same)), 4),
            "clone_cross_voice_mean": round(float(np.mean(u_cross)), 4),
            "clone_cross_train_mean": round(float(np.mean(u_cross_train)), 4),
            "clone_margin": round(float(np.mean(u_same) - np.mean(u_cross)), 4),
        }
        if variable and "dur_corr_nonsil" in uns_held_in:
            unseen["held_in_dur_corr_nonsil"] = round(
                uns_held_in["dur_corr_nonsil"], 4
            )
        if uns_held_out is not None:
            unseen["held_out_mel_l1"] = round(uns_held_out["mel_l1"], 4)
            if variable and "dur_corr_nonsil" in uns_held_out:
                unseen["held_out_dur_corr_nonsil"] = round(
                    uns_held_out["dur_corr_nonsil"], 4
                )

    result = {
        "checkpoint": args.checkpoint,
        "backend": __import__("jax").default_backend(),
        "held_in_mel_l1": round(mel_l1, 4),
        "held_in_mel_mse": round(mel_mse, 4),
        "held_in_mcd_db": round(mcd, 3),
        "held_in_acoustic_mel_l1": round(ac_l1, 4),
        "vocoder_floor_mel_l1": round(floor_l1, 4),
        "duration_len_ratio": round(len_ratio, 4),
        "stream_vs_batch_max_lsb": round(stream_exact_lsb, 3),
        "stream_len_match": bool(stream_len_match),
        "clone_same_voice_mean": round(float(np.mean(same)), 4),
        "clone_cross_voice_mean": round(float(np.mean(cross)), 4),
        "clone_margin": round(margin, 4),
    }
    if variable and "dur_mae_frames" in held_in:
        result["held_in_dur_mae_frames"] = round(held_in["dur_mae_frames"], 3)
        result["held_in_dur_corr"] = round(held_in.get("dur_corr", 0.0), 4)
        if "dur_mae_nonsil" in held_in:
            result["held_in_dur_mae_nonsil"] = round(held_in["dur_mae_nonsil"], 3)
            result["held_in_dur_corr_nonsil"] = round(
                held_in.get("dur_corr_nonsil", 0.0), 4
            )
    if held_out is not None:
        result["held_out_mel_l1"] = round(held_out["mel_l1"], 4)
        result["held_out_mcd_db"] = round(held_out["mcd_db"], 3)
        result["held_out_acoustic_mel_l1"] = round(held_out["acoustic_mel_l1"], 4)
        result["held_out_len_ratio"] = round(held_out["len_ratio"], 4)
        result["generalization_gap_mel_l1"] = round(
            held_out["mel_l1"] - held_in["mel_l1"], 4
        )
        if variable and "dur_mae_frames" in held_out:
            result["held_out_dur_mae_frames"] = round(held_out["dur_mae_frames"], 3)
            result["held_out_dur_corr"] = round(held_out.get("dur_corr", 0.0), 4)
            if "dur_mae_nonsil" in held_out:
                result["held_out_dur_mae_nonsil"] = round(
                    held_out["dur_mae_nonsil"], 3
                )
                result["held_out_dur_corr_nonsil"] = round(
                    held_out.get("dur_corr_nonsil", 0.0), 4
                )
    if unseen is not None:
        result["unseen_speakers"] = unseen
    print(json.dumps(result))
    sys.exit(0 if margin > 0 else 1)


if __name__ == "__main__":
    main()
