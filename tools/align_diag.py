"""Aligner-in-isolation diagnostic: can the MAS aligner learn the corpus alignment?

Trains ONLY models/aligner.py (forward-sum [+ optional bin]) on the real corpus
batches and grades MAS durations against the generator's ground-truth per-token
durations (synth_corpus.utterance_durations) every --eval-every steps. Isolates
the aligner from the joint objective so optimizer coupling (shared LR, global
grad clipping) can be ruled in or out.

Usage:
  python tools/align_diag.py --corpus corpus_r3 [--lr 3e-3] [--steps 2000]
          [--bin-weight 0.0] [--clip 0] [--cpu]
Prints one JSON line per eval point.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--bin-weight", type=float, default=0.0)
    ap.add_argument("--prior-sigma", type=float, default=0.12,
                    help="diagonal prior width (normalized coords); 0 disables")
    ap.add_argument("--prior-steps", type=int, default=1000,
                    help="linear anneal: full prior at step 0, off by this step")
    ap.add_argument("--clip", type=float, default=0.0, help="global-norm clip (0 = off)")
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from gonova_tts_tpu.config import ModelConfig
    from gonova_tts_tpu.models import aligner
    from gonova_tts_tpu.text import text_to_ids
    from gonova_tts_tpu.train.data import ManifestDataset, load_manifest
    from gonova_tts_tpu.text.symbols import SYMBOLS
    from gonova_tts_tpu.train.synth_corpus import (
        is_silence_symbol, load_corpus_meta, utterance_durations,
    )

    cfg = ModelConfig()
    # Generation flags from the corpus itself: rate-varied corpora scale every
    # token's ground-truth duration by the per-sentence tempo (corpus_meta.json).
    rate_variation = load_corpus_meta(args.corpus)["rate_variation"]
    manifest = os.path.join(args.corpus, "manifest_train.txt")
    if not os.path.exists(manifest):
        manifest = os.path.join(args.corpus, "manifest.txt")
    ds = ManifestDataset(manifest, cfg, batch_size=8, token_buckets=(64,),
                         learn_alignment=True, ref_mel=False)
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()
         if k in ("tokens", "token_mask", "mel", "align_mel", "frame_mask")}
        for b in ds.epoch(0)
    ]
    # Ground truth durations per manifest line, keyed by token array bytes.
    truth = {}
    for e in load_manifest(manifest):
        ids = text_to_ids(e["text"])
        truth[np.asarray(ids, np.int32).tobytes()] = np.asarray(
            utterance_durations(ids, e["text"], rate_variation=rate_variation),
            np.int64,
        )

    params = aligner.init(jax.random.PRNGKey(0), cfg, dim=args.dim)
    tx = [optax.clip_by_global_norm(args.clip)] if args.clip > 0 else []
    opt = optax.chain(*tx, optax.adamw(args.lr, weight_decay=0.01))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch, prior_w):
        def loss_fn(p):
            prior = None
            if args.prior_sigma > 0:
                prior = prior_w * aligner.diagonal_prior(
                    batch["token_mask"], batch["frame_mask"], sigma=args.prior_sigma
                )
            lp = aligner.log_probs(
                p, batch["tokens"], batch.get("align_mel", batch["mel"]),
                batch["token_mask"], prior=prior, frame_mask=batch["frame_mask"],
            )
            l = aligner.forward_sum_loss(lp, batch["token_mask"], batch["frame_mask"])
            if args.bin_weight > 0:
                dur = aligner.mas_durations(
                    jax.lax.stop_gradient(lp), batch["token_mask"], batch["frame_mask"]
                )
                l = l + args.bin_weight * aligner.bin_loss(lp, dur, batch["frame_mask"])
            return l

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def mas(params, batch):
        # Graded WITHOUT the prior: measures what the learned scores alone align.
        lp = aligner.log_probs(params, batch["tokens"],
                               batch.get("align_mel", batch["mel"]),
                               batch["token_mask"], frame_mask=batch["frame_mask"])
        return aligner.mas_durations(lp, batch["token_mask"], batch["frame_mask"])

    def grade():
        errs, corrs, n = [], [], 0
        # Silence-excluded: splits between ADJACENT silence tokens (stop tails,
        # "<sp>" after ".", final ". <eos>") are acoustically unobservable — no
        # aligner can recover them from audio — so the observable-boundary
        # numbers are reported alongside.
        ns_errs, ns_corrs = [], []
        for b in batches:
            dur = np.asarray(mas(params, b))
            toks = np.asarray(b["tokens"])
            mask = np.asarray(b["token_mask"])
            for i in range(dur.shape[0]):
                l = int(mask[i].sum())
                if l == 0:
                    continue
                key = toks[i, :l].astype(np.int32).tobytes()
                t = truth.get(key)
                if t is None or len(t) != l:
                    continue
                d = dur[i, :l].astype(np.int64)
                errs.append(np.abs(d - t).mean())
                if d.std() > 0 and t.std() > 0:
                    corrs.append(float(np.corrcoef(d, t)[0, 1]))
                ns = np.asarray(
                    [not is_silence_symbol(SYMBOLS[x]) for x in toks[i, :l]], bool
                )
                if ns.sum() >= 2:
                    ns_errs.append(np.abs(d[ns] - t[ns]).mean())
                    if d[ns].std() > 0 and t[ns].std() > 0:
                        ns_corrs.append(float(np.corrcoef(d[ns], t[ns])[0, 1]))
                n += 1
        return {
            "utts": n,
            "dur_mae": round(float(np.mean(errs)), 3) if errs else None,
            "dur_corr": round(float(np.mean(corrs)), 4) if corrs else None,
            "dur_mae_nonsil": round(float(np.mean(ns_errs)), 3) if ns_errs else None,
            "dur_corr_nonsil": round(float(np.mean(ns_corrs)), 4) if ns_corrs else None,
        }

    loss = None
    for i in range(args.steps + 1):
        if i % args.eval_every == 0:
            g = grade()
            print(json.dumps({"step": i, "loss": None if loss is None else round(float(loss), 4), **g}), flush=True)
        if i < args.steps:
            w = max(0.0, 1.0 - i / max(args.prior_steps, 1))
            params, opt_state, loss = step(
                params, opt_state, batches[i % len(batches)], jnp.float32(w)
            )


if __name__ == "__main__":
    main()
