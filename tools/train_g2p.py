"""Train the neural G2P (text/neural_g2p.py) on the vendored lexicon.

Training set = all lexicon entries NOT in the deterministic crc32%10==0 held-out
split that tools/g2p_eval.py grades on, so the eval numbers are honest. Runs in a
few minutes on CPU (tiny model, ~2.2k pairs); saves float16 weights to
text/data/g2p_weights.npz and prints held-out exact/PER vs the LTS baseline.

Usage: python tools/train_g2p.py [--steps 4000] [--no-save]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

try:
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
except Exception:
    pass
import jax.numpy as jnp
import numpy as np
import optax

from gonova_tts_tpu.text import neural_g2p as ng
from gonova_tts_tpu.text.g2p import LEXICON, VENDORED_LEXICON, _word_to_phonemes_lts


def build_dataset():
    gold = dict(VENDORED_LEXICON)
    merged = {**gold, **{w: p for w, p in LEXICON.items() if w not in gold}}
    train_x, train_y, held = [], [], {}
    for w, phons in sorted(merged.items()):
        cx, cy = ng.encode_word(w), ng.encode_phonemes(phons)
        if cx is None or cy is None:
            continue
        if w in gold and zlib.crc32(w.encode()) % 10 == 0:
            held[w] = phons
        else:
            train_x.append(cx)
            train_y.append(cy)
    return np.stack(train_x), np.stack(train_y), held


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--weight-decay", type=float, default=3e-3)
    ap.add_argument("--label-smooth", type=float, default=0.1)
    ap.add_argument("--no-save", action="store_true")
    args = ap.parse_args()

    x, y, held = build_dataset()
    print(f"train pairs: {len(x)}, held-out: {len(held)}", flush=True)

    params = ng.init(jax.random.PRNGKey(args.seed))
    warmup = min(200, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(0.0, args.lr, warmup, args.steps, args.lr * 0.02)
    opt = optax.adamw(sched, weight_decay=args.weight_decay)
    opt_state = opt.init(params)

    def loss_fn(p, bx, by):
        logits = ng.teacher_logits(p, bx, by)
        mask = (by != ng.P_PAD).astype(jnp.float32)
        onehot = jax.nn.one_hot(by, logits.shape[-1])
        smooth = args.label_smooth
        targets = onehot * (1.0 - smooth) + smooth / logits.shape[-1]
        ll = optax.softmax_cross_entropy(logits, targets)
        return jnp.sum(ll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    @jax.jit
    def step(p, s, bx, by):
        l, g = jax.value_and_grad(loss_fn)(p, bx, by)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, l

    rng = np.random.default_rng(args.seed)
    n = len(x)
    for i in range(args.steps):
        idx = rng.integers(0, n, size=min(args.batch, n))
        params, opt_state, l = step(params, opt_state, jnp.asarray(x[idx]), jnp.asarray(y[idx]))
        if i % 500 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(l):.4f}", flush=True)

    # Held-out grading: neural vs the LTS baseline (same split as tools/g2p_eval.py).
    def grade(pairs):
        from g2p_eval import edit_distance  # same-dir import

        exact = sum(p == r for p, r in pairs)
        errs = sum(edit_distance(p, r) for p, r in pairs)
        ref_len = sum(len(r) for _, r in pairs)
        return {
            "n": len(pairs),
            "exact_match": round(exact / max(len(pairs), 1), 4),
            "per": round(errs / max(ref_len, 1), 4),
        }

    words = sorted(held)
    hx = np.stack([ng.encode_word(w) for w in words])
    pred_ids = np.asarray(ng.greedy_decode(params, jnp.asarray(hx)))
    neural = grade([(ng.decode_ids(pred_ids[i]), held[w]) for i, w in enumerate(words)])
    lts = grade([(_word_to_phonemes_lts(w.replace("'", "")), held[w]) for w in words])
    print(json.dumps({"held_out_neural": neural, "held_out_lts": lts}), flush=True)

    if not args.no_save:
        ng.save_weights(params)
        print(f"saved {ng.WEIGHTS_PATH} ({os.path.getsize(ng.WEIGHTS_PATH) // 1024} KiB)")


if __name__ == "__main__":
    main()
