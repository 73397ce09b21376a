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


_VOICELESS = {"P", "T", "K", "F", "TH", "S", "SH", "CH", "HH"}
_SIBILANT = {"S", "Z", "SH", "ZH", "CH", "JH"}
_VOWELS = set("aeiou")


def _cvc_risky(w: str) -> bool:
    """Final-consonant doubling territory (stop→stopping): skip rather than guess."""
    return (
        len(w) >= 2
        and w[-1] not in _VOWELS
        and w[-1] not in "wxy"
        and w[-2] in _VOWELS
        and (len(w) < 3 or w[-3] not in _VOWELS)
    )


def morph_derive(word: str, phons):
    """Regular inflections/derivations of a lexicon entry, both tiers at once —
    standard English morphophonology (voicing assimilation for -s, syllabic
    IH Z / IH D after sibilants/alveolar stops, silent-e and y→i orthography).
    Pronunciation-consistent pseudo-words are fine training signal for a
    spelling→sound model, so no dictionary check on the derived form; anything
    orthographically ambiguous (consonant doubling) is skipped instead."""
    last = phons[-1]
    out = {}

    # -s / -es (plural & 3sg)
    if last in _SIBILANT:
        plural = word + ("es" if not word.endswith("e") else "s")
        out[plural] = phons + ["IH", "Z"]
    else:
        tail = ["S"] if last in _VOICELESS else ["Z"]
        if word.endswith("y") and len(word) > 2 and word[-2] not in _VOWELS:
            out[word[:-1] + "ies"] = phons + ["Z"]
        elif not word.endswith(("s", "x", "z")):
            out[word + "s"] = phons + tail

    # -ing / -ed (drop final silent e; skip doubling-risk stems)
    if word.endswith("e") and not word.endswith("ee"):
        stem = word[:-1]
    elif _cvc_risky(word):
        stem = None
    else:
        stem = word
    if stem:
        if last != "NG":
            out[stem + "ing"] = phons + ["IH", "NG"]
        if last in ("T", "D"):
            out[stem + "ed"] = phons + ["IH", "D"]
        elif word.endswith("y") and len(word) > 2 and word[-2] not in _VOWELS:
            out[word[:-1] + "ied"] = phons + ["D"]
        else:
            out[stem + "ed"] = phons + (["T"] if last in _VOICELESS else ["D"])

    # -ly, -ness (y→i), -er (comparative/agentive)
    if not word.endswith("y"):
        out[word + "ly"] = phons + ["L", "IY"]
        out[word + "ness"] = phons + ["N", "AH", "S"]
    elif last == "IY":
        out[word[:-1] + "iness"] = phons[:-1] + ["IY", "N", "AH", "S"]
    if word.endswith("e"):
        out[word + "r"] = phons + ["ER"]
    elif word.endswith("y") and len(word) > 2 and word[-2] not in _VOWELS:
        out[word[:-1] + "ier"] = phons[:-1] + ["IY", "ER"] if last == "IY" else phons + ["ER"]
    elif not _cvc_risky(word):
        out[word + "er"] = phons + ["ER"]

    # Prefixes with invariant pronunciations (fully regular regardless of
    # lexicality — pronunciation-consistent pseudo-words are fine signal).
    # Junction guards mirror compound_derive: skip seams where concatenation
    # changes letter-to-sound rules — a doubled letter across the boundary
    # ("non"+"name"), or a vowel-initial stem after a vowel-final prefix
    # ("pre"+"end" would train 'ee' → IY-EH against the digraph rule).
    def _pfx(prefix: str, pron: list) -> None:
        if prefix[-1] == word[0]:
            return
        if prefix[-1] in _VOWELS and word[0] in _VOWELS:
            return
        out[prefix + word] = pron + phons

    _pfx("un", ["AH", "N"])
    _pfx("re", ["R", "IY"])
    _pfx("dis", ["D", "IH", "S"])
    _pfx("mis", ["M", "IH", "S"])
    _pfx("non", ["N", "AA", "N"])
    _pfx("pre", ["P", "R", "IY"])
    _pfx("over", ["OW", "V", "ER"])
    _pfx("under", ["AH", "N", "D", "ER"])
    _pfx("out", ["AW", "T"])

    # Derivational suffixes with invariant pronunciations.
    out[word + "ful"] = phons + ["F", "UH", "L"]
    out[word + "less"] = phons + ["L", "AH", "S"]
    out[word + "ment"] = phons + ["M", "AH", "N", "T"]
    if not word.endswith(("s", "sh", "ch", "e")):
        out[word + "ish"] = phons + ["IH", "SH"]
    # -est (superlative): same stem orthography as -er.
    if word.endswith("e") and not word.endswith("ee"):
        out[word + "st"] = phons + ["AH", "S", "T"]
    elif word.endswith("y") and len(word) > 2 and word[-2] not in _VOWELS:
        if last == "IY":
            out[word[:-1] + "iest"] = phons[:-1] + ["IY", "AH", "S", "T"]
    elif not _cvc_risky(word):
        out[word + "est"] = phons + ["AH", "S", "T"]
    # -able (drop final silent e).
    able_stem = word[:-1] if word.endswith("e") and not word.endswith("ee") else word
    if not _cvc_risky(word):
        out[able_stem + "able"] = phons + ["AH", "B", "AH", "L"]

    # More invariant derivational suffixes.
    out[word + "hood"] = phons + ["HH", "UH", "D"]
    out[word + "ship"] = phons + ["SH", "IH", "P"]
    out[word + "like"] = phons + ["L", "AY", "K"]
    out[word + "wise"] = phons + ["W", "AY", "Z"]
    out[word + "dom"] = phons + ["D", "AH", "M"]
    out[word + "ward"] = phons + ["W", "ER", "D"]

    return {w: p for w, p in out.items() if p is not None}


def compound_derive(train: dict, n_pairs: int, seed: int = 0) -> dict:
    """Sampled two-word closed compounds (sun+light → sunlight): concatenated
    spelling and phones. English compound orthography/pronunciation is exactly
    concatenation for the overwhelming majority of noun-noun compounds, so these
    are pronunciation-consistent pseudo-words that teach the model to find
    morpheme boundaries in long unseen spellings."""
    words = sorted(
        w for w, p in train.items()
        if 3 <= len(w) <= 7 and w.isalpha() and 2 <= len(p) <= 6
    )
    rng = np.random.default_rng(seed)
    out = {}
    for _ in range(n_pairs * 3):  # oversample; collisions/filters eat some
        if len(out) >= n_pairs:
            break
        a, b = words[rng.integers(len(words))], words[rng.integers(len(words))]
        if a == b:
            continue
        w = a + b
        # Skip junctions that change letter-to-sound rules at the seam: a silent
        # final e (would read as a long-vowel marker for b's onset) or a doubled
        # letter across the boundary.
        if a.endswith("e") or a[-1] == b[0]:
            continue
        if w not in out:
            out[w] = list(train[a]) + list(train[b])
    return out


def build_dataset(augment: bool = True, stress: bool = True, compounds: int = 0, seed: int = 0):
    gold = dict(VENDORED_LEXICON)
    merged = {**gold, **{w: p for w, p in LEXICON.items() if w not in gold}}
    # Encodability filter FIRST (matches tools/g2p_eval.py's universe): a word the
    # model can't encode must be in neither split, or held-out grading would crash
    # on np.stack and shift the published denominators.
    merged = {
        w: p
        for w, p in merged.items()
        if ng.encode_word(w) is not None and ng.encode_phonemes(p) is not None
    }
    held = {
        w: p
        for w, p in merged.items()
        if w in gold and zlib.crc32(w.encode()) % 10 == 0
    }
    train = {w: p for w, p in merged.items() if w not in held}
    if augment:
        derived = {}
        for w, phons in sorted(train.items()):
            for dw, dp in morph_derive(w, phons).items():
                # Real lexicon entries always win; never leak a held-out spelling.
                if dw not in merged and dw not in derived and dw not in held:
                    derived[dw] = dp
        train.update(derived)
    if compounds:
        for w, p in compound_derive(train, compounds, seed).items():
            if w not in merged and w not in train and w not in held:
                train[w] = p
    if stress:
        # Stress-marked targets (rule-derived — text/stress.py documents the
        # no-gold-data caveat). Morphology above ran on stressless phones (its
        # phoneme-class tables are stressless); marks go on LAST so the derived
        # spellings get stress from their own full form.
        from gonova_tts_tpu.text.stress import assign_stress

        train = {w: assign_stress(w, p) for w, p in train.items()}
        held = {w: assign_stress(w, p) for w, p in held.items()}
        # Re-filter encodability: stress marks lengthen nothing, but the stressed
        # ids must exist in the vocab (they do; belt and braces).
        train = {w: p for w, p in train.items() if ng.encode_phonemes(p) is not None}
    train_x, train_y = [], []
    for w, phons in sorted(train.items()):
        cx, cy = ng.encode_word(w), ng.encode_phonemes(phons)
        if cx is None or cy is None:
            continue
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
    ap.add_argument("--save-path", default=None,
                    help="weights npz destination (default: the vendored path); "
                    "use g2p_weights_e2.npz / _e3.npz for ensemble members")
    ap.add_argument("--no-stress", action="store_true",
                    help="train stressless targets (pre-round-3 behavior)")
    ap.add_argument("--compounds", type=int, default=0,
                    help="add N sampled two-word pseudo-compounds to the train set")
    ap.add_argument("--avg-tail", type=float, default=0.0,
                    help="Polyak-average the weights over the last FRACTION of steps")
    ap.add_argument("--d-model", type=int, default=ng.D_MODEL)
    ap.add_argument("--d-ff", type=int, default=ng.D_FF)
    ap.add_argument("--enc-layers", type=int, default=ng.ENC_LAYERS)
    ap.add_argument("--dec-layers", type=int, default=ng.DEC_LAYERS)
    args = ap.parse_args()

    x, y, held = build_dataset(
        stress=not args.no_stress, compounds=args.compounds, seed=args.seed
    )
    print(f"train pairs: {len(x)}, held-out: {len(held)}", flush=True)

    params = ng.init(
        jax.random.PRNGKey(args.seed), d_model=args.d_model, d_ff=args.d_ff,
        enc_layers=args.enc_layers, dec_layers=args.dec_layers,
    )
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
    avg_sum, n_avg = None, 0
    avg_from = int(args.steps * (1.0 - args.avg_tail))
    for i in range(args.steps):
        idx = rng.integers(0, n, size=min(args.batch, n))
        params, opt_state, l = step(params, opt_state, jnp.asarray(x[idx]), jnp.asarray(y[idx]))
        if args.avg_tail > 0 and i >= avg_from and (i - avg_from) % 20 == 0:
            avg_sum = (
                jax.tree.map(jnp.copy, params)
                if avg_sum is None
                else jax.tree.map(jnp.add, avg_sum, params)
            )
            n_avg += 1
        if i % 250 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(l):.4f}", flush=True)
    if n_avg:
        params = jax.tree.map(lambda a: a / n_avg, avg_sum)
        print(f"tail-averaged {n_avg} snapshots from step {avg_from}", flush=True)

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
    preds = [ng.decode_ids(pred_ids[i]) for i in range(len(words))]
    neural = grade([(preds[i], held[w]) for i, w in enumerate(words)])
    report = {"held_out_neural": neural}
    if not args.no_stress:
        from gonova_tts_tpu.text.stress import strip_stress

        report["held_out_neural_stressless"] = grade(
            [(strip_stress(preds[i]), strip_stress(held[w])) for i, w in enumerate(words)]
        )
        base_ok = [
            i for i, w in enumerate(words)
            if strip_stress(preds[i]) == strip_stress(held[w])
        ]
        report["stress_acc_given_phonemes"] = round(
            sum(preds[i] == held[words[i]] for i in base_ok) / max(len(base_ok), 1), 4
        )
    lts_refs = {w: strip_stress(held[w]) for w in words} if not args.no_stress else held
    report["held_out_lts_stressless"] = grade(
        [(_word_to_phonemes_lts(w.replace("'", "")), lts_refs[w]) for w in words]
    )
    print(json.dumps(report), flush=True)

    if not args.no_save:
        dest = args.save_path or ng.WEIGHTS_PATH
        ng.save_weights(params, dest)
        print(f"saved {dest} ({os.path.getsize(dest) // 1024} KiB)")


if __name__ == "__main__":
    main()
