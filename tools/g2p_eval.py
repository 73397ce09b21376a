"""G2P accuracy harness (VERDICT.md round-1 item 7).

Grades the text frontend's pronunciation quality against the vendored gold lexicon
(gonova_tts_tpu/text/data/lexicon.tsv, ~11.1k stressless-ARPAbet entries):

  1. full-pipeline accuracy: word_to_phonemes over all gold words (lexicon hit or
     LTS) — exact match + phoneme error rate (Levenshtein / ref length);
  2. LTS-only held-out accuracy: a deterministic 10% split of the gold words graded
     through the letter-to-sound rules alone (lexicon bypassed) — the honest measure
     of what happens on unseen words;
  3. homograph spot-checks (contextual alternates).

Usage: python tools/g2p_eval.py   → one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gonova_tts_tpu.text.g2p import (  # noqa: E402
    LEXICON,
    VENDORED_LEXICON,
    _word_to_phonemes_lts,
    word_to_phonemes,
)


def edit_distance(a, b) -> int:
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])
            )
        prev = cur
    return prev[n]


def grade(pairs) -> dict:
    exact = 0
    errs = 0
    ref_len = 0
    for pred, ref in pairs:
        exact += pred == ref
        errs += edit_distance(pred, ref)
        ref_len += len(ref)
    n = max(len(pairs), 1)
    return {
        "n": len(pairs),
        "exact_match": round(exact / n, 4),
        "per": round(errs / max(ref_len, 1), 4),
    }


def main() -> None:
    gold = dict(VENDORED_LEXICON)

    # 1. Full pipeline over all gold words.
    full = grade([(word_to_phonemes(w), ref) for w, ref in gold.items()])

    # 2. LTS-only on the deterministic 10% held-out split (crc32 buckets — the
    # split never moves when the lexicon grows).
    held_out = {w: r for w, r in gold.items() if zlib.crc32(w.encode()) % 10 == 0}
    lts = grade(
        [(_word_to_phonemes_lts(w.replace("'", "")), ref) for w, ref in held_out.items()]
    )

    # 2b. Neural G2P on the same held-out split (when vendored weights exist).
    # Graded stressless AND with stress (vs the rule-derived stressed gold —
    # text/stress.py documents the no-gold-stress-data caveat: this measures how
    # well the model learned the stress RULES on unseen words).
    neural = None
    neural_stress = None
    from gonova_tts_tpu.text import neural_g2p
    from gonova_tts_tpu.text.stress import assign_stress, strip_stress

    if neural_g2p.available():
        # numpy inference path (backend-free; no jit compile through the TPU
        # tunnel). One batched call decodes the whole split.
        all_preds = neural_g2p.predict_words(sorted(held_out))
        pairs, spairs = [], []
        stress_base_ok = stress_full_ok = 0
        for w in sorted(held_out):
            pred = all_preds[w]
            if pred is None:
                continue
            gold_s = assign_stress(w, held_out[w])
            pred_plain = strip_stress(pred)
            pairs.append((pred_plain, held_out[w]))
            spairs.append((pred, gold_s))
            if pred_plain == held_out[w]:
                stress_base_ok += 1
                stress_full_ok += pred == gold_s
        neural = grade(pairs)
        if any(p and p[-1] in "012" for pred, _ in spairs for p in pred):
            neural_stress = grade(spairs)
            neural_stress["stress_acc_given_phonemes"] = round(
                stress_full_ok / max(stress_base_ok, 1), 4
            )

    # 2c. OOV-pipeline on the held-out split: what word_to_phonemes actually does
    # for a word MISSING from the lexicon — morph decomposition (arbitrated
    # against the neural ensemble when they disagree) > neural > LTS — via the
    # SAME resolve_oov the serving path runs, so this is the honest "unseen word
    # through the shipped frontend" number.
    from gonova_tts_tpu.text.g2p import resolve_oov

    # The shipped frontend's lexicon (builtin function words + vendored entries)
    # with every held-out word removed, so each held-out word is genuinely OOV to
    # the decomposition pass while its LEMMA (a different key) can still resolve.
    lexicon_sans = {k: v for k, v in LEXICON.items() if k not in held_out}

    oov_pairs = []
    tier_hits = {"morph": 0, "morph_arb": 0, "neural": 0, "lts": 0}
    for w in sorted(held_out):
        pred, tier = resolve_oov(w, lexicon_sans)
        tier_hits[tier] += 1
        oov_pairs.append((strip_stress(pred), held_out[w]))
    oov = grade(oov_pairs)
    n_held = max(len(held_out), 1)
    oov["morph_share"] = round((tier_hits["morph"] + tier_hits["morph_arb"]) / n_held, 4)
    oov["morph_arb_share"] = round(tier_hits["morph_arb"] / n_held, 4)

    # 3. Homograph spot checks (default reading + cued alternate for each).
    homo_cases = [
        ("read", "have", "", ["R", "EH", "D"]),
        ("read", "to", "", ["R", "IY", "D"]),
        ("live", "", "music", ["L", "AY", "V"]),
        ("live", "they", "in", ["L", "IH", "V"]),
        ("lead", "", "pipe", ["L", "EH", "D"]),
        ("lead", "will", "", ["L", "IY", "D"]),
        ("wind", "", "up", ["W", "AY", "N", "D"]),
        ("wind", "the", "", ["W", "IH", "N", "D"]),
        ("bass", "", "fishing", ["B", "AE", "S"]),
        ("bass", "the", "player", ["B", "EY", "S"]),
        ("dove", "", "into", ["D", "OW", "V"]),
        ("dove", "a", "cooed", ["D", "AH", "V"]),
        ("minute", "", "detail", ["M", "AY", "N", "UW", "T"]),
        ("minute", "a", "later", ["M", "IH", "N", "AH", "T"]),
        ("object", "to", "", ["AH", "B", "JH", "EH", "K", "T"]),
        ("object", "the", "was", ["AA", "B", "JH", "EH", "K", "T"]),
        ("present", "will", "", ["P", "R", "IH", "Z", "EH", "N", "T"]),
        ("present", "a", "for", ["P", "R", "EH", "Z", "AH", "N", "T"]),
        ("record", "to", "", ["R", "IH", "K", "AO", "R", "D"]),
        ("record", "world", "was", ["R", "EH", "K", "ER", "D"]),
        ("refuse", "of", "", ["R", "EH", "F", "Y", "UW", "S"]),
        ("refuse", "they", "", ["R", "IH", "F", "Y", "UW", "Z"]),
        ("excuse", "", "me", ["IH", "K", "S", "K", "Y", "UW", "Z"]),
        ("excuse", "an", "for", ["IH", "K", "S", "K", "Y", "UW", "S"]),
        ("wound", "", "up", ["W", "AW", "N", "D"]),
        ("wound", "the", "healed", ["W", "UW", "N", "D"]),
        ("content", "is", "", ["K", "AH", "N", "T", "EH", "N", "T"]),
        ("content", "the", "of", ["K", "AA", "N", "T", "EH", "N", "T"]),
        ("conduct", "of", "", ["K", "AA", "N", "D", "AH", "K", "T"]),
        ("conduct", "they", "", ["K", "AH", "N", "D", "AH", "K", "T"]),
        ("graduate", "will", "from", ["G", "R", "AE", "JH", "UW", "EY", "T"]),
        ("graduate", "a", "of", ["G", "R", "AE", "JH", "UW", "AH", "T"]),
        ("separate", "", "rooms", ["S", "EH", "P", "ER", "AH", "T"]),
        ("separate", "please", "the", ["S", "EH", "P", "ER", "EY", "T"]),
        ("subject", "the", "was", ["S", "AH", "B", "JH", "IH", "K", "T"]),
        ("subject", "to", "", ["S", "AH", "B", "JH", "EH", "K", "T"]),
        ("convert", "to", "", ["K", "AH", "N", "V", "ER", "T"]),
        ("convert", "a", "", ["K", "AA", "N", "V", "ER", "T"]),
        ("sow", "to", "seeds", ["S", "OW"]),
        ("sow", "pregnant", "", ["S", "AW"]),
        ("alternate", "an", "route", ["AO", "L", "T", "ER", "N", "AH", "T"]),
        ("alternate", "they", "between", ["AO", "L", "T", "ER", "N", "EY", "T"]),
        ("appropriate", "an", "response", ["AH", "P", "R", "OW", "P", "R", "IY", "AH", "T"]),
        ("appropriate", "to", "funds", ["AH", "P", "R", "OW", "P", "R", "IY", "EY", "T"]),
        ("deliberate", "a", "act", ["D", "IH", "L", "IH", "B", "ER", "AH", "T"]),
        ("deliberate", "will", "on", ["D", "IH", "L", "IH", "B", "ER", "EY", "T"]),
        ("moderate", "a", "increase", ["M", "AA", "D", "ER", "AH", "T"]),
        ("moderate", "will", "debate", ["M", "AA", "D", "ER", "EY", "T"]),
        ("attribute", "an", "of", ["AE", "T", "R", "AH", "B", "Y", "UW", "T"]),
        ("attribute", "they", "it", ["AH", "T", "R", "IH", "B", "Y", "UW", "T"]),
        ("console", "to", "her", ["K", "AH", "N", "S", "OW", "L"]),
        ("console", "gaming", "", ["K", "AA", "N", "S", "OW", "L"]),
        ("duplicate", "a", "copy", ["D", "UW", "P", "L", "IH", "K", "AH", "T"]),
        ("duplicate", "to", "", ["D", "UW", "P", "L", "IH", "K", "EY", "T"]),
        ("advocate", "an", "of", ["AE", "D", "V", "AH", "K", "AH", "T"]),
        ("advocate", "they", "for", ["AE", "D", "V", "AH", "K", "EY", "T"]),
        ("associate", "to", "with", ["AH", "S", "OW", "S", "IY", "EY", "T"]),
        ("associate", "an", "professor", ["AH", "S", "OW", "S", "IY", "AH", "T"]),
        ("delegate", "a", "from", ["D", "EH", "L", "AH", "G", "AH", "T"]),
        ("delegate", "must", "tasks", ["D", "EH", "L", "AH", "G", "EY", "T"]),
        ("resume", "will", "", ["R", "IH", "Z", "UW", "M"]),
        ("resume", "my", "", ["R", "EH", "Z", "AH", "M", "EY"]),
    ]
    homo_ok = sum(
        word_to_phonemes(w, prev=p, nxt=n) == ref for w, p, n, ref in homo_cases
    )

    print(
        json.dumps(
            {
                "gold_words": len(gold),
                "full_pipeline": full,
                "lts_held_out": lts,
                "neural_held_out": neural,
                "neural_held_out_with_stress": neural_stress,
                "oov_pipeline": oov,
                "homographs_ok": f"{homo_ok}/{len(homo_cases)}",
            }
        )
    )
    # The gate: full pipeline ≥90% exact (VERDICT item 7) and homographs all pass.
    sys.exit(0 if full["exact_match"] >= 0.9 and homo_ok == len(homo_cases) else 1)


if __name__ == "__main__":
    main()
