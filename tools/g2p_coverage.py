"""Effective pronunciation coverage on natural English prose.

Counts how running-text tokens resolve through the frontend's tiers:
lexicon hit > morphological decomposition (text/morph.py) > neural G2P > LTS.
The lexicon+morph share is the fraction of tokens with EXACT (hand-vetted or
rule-exact) pronunciations — the user-audible coverage number that the
reference gets implicitly from its external full-vocabulary checkpoint
(reference: services/tts/core/synthesizer.py:344-350).

Usage: python tools/g2p_coverage.py [--list-misses] [textfile]
Prints one JSON line; --list-misses also prints the words that fell through.
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gonova_tts_tpu.text import morph  # noqa: E402
from gonova_tts_tpu.text.g2p import LEXICON  # noqa: E402
from gonova_tts_tpu.text.normalize import normalize_text  # noqa: E402

# ~600 words of varied-register prose (news, narrative, technical, conversational)
# written for this harness; tokens are graded after the real normalize pass.
SAMPLE = """
The committee announced yesterday that construction of the new bridge would begin
in early spring, despite objections raised by several residents who worried about
increased traffic and noise. Engineers explained that the design includes wider
walkways, protected cycling lanes, and improved lighting, and they promised the
work would be finished within eighteen months.

She remembered the summers of her childhood, when the family drove north along the
coast, stopping at small towns where fishermen sold their morning catch directly
from the boats. Her grandfather told stories about storms he had survived, his
voice growing quieter as the evening light faded. The children listened, wrapped
in blankets, while waves broke gently against the rocks below.

Modern speech synthesis systems convert written text into audible speech through
several processing stages. First the text is normalized: numbers, dates, and
abbreviations are expanded into words. Next a pronunciation model maps each word
onto a sequence of phonemes, handling exceptions and unfamiliar names. Finally an
acoustic model generates a waveform, often running on specialized hardware that
performs billions of operations per second.

Honestly, I wasn't expecting much when we tried the newest restaurant downtown,
but the cooking surprised everybody. The vegetables tasted fresher than anything
I'd eaten in months, the bread arrived warm, and the desserts disappeared almost
immediately. We're definitely going back next weekend, assuming we can get a
reservation, because apparently the place is already fully booked most evenings.

Researchers studying migration patterns reported that the birds travelled farther
this year than previously recorded, crossing mountains and deserts without
resting. Their findings, published last week, suggest that warming temperatures
are shifting the timing of seasonal journeys. Conservation groups responded
quickly, calling for stronger protections and expanded funding for monitoring
programs across the hemisphere.

The quarterly report shows revenue climbing steadily, driven largely by
subscriptions and international sales. Management expects continued growth,
although analysts remain cautious about rising costs and tighter competition.
Several departments are hiring aggressively, particularly engineering and
customer support, while others are consolidating their operations to reduce
spending wherever possible.
"""

_WORD_RE = re.compile(r"[a-z']+")


def classify(word: str) -> str:
    if word in LEXICON:
        return "lexicon"
    if morph.decompose(word, LEXICON) is not None:
        return "morph"
    try:
        from gonova_tts_tpu.text import neural_g2p

        if neural_g2p.available():
            return "neural"
    except Exception:
        pass
    return "lts"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("textfile", nargs="?")
    ap.add_argument("--list-misses", action="store_true")
    args = ap.parse_args()
    text = open(args.textfile, encoding="utf-8").read() if args.textfile else SAMPLE

    tokens = []
    for sent in text.split("\n"):
        norm = normalize_text(sent)
        tokens.extend(_WORD_RE.findall(norm.lower()))

    tiers = collections.Counter()
    misses = collections.Counter()
    for t in tokens:
        tier = classify(t)
        tiers[tier] += 1
        if tier in ("neural", "lts"):
            misses[t] += 1

    n = max(sum(tiers.values()), 1)
    uniq = len(set(tokens))
    exact = (tiers["lexicon"] + tiers["morph"]) / n
    print(
        json.dumps(
            {
                "tokens": n,
                "unique": uniq,
                "lexicon": round(tiers["lexicon"] / n, 4),
                "morph": round(tiers["morph"] / n, 4),
                "neural_or_lts": round((tiers["neural"] + tiers["lts"]) / n, 4),
                "exact_coverage": round(exact, 4),
            }
        )
    )
    if args.list_misses and misses:
        print("misses:", " ".join(w for w, _ in misses.most_common()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
