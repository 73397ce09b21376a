"""Morphological decomposition for out-of-lexicon inflected forms.

The vendored lexicon (text/data/lexicon.tsv) is lemma-heavy: "walk" is present,
"walked"/"walking"/"walks" usually are not. Rather than sending every inflected
form to the neural G2P (62.7% held-out exact), this layer strips a productive
English suffix, looks the lemma up in the lexicon, and applies the
phonologically-conditioned suffix pronunciation — giving EXACT pronunciations
for the entire inflectional paradigm of every lexicon lemma.

Sits between the lexicon and the neural fallback in g2p.word_to_phonemes:
lexicon hit > morph decomposition > neural G2P > LTS rules.

Handled (with orthographic reversals: e-drop, y→i, CVC doubling, ie→y):
  -s/-es/-ies/'s/s'  plural / 3sg / possessive   (Z / S / IH Z by final phoneme)
  -ed/-ied           past                         (D / T / IH D)
  -ing/-ying         progressive                  (IH NG)
  -er/-ier           comparative / agent          (ER)
  -est/-iest         superlative                  (IH S T)
  -ly/-ily/-(l)y     adverb                       (L IY; -ily → AH L IY;
                                                   C+le lemma → drop AH L, + L IY)
  -ness/-ment/-ful/-less/-able  productive derivation

Counterpart of the implicit full-vocabulary coverage the reference inherits from
its external 0.5B checkpoint (reference: services/tts/core/synthesizer.py:344-350);
lexical exceptions ("wicked", "stronger") are pinned in the lexicon itself, which
is consulted first.
"""

from __future__ import annotations

from typing import Dict, List, Optional

# Final-phoneme classes conditioning the -s and -ed allomorphs.
_SIBILANTS = {"S", "Z", "SH", "ZH", "CH", "JH"}
_VOICELESS = {"P", "T", "K", "F", "TH", "S", "SH", "CH", "HH"}


def _plural_suffix(last: str) -> List[str]:
    if last in _SIBILANTS:
        return ["IH", "Z"]
    if last in _VOICELESS:
        return ["S"]
    return ["Z"]


def _past_suffix(last: str) -> List[str]:
    if last in ("T", "D"):
        return ["IH", "D"]
    if last in _VOICELESS:
        return ["T"]
    return ["D"]


def _is_doubled(stem: str) -> bool:
    return len(stem) >= 2 and stem[-1] == stem[-2] and stem[-1] not in "aeiou"


def _lemma_candidates(stem: str, restore_e: bool = True) -> List[str]:
    """Orthographic reversals for a suffix-stripped stem, best-first.

    For CVC stems ("hop" from "hoping") the e-restored lemma is tried FIRST:
    single consonant after a single vowel before a vowel-initial suffix implies
    e-drop ("hoping"→"hope"); a true short-vowel lemma would have doubled
    ("hopping"→"hopp"→"hop").
    """
    cands: List[str] = []
    if _is_doubled(stem):
        cands.append(stem[:-1])  # stopp → stop
        cands.append(stem)  # fell → fell (doubled letter is part of the lemma)
        return cands
    cvc = (
        len(stem) >= 3
        and stem[-1] not in "aeiouwxy"
        and stem[-2] in "aeiou"
        and stem[-3] not in "aeiou"
    )
    if restore_e and cvc:
        cands.append(stem + "e")  # hop → hope
        cands.append(stem)
    else:
        cands.append(stem)
        if restore_e:
            cands.append(stem + "e")  # consum → consume
    return cands


def decompose(
    word: str, lexicon: Dict[str, List[str]], _depth: int = 0
) -> Optional[List[str]]:
    """Return phonemes for `word` via lemma lookup + suffix rule, or None."""
    w = word
    # Possessives first; they stack on any base form.
    if w.endswith("'s"):
        base = lexicon.get(w[:-2])
        if base is None and _depth < 2:
            base = decompose(w[:-2], lexicon, _depth=_depth + 1)
        if base:
            return list(base) + _plural_suffix(base[-1])
        return None
    if w.endswith("s'"):
        base = lexicon.get(w[:-1])
        if base is None and _depth < 2:
            base = decompose(w[:-1], lexicon, _depth=_depth + 1)
        return list(base) if base else None
    if "'" in w or len(w) < 4:
        return None

    # --- plural / 3sg -s -----------------------------------------------------
    if w.endswith("ies") and len(w) >= 5:
        base = lexicon.get(w[:-3] + "y")
        if base:
            return list(base) + _plural_suffix(base[-1])
    if w.endswith("men") and len(w) >= 6:
        base = lexicon.get(w[:-3] + "man")  # fishermen → fisherman
        if base and base[-3:] == ["M", "AE", "N"]:
            return list(base[:-3]) + ["M", "EH", "N"]
        if base and base[-3:] == ["M", "AH", "N"]:
            return list(base[:-3]) + ["M", "EH", "N"]
    if w.endswith("s") and not w.endswith("ss"):
        base = lexicon.get(w[:-1])
        if base and len(w[:-1]) >= 2:
            return list(base) + _plural_suffix(base[-1])
        if w.endswith("es"):
            base = lexicon.get(w[:-2])
            if base and len(w[:-2]) >= 2:
                return list(base) + _plural_suffix(base[-1])
        # Plural/3sg stacks OUTSIDE every other suffix: researchers → researcher
        # → research+ER; paintings → painting → paint+IH NG.
        if _depth < 2:
            inner = decompose(w[:-1], lexicon, _depth=_depth + 1)
            if inner:
                return inner + _plural_suffix(inner[-1])

    # --- past -ed --------------------------------------------------------------
    if w.endswith("ied") and len(w) >= 5:
        base = lexicon.get(w[:-3] + "y")
        if base:
            return list(base) + _past_suffix(base[-1])
    if w.endswith("ed"):
        for cand in _lemma_candidates(w[:-2]):
            base = lexicon.get(cand)
            if base and len(cand) >= 3:
                return list(base) + _past_suffix(base[-1])

    # --- progressive -ing -------------------------------------------------------
    if w.endswith("ying") and len(w) >= 5:
        base = lexicon.get(w[:-4] + "ie")  # dying → die
        if base:
            return list(base) + ["IH", "NG"]
    if w.endswith("ing") and len(w) >= 5:
        for cand in _lemma_candidates(w[:-3]):
            base = lexicon.get(cand)
            # "us"/"is"-style function words never inflect; 2-letter lemmas
            # are allowlisted ("being", "going", "doing").
            if base and (len(cand) >= 3 or cand in ("be", "go", "do")):
                return list(base) + ["IH", "NG"]

    # --- comparative / agent -er, superlative -est ------------------------------
    if w.endswith("ier") and len(w) >= 5:
        base = lexicon.get(w[:-3] + "y")
        if base:
            return list(base) + ["ER"]
    if w.endswith("iest") and len(w) >= 6:
        base = lexicon.get(w[:-4] + "y")
        if base:
            return list(base) + ["IH", "S", "T"]
    if w.endswith("er") and len(w) >= 5:
        for cand in _lemma_candidates(w[:-2]):
            base = lexicon.get(cand)
            if base and len(cand) >= 3:
                return list(base) + ["ER"]
    if w.endswith("est") and len(w) >= 6:
        for cand in _lemma_candidates(w[:-3]):
            base = lexicon.get(cand)
            if base and len(cand) >= 3:
                return list(base) + ["IH", "S", "T"]

    # --- adverbial -ly -----------------------------------------------------------
    if w.endswith("ily") and len(w) >= 5:
        base = lexicon.get(w[:-3] + "y")
        if base:  # happy → happily: final IY reduces to AH
            head = list(base[:-1]) if base[-1] == "IY" else list(base)
            return head + ["AH", "L", "IY"]
    if w.endswith("ly") and len(w) >= 5:
        base = lexicon.get(w[:-2])
        if base is None and w[-3] == "l":
            base = lexicon.get(w[:-2] + "l")  # fully → full (degemination)
        if base and len(w[:-2]) >= 3:
            return list(base) + ["L", "IY"]
        base = lexicon.get(w[:-1] + "e")  # probably → probable, simply → simple
        if base and base[-2:] == ["AH", "L"]:
            return list(base[:-2]) + ["L", "IY"]

    # --- productive derivation ----------------------------------------------------
    for suf, phs, y_restore in (
        ("ness", ["N", "AH", "S"], True),
        ("ment", ["M", "AH", "N", "T"], False),
        ("ful", ["F", "AH", "L"], True),
        ("less", ["L", "AH", "S"], True),
        ("able", ["AH", "B", "AH", "L"], False),
    ):
        if w.endswith(suf) and len(w) >= len(suf) + 3:
            stem = w[: -len(suf)]
            base = lexicon.get(stem)
            if base is None and y_restore and stem.endswith("i"):
                base = lexicon.get(stem[:-1] + "y")
            if base is None and suf == "able":
                base = lexicon.get(stem + "e")  # lovable → love
            if base and len(stem) >= 3:
                return list(base) + phs

    # --- productive prefixes (tried last; suffixed remainders recurse) ----------
    for pre, pre_phs in _PREFIXES:
        if w.startswith(pre) and len(w) >= len(pre) + 3:
            rest = w[len(pre) :]
            base = lexicon.get(rest)
            if base is None and _depth < 2:
                base = decompose(rest, lexicon, _depth=_depth + 1)
            if base:
                return list(pre_phs) + list(base)
    return None


_PREFIXES = (
    ("under", ["AH", "N", "D", "ER"]),
    ("over", ["OW", "V", "ER"]),
    ("super", ["S", "UW", "P", "ER"]),
    ("inter", ["IH", "N", "T", "ER"]),
    ("anti", ["AE", "N", "T", "IY"]),
    ("non", ["N", "AA", "N"]),
    ("dis", ["D", "IH", "S"]),
    ("mis", ["M", "IH", "S"]),
    ("out", ["AW", "T"]),
    ("pre", ["P", "R", "IY"]),
    ("un", ["AH", "N"]),
    ("re", ["R", "IY"]),
)
