"""Stress assignment (text/stress.py) + stress-aware frontend plumbing."""

import numpy as np

from gonova_tts_tpu.text import frontend, g2p, symbols
from gonova_tts_tpu.text.stress import (
    FUNCTION_WORDS,
    assign_stress,
    primary_stress_syllable,
    strip_stress,
)


def test_symbols_ids_stable_with_stress_extension():
    """Stressed vowels are APPENDED: every pre-stress id keeps its meaning (the
    vendored acoustic checkpoint + g2p weights depend on it)."""
    assert symbols.SYMBOLS.index("AA") < symbols.SYMBOLS.index("AA0")
    # Pre-stress prefix unchanged: [specials, punctuation, phonemes...]
    base = [symbols.PAD, symbols.BOS, symbols.EOS, symbols.WORD_SEP]
    assert symbols.SYMBOLS[: len(base)] == base
    stressless_end = len(base) + len(symbols.PUNCTUATION) + len(symbols.PHONEMES)
    assert symbols.SYMBOLS[stressless_end:] == symbols.STRESSED_VOWELS
    assert symbols.n_symbols() <= 256  # still fits the padded vocab


def test_assign_strip_roundtrip():
    phones = ["HH", "AH", "L", "OW"]
    stressed = assign_stress("hello", phones)
    assert strip_stress(stressed) == phones
    # Exactly one primary stress.
    assert sum(p.endswith("1") for p in stressed) == 1
    # Idempotent on already-stressed input.
    assert assign_stress("hello", stressed) == stressed


def test_function_words_unstressed():
    for w, phones in (("the", ["DH", "AH"]), ("of", ["AH", "V"]), ("to", ["T", "UW"])):
        assert w in FUNCTION_WORDS
        out = assign_stress(w, phones)
        assert not any(p.endswith("1") for p in out), (w, out)


def test_content_monosyllable_primary():
    out = assign_stress("dog", ["D", "AO", "G"])
    assert out == ["D", "AO1", "G"]


def test_suffix_rules():
    # -tion → penult; 'information' = IH N F ER M EY SH AH N (4 syllables).
    phones = ["IH", "N", "F", "ER", "M", "EY", "SH", "AH", "N"]
    assert primary_stress_syllable("information", phones) == 2  # the EY
    out = assign_stress("information", phones)
    assert out[5] == "EY1"
    assert out[0] == "IH2"  # secondary on the initial syllable
    # -ity → antepenult; 'ability' AH B IH L AH T IY.
    phones = ["AH", "B", "IH", "L", "AH", "T", "IY"]
    assert primary_stress_syllable("ability", phones) == 1
    # -ee → final.
    assert primary_stress_syllable("trainee", ["T", "R", "EY", "N", "IY"]) == 1


def test_disyllable_default_initial():
    out = assign_stress("window", ["W", "IH", "N", "D", "OW"])
    assert out[1] == "IH1" and out[4] == "OW0"


def test_frontend_stress_gate(monkeypatch):
    """Default OFF: ids unchanged vs the pre-stress contract. Enabled: stressed
    ids appear, and both token streams have equal length."""
    text = "Hello world."
    base = frontend.text_to_ids(text)
    assert base == frontend.text_to_ids(text, with_stress=False)
    stressed = frontend.text_to_ids(text, with_stress=True)
    assert len(stressed) == len(base)
    stressless_count = 4 + len(symbols.PUNCTUATION) + len(symbols.PHONEMES)
    assert any(i >= stressless_count for i in stressed)
    assert not any(i >= stressless_count for i in base)
    # Module-level gate honored.
    frontend.set_stress(True)
    try:
        assert frontend.text_to_ids(text) == stressed
    finally:
        frontend.set_stress(False)
    assert frontend.text_to_ids(text) == base


def test_word_to_phonemes_stress_paths():
    # Lexicon hit, stress requested → rule-assigned marks.
    out = g2p.word_to_phonemes("water", with_stress=True)
    assert strip_stress(out) == g2p.word_to_phonemes("water")
    assert sum(p.endswith("1") for p in out) == 1
    # Stressless call strips whatever the neural path might emit.
    plain = g2p.word_to_phonemes("water")
    assert not any(p and p[-1] in "012" for p in plain)


def test_corpus_renders_stressed_tokens(tmp_path):
    """synth_corpus must render stress-marked vowels as their base vowel (same
    audio), so a stress-enabled frontend can drive the same corpus."""
    from gonova_tts_tpu.train.synth_corpus import DEFAULT_SPEAKERS, token_segment

    a = token_segment("AA", DEFAULT_SPEAKERS[0], 120.0, 1024, 24000)
    b = token_segment("AA1", DEFAULT_SPEAKERS[0], 120.0, 1024, 24000)
    np.testing.assert_array_equal(a, b)
