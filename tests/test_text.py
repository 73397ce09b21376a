"""Text frontend tests: segmentation parity with the reference semantics
(services/tts/core/synthesizer.py:48-99), normalization, G2P, tokenization."""

import numpy as np
import pytest

from gonova_tts_tpu.text import (
    PAD_ID,
    batch_to_bucket,
    n_symbols,
    normalize_text,
    number_to_words,
    ordinal_to_words,
    pad_to_bucket,
    split_into_sentences,
    text_to_ids,
    text_to_phonemes,
    word_to_phonemes,
    year_to_words,
)
from gonova_tts_tpu.text.symbols import PHONEMES, SYMBOLS, decode, encode


# ------------------------------------------------------- segmentation (reference parity)


def test_split_empty():
    assert split_into_sentences("") == []
    assert split_into_sentences("   ") == []


def test_split_simple_sentences():
    out = split_into_sentences("Hello world. This is a test. Goodbye!")
    assert out == ["Hello world.", "This is a test.", "Goodbye!"]


def test_split_requires_uppercase_after_boundary():
    # Reference regex only splits when next char is uppercase.
    out = split_into_sentences("version 2. is out. Try it.")
    assert out == ["version 2. is out.", "Try it."]


def test_split_abbreviation_guard():
    out = split_into_sentences("Dr. Smith met Mr. Jones in the U.S. Senate. They left.")
    assert out == ["Dr. Smith met Mr. Jones in the U.S. Senate.", "They left."]


def test_split_initials_kept_joined():
    out = split_into_sentences("J. K. Rowling wrote it. I read it.")
    assert out == ["J. K. Rowling wrote it.", "I read it."]


def test_split_guard_spares_standalone_words():
    """Regression: 'no'/'max'/'sec' etc. are common sentence-final WORDS — the guard
    must not treat them as abbreviations and merge real boundaries."""
    assert split_into_sentences("She said no. We left at once.") == [
        "She said no.",
        "We left at once.",
    ]
    assert split_into_sentences("The gauge hit its max. Then it dropped.") == [
        "The gauge hit its max.",
        "Then it dropped.",
    ]
    # ...but title abbreviations before capitalized names stay guarded.
    assert split_into_sentences("Gen. MacArthur arrived. We left.") == [
        "Gen. MacArthur arrived.",
        "We left.",
    ]
    assert split_into_sentences("Rep. Pelosi spoke. Then voting began.") == [
        "Rep. Pelosi spoke.",
        "Then voting began.",
    ]


def test_split_abbrev_guard_off_matches_reference_fallback():
    out = split_into_sentences("Dr. Smith waved. Bye.", abbrev_guard=False)
    assert out == ["Dr.", "Smith waved.", "Bye."]


def test_split_exclamation_always_splits():
    out = split_into_sentences("Stop Mr. Jones! Now.")
    assert out == ["Stop Mr. Jones!", "Now."]


def test_split_long_sentence_on_commas():
    long = (
        "This is a very long sentence that keeps going and going, "
        "it has several clauses separated by commas, "
        "and each of them is fairly long on its own, "
        "so the splitter must cut it into chunks under the limit."
    )
    out = split_into_sentences(long, max_chars=150)
    assert len(out) >= 2
    # Greedy re-merge keeps chunks under the cap whenever the parts allow it.
    assert all(len(c) <= 150 for c in out)
    # Re-joined content preserves all words.
    rejoined = " ".join(out).replace(",", "").split()
    assert rejoined == long.replace(",", "").split()


def test_split_merges_with_comma_space():
    # Parts re-merge joined by ", " exactly like the reference.
    text = "aaa bbb, ccc ddd, eee fff"
    out = split_into_sentences("x" * 0 + text, max_chars=15)
    assert out[0] == "aaa bbb"  # "aaa bbb, ccc ddd" would be 16 chars > 15
    assert out[1] == "ccc ddd"


def test_split_part_longer_than_cap_kept_whole():
    text = "b" * 200  # no commas, one sentence longer than cap
    out = split_into_sentences(text, max_chars=150, hard_max_chars=None)
    assert out == [text]


def test_hard_wrap_extension():
    words = ("word " * 200).strip()
    out = split_into_sentences(words, max_chars=150, hard_max_chars=200)
    assert all(len(c) <= 200 for c in out)
    assert " ".join(out).split() == words.split()


# ------------------------------------------------------- normalization


@pytest.mark.parametrize(
    "n,words",
    [
        (0, "zero"),
        (7, "seven"),
        (13, "thirteen"),
        (42, "forty-two"),
        (100, "one hundred"),
        (101, "one hundred one"),
        (999, "nine hundred ninety-nine"),
        (1000, "one thousand"),
        (1234, "one thousand two hundred thirty-four"),
        (1000000, "one million"),
        (2500000, "two million five hundred thousand"),
        (-5, "minus five"),
    ],
)
def test_number_to_words(n, words):
    assert number_to_words(n) == words


@pytest.mark.parametrize(
    "n,words",
    [(1, "first"), (2, "second"), (3, "third"), (4, "fourth"), (12, "twelfth"),
     (21, "twenty-first"), (30, "thirtieth"), (100, "one hundredth")],
)
def test_ordinals(n, words):
    assert ordinal_to_words(n) == words


@pytest.mark.parametrize(
    "n,words",
    [
        (1984, "nineteen eighty-four"),
        (2000, "two thousand"),
        (2005, "two thousand five"),
        (1900, "nineteen hundred"),
        (2023, "twenty twenty-three"),
        (1807, "eighteen oh seven"),
    ],
)
def test_years(n, words):
    assert year_to_words(n) == words


def test_normalize_currency():
    assert "five dollars" in normalize_text("It costs $5.")
    assert "one dollar" in normalize_text("Just $1!")
    out = normalize_text("That's $3.50 please")
    assert "three dollars and fifty cents" in out


def test_normalize_percent_decimal():
    assert "fifty percent" in normalize_text("50% off")
    assert "three point one four" in normalize_text("pi is 3.14")


def test_normalize_abbreviations():
    out = normalize_text("Dr. Smith met Mr. Jones")
    assert "doctor" in out.lower()
    assert "mister" in out.lower()


def test_normalize_unicode():
    out = normalize_text("“Hello” — it’s fine…")
    assert "“" not in out and "’" not in out and "—" not in out


def test_normalize_comma_number():
    assert "one thousand two hundred thirty-four" in normalize_text("1,234 items")


def test_normalize_year_in_context():
    assert "nineteen eighty-four" in normalize_text("Published in 1984.")


# ------------------------------------------------------- G2P


def test_lexicon_words():
    assert word_to_phonemes("the") == ["DH", "AH"]
    assert word_to_phonemes("Hello") == ["HH", "AH", "L", "OW"]


def test_lts_regular_words():
    # Regular words through the rule path produce valid phonemes.
    for w in ["cat", "dog", "ship", "string", "flute", "brick"]:
        phones = word_to_phonemes(w)
        assert len(phones) > 0
        assert all(p in PHONEMES for p in phones)


def test_lts_silent_e():
    # Rule-layer unit tests: target the LTS rules directly (word_to_phonemes may
    # route lexicon misses through the neural G2P — graded separately in aggregate
    # by tools/g2p_eval.py, not by cherry-picked words).
    from gonova_tts_tpu.text.g2p import _word_to_phonemes_lts

    assert _word_to_phonemes_lts("cake") == ["K", "EY", "K"]
    assert _word_to_phonemes_lts("bike") == ["B", "AY", "K"]


def test_lts_digraphs():
    assert word_to_phonemes("chat")[0] == "CH"
    assert word_to_phonemes("phone")[0] == "F"
    assert "NG" in word_to_phonemes("ring")


def test_lts_c_g_softening():
    from gonova_tts_tpu.text.g2p import _word_to_phonemes_lts

    assert _word_to_phonemes_lts("cent")[0] == "S"
    assert _word_to_phonemes_lts("cat")[0] == "K"
    assert _word_to_phonemes_lts("gem")[0] == "JH"
    assert _word_to_phonemes_lts("gap")[0] == "G"


def test_text_to_phonemes_includes_separators_and_punct():
    phones = text_to_phonemes("hello world.")
    assert "<sp>" in phones
    assert phones[-1] == "."


def test_every_g2p_output_is_encodable():
    phones = text_to_phonemes("the quick brown fox jumps over the lazy dog.")
    ids = encode(phones)
    assert all(0 <= i < n_symbols() for i in ids)
    # Nothing except possibly unknowns dropped: decode round-trips modulo bos/eos.
    assert decode(ids)[1:-1] == phones


# ------------------------------------------------------- tokenization / bucketing


def test_text_to_ids_nonempty():
    ids = text_to_ids("Hello world, this is a test.")
    assert len(ids) > 5


def test_pad_to_bucket():
    arr, length, bucket = pad_to_bucket([5, 6, 7], [8, 16])
    assert bucket == 8 and length == 3
    assert arr.shape == (8,)
    assert list(arr[:3]) == [5, 6, 7]
    assert all(arr[3:] == PAD_ID)


def test_batch_to_bucket_shares_bucket():
    batch, lengths, bucket = batch_to_bucket([[1] * 3, [2] * 10], [8, 16, 32])
    assert bucket == 16
    assert batch.shape == (2, 16)
    assert list(lengths) == [3, 10]


def test_symbol_table_stable():
    # The id layout is a serving contract (checkpoints depend on it).
    assert SYMBOLS[0] == "<pad>"
    assert n_symbols() < 256  # fits the padded embedding table


# ---------------------------------------------------------------- G2P accuracy


def test_vendored_lexicon_loads_and_is_valid():
    from gonova_tts_tpu.text.g2p import LEXICON, VENDORED_LEXICON
    from gonova_tts_tpu.text.symbols import PHONEMES

    assert len(VENDORED_LEXICON) > 2000
    valid = set(PHONEMES)
    for word, prons in VENDORED_LEXICON.items():
        assert prons and all(p in valid for p in prons), (word, prons)
    # Handwritten entries win on conflict.
    assert LEXICON["read"] == ["R", "IY", "D"]


def test_homograph_contextual_alternates():
    from gonova_tts_tpu.text.g2p import word_to_phonemes

    assert word_to_phonemes("read", prev="have") == ["R", "EH", "D"]
    assert word_to_phonemes("read", prev="to") == ["R", "IY", "D"]
    assert word_to_phonemes("live", nxt="music") == ["L", "AY", "V"]
    assert word_to_phonemes("live", prev="they", nxt="in") == ["L", "IH", "V"]
    assert word_to_phonemes("lead", nxt="pipe") == ["L", "EH", "D"]
    assert word_to_phonemes("wind", nxt="up") == ["W", "AY", "N", "D"]


def test_homographs_resolve_in_sentence_context():
    from gonova_tts_tpu.text.g2p import text_to_phonemes

    out = text_to_phonemes("have read")
    assert out[-3:] == ["R", "EH", "D"]
    out2 = text_to_phonemes("live music")
    assert out2[:3] == ["L", "AY", "V"]


def test_g2p_eval_gate_passes():
    """The harness gate: full-pipeline exact-match ≥90% + all homograph cases."""
    import json
    import subprocess
    import sys
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "g2p_eval.py")],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    data = json.loads(proc.stdout.strip().splitlines()[-1])
    assert data["full_pipeline"]["exact_match"] >= 0.9
    # LTS rules on held-out words: pin the floor so regressions surface.
    # Round-4 re-pin: the lexicon grew 2.5k -> 5.3k words, deliberately biased
    # toward irregulars the LTS rules mangle, so the crc32-split held-out set
    # got harder (measured LTS 0.328 exact / 0.223 PER vs 0.437/0.180 before).
    assert data["lts_held_out"]["exact_match"] >= 0.30
    assert data["lts_held_out"]["per"] <= 0.24


def test_normalize_decimal_percent_and_comma_numbers():
    """Regression: rule ordering mangled decimals — '3.5%' became
    'three.five percent' and '1,234.56' split at the comma."""
    assert (
        normalize_text("The rate rose 3.5% this year.")
        == "The rate rose three point five percent this year."
    )
    assert (
        normalize_text("It cost 1,234.56 in total.")
        == "It cost one thousand two hundred thirty-four point five six in total."
    )


def test_normalize_abbrev_period_rules():
    """An abbreviation at the TRUE end of the text keeps its period (prosodic
    boundary); anywhere else it expands bare — 'Dr. Smith' must become
    'doctor Smith', never 'doctor. Smith'."""
    assert normalize_text("Apples, pears, etc.") == "Apples, pears, et cetera."
    assert normalize_text("Dr. Smith went home") == "doctor Smith went home"
    out2 = normalize_text("We visited the dept. of records")
    assert "." not in out2


# ---------------------------------------------------------------- round-3 review fixes


def test_normalize_digits_glued_to_letters():
    """Regression: '101B' / '4x4' / '3km' digits were unreachable by the
    \\b-anchored number rules and then silently dropped by the G2P tokenizer."""
    out = normalize_text("Room 101B and a 4x4 truck, 3km away")
    assert "101" not in out and "4x4" not in out and "3km" not in out
    assert "one hundred one" in out
    assert "four x four" in out
    assert "three km" in out
    # Ordinal and plural suffixes stay glued (handled by their own rules).
    assert normalize_text("the 3rd item") == "the third item"


def test_normalize_comma_grouped_ordinal():
    """Regression: '1,000th' verbalized as 'one, zeroth'."""
    out = normalize_text("the 1,000th customer")
    assert "thousandth" in out
    assert "zeroth" not in out


def test_normalize_decade_plural():
    """Regression: '1980s' → 'nineteen eightys' (non-word, forced onto the
    neural-OOV path); must pluralize properly."""
    assert "eighties" in normalize_text("back in the 1980s")
    assert "nineties" in normalize_text("music of the 1990s")
    assert "eightys" not in normalize_text("back in the 1980s")


def test_normalize_short_decade_and_digit_plurals():
    """ADVICE r3: '90s' / '5s' stayed glued (the year rule covers only 4-digit
    years), started with a digit, and were silently dropped by the G2P tokenizer —
    that text produced NO audio. They must verbalize as proper plurals."""
    assert "nineties" in normalize_text("back in the 90s")
    assert "fives" in normalize_text("a pack of 5s")
    assert "twenties" in normalize_text("in her 20s she moved")
    # Must not regress ordinary verbalization or the year rule.
    assert "nineteen eighties" in normalize_text("the 1980s")
    out = normalize_text("the 90s")
    assert not any(ch.isdigit() for ch in out)


def test_quoted_words_hit_lexicon():
    """Regression: \"'hello'\" reached the neural model as \"'hello\" (guaranteed
    lexicon miss) instead of looking up 'hello'."""
    quoted = text_to_phonemes("'hello' she said.")
    plain = text_to_phonemes("hello she said.")
    assert quoted == plain


def test_bare_apostrophe_token_skipped():
    # An isolated apostrophe must neither emit symbols nor break word adjacency.
    a = text_to_phonemes("rock ' roll")
    b = text_to_phonemes("rock roll")
    assert a == b


def test_g2p_beam_env_zero_is_safe(monkeypatch):
    """Regression: TTS_G2P_BEAM=0 crashed the numpy beam decoder (argsort[-0:])
    on every OOV word; it must clamp to greedy."""
    from gonova_tts_tpu.text import neural_g2p

    if not neural_g2p.available():
        pytest.skip("no vendored G2P weights")
    monkeypatch.setenv("TTS_G2P_BEAM", "0")
    neural_g2p._WORD_CACHE.clear()
    out = neural_g2p.predict_word("zorblax")
    assert out is None or len(out) > 0
    monkeypatch.setenv("TTS_G2P_BEAM", "not_a_number")
    neural_g2p._WORD_CACHE.clear()
    out2 = neural_g2p.predict_word("zorblaxx")
    assert out2 is None or len(out2) > 0


def test_word_to_phonemes_neural_result_not_cache_aliased():
    """Regression: the neural path returned the cache-resident list by
    reference; a caller mutating it corrupted the memoized pronunciation."""
    from gonova_tts_tpu.text import neural_g2p
    from gonova_tts_tpu.text.g2p import word_to_phonemes

    if not neural_g2p.available():
        pytest.skip("no vendored G2P weights")
    word = "flumbastic"  # OOV -> neural path
    first = list(word_to_phonemes(word))
    got = word_to_phonemes(word)
    got.append("ZZ_MUTATION")
    again = word_to_phonemes(word)
    assert again == first


def test_oov_prepass_batches_all_oov(monkeypatch):
    """The sentence pre-pass sends every OOV word (no lexicon hit, not a
    homograph entry) to ONE batched neural decode — lexicon words never pay a
    beam search, while morph-resolvable words ARE batched because the morph
    tier arbitrates against the ensemble's reading (resolve_oov) and needs a
    decoded candidate memo-warm."""
    from gonova_tts_tpu.text import g2p, neural_g2p

    calls = []
    real = neural_g2p.predict_words

    def spy(words):
        calls.append(list(words))
        return real(words)

    monkeypatch.setattr(neural_g2p, "predict_words", spy)
    # "mousetraps" resolves via morph (compound + plural); "zregnak" is true OOV.
    g2p.text_to_phonemes("The mousetraps caught a zregnak quickly.")
    flat = [w for c in calls for w in c]
    assert "zregnak" in flat
    assert "mousetraps" in flat
    assert "the" not in flat and "quickly" not in flat
    # The FIRST call is the sentence pre-pass batching both OOV words at once
    # (later calls are per-word memo hits that decode nothing).
    assert set(calls[0]) == {"mousetraps", "zregnak"}


def test_morph_arbitration_protects_exact_classes():
    """Exact splices (inflections, compounds) are never arbitrated: morph's
    decomposition wins even when the ensemble disagrees. 'mousetraps' is a
    compound+plural whose decoded ensemble reading differs — it must resolve on
    the morph tier with the splice pronunciation."""
    from gonova_tts_tpu.text.g2p import LEXICON, resolve_oov

    pron, tier = resolve_oov("mousetraps", LEXICON)
    assert tier == "morph"
    assert pron == list(LEXICON["mouse"]) + list(LEXICON["trap"]) + ["S"]


def test_morph_arbitration_switches_on_confident_ensemble(monkeypatch):
    """A derivation-tagged morph result IS arbitrated: when the ensemble's
    reading out-scores the splice by > MORPH_ARBITRATION_TAU the neural
    pronunciation wins and the tier reports morph_arb."""
    from gonova_tts_tpu.text import g2p, neural_g2p

    if not neural_g2p.available():
        pytest.skip("no vendored G2P weights")
    # Force a confident disagreement regardless of the real model's scores.
    monkeypatch.setattr(
        neural_g2p, "predict_word", lambda w: ["T", "OW1", "T", "AH0", "L", "Z"]
    )
    monkeypatch.setattr(
        neural_g2p, "score_pronunciations", lambda w, cands: [-3.0, -0.5]
    )
    # "totals" stacks plural on derivational tot+al -> the inner derivation tag
    # propagates, so the word is arbitratable.
    lex = {"tot": ["T", "AA", "T"]}
    pron, tier = g2p.resolve_oov("totals", lex)
    assert tier == "morph_arb"
    assert pron == ["T", "OW1", "T", "AH0", "L", "Z"]
    # Below the margin: the splice is kept.
    monkeypatch.setattr(
        neural_g2p, "score_pronunciations", lambda w, cands: [-1.0, -0.8]
    )
    pron, tier = g2p.resolve_oov("totals", lex)
    assert tier == "morph"
    assert pron == ["T", "AA", "T", "AH", "L", "Z"]


def test_g2p_tier_counters():
    """Tier counters track which frontend tier resolved each word."""
    from gonova_tts_tpu.text import g2p

    before = g2p.get_tier_counts()
    g2p.word_to_phonemes("hello")          # lexicon
    g2p.word_to_phonemes("mousetraps")     # morph (compound + plural)
    g2p.word_to_phonemes("read", prev="have")  # homograph alt
    after = g2p.get_tier_counts()
    assert after["lexicon"] == before["lexicon"] + 1
    assert after["morph"] == before["morph"] + 1
    assert after["homograph"] == before["homograph"] + 1
