"""Neural G2P (text/neural_g2p.py): vocab codecs, JAX-vs-numpy inference equality,
weights IO, and the g2p.word_to_phonemes fallback wiring."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gonova_tts_tpu.text import neural_g2p as ng


def test_encode_word_roundtrip_and_limits():
    assert ng.encode_word("hello") is not None
    assert ng.encode_word("o'clock") is not None
    assert ng.encode_word("") is None
    assert ng.encode_word("x" * (ng.MAX_CHARS + 1)) is None
    assert ng.encode_word("héllo") is None  # unencodable char


def test_encode_phonemes_roundtrip():
    phons = ["HH", "AH", "L", "OW"]
    ids = ng.encode_phonemes(phons)
    assert ids is not None
    assert ng.decode_ids(ids) == phons


def test_numpy_inference_matches_jax_greedy():
    params = ng.init(jax.random.PRNGKey(3))
    for word in ("hello", "synthesis", "folded"):
        chars = ng.encode_word(word)
        jax_ids = np.asarray(ng.greedy_decode(params, jnp.asarray(chars[None])))[0]
        np_ids = ng._np_predict(params, chars)
        # Compare decoded phoneme prefixes (numpy stops at EOS; jax fills beyond).
        assert ng.decode_ids(np_ids) == ng.decode_ids(jax_ids), word


def test_weights_roundtrip(tmp_path):
    params = ng.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "w.npz")
    ng.save_weights(params, path)
    loaded = ng.load_weights(path)
    a, _ = jax.tree_util.tree_flatten(params)
    b, _ = jax.tree_util.tree_flatten(loaded)
    assert len(a) == len(b)
    # f16 storage: equality within half-precision rounding.
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=2e-3, atol=2e-3)


def test_predict_word_uses_weights(tmp_path, monkeypatch):
    params = ng.init(jax.random.PRNGKey(1))
    path = str(tmp_path / "w.npz")
    ng.save_weights(params, path)
    monkeypatch.setattr(ng, "WEIGHTS_PATH", path)
    with ng._LOCK:
        ng._WORD_CACHE.clear()
        ng._PARAMS.clear()
    out = ng.predict_word("zyxgleb")
    assert out is None or all(isinstance(p, str) for p in out)
    # Env kill-switch: no neural result even with weights present.
    monkeypatch.setenv("TTS_NEURAL_G2P", "0")
    with ng._LOCK:
        ng._WORD_CACHE.clear()
        ng._PARAMS.clear()
    assert not ng.available()


def test_word_cache_bounded(tmp_path, monkeypatch):
    """The OOV memo must not grow without bound on client-controlled text
    (unique nonsense words): oldest entries evict past the cap."""
    params = ng.init(jax.random.PRNGKey(2))
    path = str(tmp_path / "w.npz")
    ng.save_weights(params, path)
    monkeypatch.setattr(ng, "WEIGHTS_PATH", path)
    monkeypatch.setattr(ng, "_WORD_CACHE_MAX", 8)
    with ng._LOCK:
        ng._WORD_CACHE.clear()
        ng._PARAMS.clear()
    words = [f"zq{chr(97 + i)}xel" for i in range(20)]  # letters only (encodable)
    for w in words:
        ng.predict_word(w)
    with ng._LOCK:
        assert len(ng._WORD_CACHE) <= 8
        # Newest entries survive, oldest are gone.
        assert words[-1] in ng._WORD_CACHE
        assert words[0] not in ng._WORD_CACHE
        ng._WORD_CACHE.clear()
        ng._PARAMS.clear()


def test_g2p_fallback_never_raises(monkeypatch):
    # Whatever the neural path does (missing weights, junk weights), text processing
    # must stay alive through the LTS fallback.
    from gonova_tts_tpu.text import g2p

    monkeypatch.setattr(ng, "WEIGHTS_PATH", "/nonexistent/g2p_weights.npz")
    with ng._LOCK:
        ng._WORD_CACHE.clear()
        ng._PARAMS.clear()
    phons = g2p.word_to_phonemes("zyxgleb")
    assert phons and all(isinstance(p, str) for p in phons)


@pytest.mark.skipif(not os.path.exists(ng.WEIGHTS_PATH), reason="no vendored weights")
def test_predict_word_params_not_shadowed_by_weights_slot():
    """Regression: the weights used to live in the same dict as the word memo under
    the key 'params', so the English word 'params' returned the weights pytree."""
    with ng._LOCK:
        ng._WORD_CACHE.clear()
        ng._PARAMS.clear()
    out = ng.predict_word("params")
    assert out is None or (
        isinstance(out, list) and all(p in set(ng._PHON_TO_ID) for p in out)
    ), f"predict_word('params') leaked non-phoneme data: {type(out)}"

    from gonova_tts_tpu.text import g2p

    phons = g2p.word_to_phonemes("params")
    assert phons and all(isinstance(p, str) and p in set(ng._PHON_TO_ID) for p in phons)


@pytest.mark.skipif(not os.path.exists(ng.WEIGHTS_PATH), reason="no vendored weights")
def test_vendored_weights_decode_known_words():
    with ng._LOCK:
        ng._WORD_CACHE.clear()
        ng._PARAMS.clear()
    out = ng.predict_word("hello")
    assert out, "vendored weights must produce a nonempty pronunciation"
    assert all(p in set(ng._PHON_TO_ID) for p in out)


def test_tree_skeleton_matches_init_structure():
    """load_weights rebuilds the param tree from _tree_skeleton (init() costs ~30
    XLA compiles — it tripped first-call service timeouts). The two must stay
    structurally identical or vendored weights would unflatten into wrong slots."""
    import jax

    ref = jax.tree_util.tree_structure(ng.init(jax.random.PRNGKey(0)))
    sk = jax.tree_util.tree_structure(ng._tree_skeleton())
    assert ref == sk


def test_ensemble_siblings_loaded_and_decodable(tmp_path, monkeypatch):
    """predict_word scores the beam with the ensemble average when _e2/_e3
    sibling weights sit next to the primary npz; a lone primary still works."""
    p1 = ng.init(jax.random.PRNGKey(3))
    p2 = ng.init(jax.random.PRNGKey(4))
    path = str(tmp_path / "w.npz")
    ng.save_weights(p1, path)
    ng.save_weights(p2, str(tmp_path / "w_e2.npz"))
    monkeypatch.setattr(ng, "WEIGHTS_PATH", path)
    with ng._LOCK:
        ng._WORD_CACHE.clear()
        ng._PARAMS.clear()
    models = ng._get_models()
    assert models is not None and len(models) == 2
    out = ng.predict_word("ensembleword")
    assert out is None or all(isinstance(p, str) for p in out)
    with ng._LOCK:
        ng._WORD_CACHE.clear()
        ng._PARAMS.clear()
