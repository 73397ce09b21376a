"""Training data pipeline + loop tests: manifest → batches → descending loss →
checkpoint → engine restore (the full train→serve cycle)."""

import os

import numpy as np
import pytest

from gonova_tts_tpu.audio.pitch import estimate_f0, f0_to_feature
from gonova_tts_tpu.config import Config, ModelConfig
from gonova_tts_tpu.train.data import (
    ManifestDataset,
    _uniform_durations,
    load_manifest,
    make_batch,
    prepare_example,
)
from gonova_tts_tpu.utils import write_wav


def tiny_mcfg() -> ModelConfig:
    return ModelConfig(
        d_model=64, n_heads=2, d_ff=128, encoder_layers=1, decoder_layers=1,
        speaker_dim=32, upsample_initial_channel=32, vocos_dim=128, vocos_ff=256,
        vocos_layers=2, vocab_size=64, compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def manifest(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    lines = []
    texts = ["Hello there world.", "The quick brown fox jumps.", "Testing data pipelines."]
    for i, text in enumerate(texts):
        sr = 24000
        t = np.arange(int(1.2 * sr)) / sr
        f = 140 + 40 * i
        audio = (0.4 * np.sin(2 * np.pi * f * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(
            np.float32
        )
        path = str(tmp / f"ex{i}.wav")
        write_wav(path, audio, sr)
        lines.append(f"{path}|{text}")
    mpath = str(tmp / "manifest.txt")
    with open(mpath, "w") as f:
        f.write("\n".join(lines) + "\n# comment line\n")
    return mpath


# ---------------------------------------------------------------- pitch


def test_f0_estimates_tone_frequency():
    sr = 24000
    t = np.arange(sr) / sr
    audio = 0.5 * np.sin(2 * np.pi * 220.0 * t).astype(np.float64)
    f0 = estimate_f0(audio, sr)
    voiced = f0[f0 > 0]
    assert len(voiced) > len(f0) * 0.8
    assert abs(np.median(voiced) - 220.0) < 5.0


def test_f0_silence_unvoiced():
    f0 = estimate_f0(np.zeros(24000), 24000)
    assert np.all(f0 == 0.0)


def test_f0_feature_mapping():
    f0 = np.asarray([0.0, 220.0, 440.0], np.float32)
    feat = f0_to_feature(f0)
    assert feat[0] == 0.0
    assert feat[1] == pytest.approx(0.0, abs=1e-6)
    assert feat[2] == pytest.approx(np.log(2.0), rel=1e-5)


# ---------------------------------------------------------------- data


def test_load_manifest(manifest):
    entries = load_manifest(manifest)
    assert len(entries) == 3
    assert all("wav" in e and "text" in e for e in entries)


def test_uniform_durations():
    dur = _uniform_durations(5, 23, cap=8)
    assert dur.sum() == 23
    assert dur.min() >= 1 and dur.max() <= 8
    # Over-cap total gets clamped.
    dur = _uniform_durations(2, 100, cap=8)
    assert dur.sum() == 16


def test_prepare_example(manifest):
    cfg = tiny_mcfg()
    e0 = load_manifest(manifest)[0]
    ex = prepare_example(e0["wav"], e0["text"], cfg)
    assert ex.mel.shape[1] == cfg.n_mels
    assert len(ex.audio) == ex.mel.shape[0] * cfg.hop_length
    assert len(ex.pitch_frames) == ex.mel.shape[0]
    assert len(ex.tokens) > 4


def test_make_batch_static_shapes(manifest):
    cfg = tiny_mcfg()
    entries = load_manifest(manifest)
    examples = [prepare_example(e["wav"], e["text"], cfg) for e in entries]
    batch = make_batch(examples, cfg, token_buckets=(32, 64))
    b, bucket = batch["tokens"].shape
    assert b == 3
    assert bucket in (32, 64)
    assert batch["mel"].shape == (3, bucket * cfg.max_frames_per_token, cfg.n_mels)
    assert batch["audio"].shape[1] == batch["mel"].shape[1] * cfg.hop_length
    # frame_mask matches durations.
    np.testing.assert_array_equal(
        batch["frame_mask"].sum(axis=1), batch["durations"].sum(axis=1)
    )


def test_dataset_epoch_batches(manifest):
    cfg = tiny_mcfg()
    ds = ManifestDataset(manifest, cfg, batch_size=2, token_buckets=(32, 64))
    batches = list(ds.epoch(0))
    assert len(batches) >= 1
    for b in batches:
        assert b["tokens"].shape[0] == 2


# ---------------------------------------------------------------- loop


@pytest.mark.slow
def test_training_descends_and_checkpoints(manifest, tmp_path):
    from gonova_tts_tpu.train.loop import train

    cfg = Config()
    cfg.model = tiny_mcfg()
    metrics = train(
        config=cfg,
        manifest=manifest,
        steps=8,
        batch_size=2,
        lr=1e-4,
        checkpoint_dir=str(tmp_path / "ckpt"),
        checkpoint_every=100,
    )
    assert np.isfinite(metrics["total"])
    ckpts = os.listdir(tmp_path / "ckpt")
    assert any(c.startswith("step_") for c in ckpts)


@pytest.mark.slow
def test_engine_restores_trained_checkpoint(manifest, tmp_path):
    """Full cycle: train → checkpoint → engine serves from it."""
    from gonova_tts_tpu.engine import TTSEngine
    from gonova_tts_tpu.train.loop import train

    cfg = Config()
    cfg.model = tiny_mcfg()
    train(config=cfg, steps=2, batch_size=2, lr=1e-4,
          checkpoint_dir=str(tmp_path / "ckpt"), checkpoint_every=100)
    step_dir = os.path.join(tmp_path, "ckpt", "step_00000002")
    cfg2 = Config()
    cfg2.model = tiny_mcfg()
    cfg2.model.model_path = step_dir
    cfg2.engine.warmup_shapes = [[1, 32]]
    eng = TTSEngine(cfg2)
    eng.load(warmup=False)
    out = eng.synthesize_batch(["Restored model check."])[0]
    assert len(out) > 0 and np.isfinite(out).all()


def test_checkpoint_npz_roundtrip(tmp_path):
    """Compact .npz checkpoint: save f16, restore f32, same tree incl. list levels."""
    import jax

    from gonova_tts_tpu.models import tts
    from gonova_tts_tpu.train.checkpoint import restore_params, save_params_npz

    cfg = tiny_mcfg()
    params = jax.jit(lambda k: tts.init(k, cfg))(jax.random.PRNGKey(0))
    path = save_params_npz(str(tmp_path / "demo.npz"), params)
    restored = restore_params(path)
    pl = jax.tree_util.tree_leaves_with_path(params)
    rl = jax.tree_util.tree_leaves_with_path(restored)
    assert len(pl) == len(rl)
    for (kp, a), (kr, b) in zip(pl, rl):
        assert kp == kr
        assert b.dtype == np.float32
        np.testing.assert_allclose(np.asarray(a), b, atol=2e-3, rtol=2e-3)


def test_checkpoint_meta_roundtrip_and_engine_stress_guard(tmp_path):
    """ADVICE r3: stress mode is a property of the checkpoint, not a process-global
    env toggle. Saves record it (npz + orbax), load_meta reads it back, and
    engine.load replays it into the frontend when mismatched."""
    import jax

    from gonova_tts_tpu.engine import TTSEngine
    from gonova_tts_tpu.models import tts
    from gonova_tts_tpu.text import frontend
    from gonova_tts_tpu.train.checkpoint import (
        load_meta,
        restore_params,
        save_params,
        save_params_npz,
    )

    cfg = tiny_mcfg()
    params = jax.jit(lambda k: tts.init(k, cfg))(jax.random.PRNGKey(0))

    orig = frontend.stress_enabled()
    try:
        frontend.set_stress(True)
        npz = save_params_npz(str(tmp_path / "m.npz"), params)
        step_dir = save_params(str(tmp_path / "r"), params, step=3)
        assert load_meta(npz) == {"format_version": 1, "stress": True}
        assert load_meta(step_dir)["stress"] is True
        assert load_meta(str(tmp_path / "r"))["stress"] is True  # root resolves
        # The reserved meta key must not leak into the restored tree.
        restored = restore_params(npz)
        assert len(jax.tree_util.tree_leaves(restored)) == len(
            jax.tree_util.tree_leaves(params)
        )

        # Engine restores the checkpoint's stress mode over the ambient toggle.
        frontend.set_stress(False)
        cfg2 = Config()
        cfg2.model = tiny_mcfg()
        cfg2.model.model_path = npz
        cfg2.engine.warmup_shapes = []
        eng = TTSEngine(cfg2)
        eng.load(warmup=False)
        assert frontend.stress_enabled() is True
    finally:
        frontend.set_stress(orig)


def test_checkpoint_without_meta_leaves_stress_alone(tmp_path):
    """Pre-metadata checkpoints (e.g. the vendored round-3 demo) must not flip
    the frontend mode."""
    import numpy
    from gonova_tts_tpu.train.checkpoint import load_meta

    numpy.savez_compressed(str(tmp_path / "bare.npz"), **{"a/w": numpy.zeros((2,))})
    assert load_meta(str(tmp_path / "bare.npz")) == {}


def test_restore_params_resolves_training_root(tmp_path):
    """restore_params('<root>') descends to the newest step_NNNNNNNN dir."""
    import jax

    from gonova_tts_tpu.models import tts
    from gonova_tts_tpu.train.checkpoint import restore_params, save_params

    cfg = tiny_mcfg()
    params = jax.jit(lambda k: tts.init(k, cfg))(jax.random.PRNGKey(1))
    save_params(str(tmp_path / "r"), params, step=7)
    restored = restore_params(str(tmp_path / "r"))
    a = jax.tree_util.tree_leaves(params)[0]
    b = jax.tree_util.tree_leaves(restored)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_synth_corpus_deterministic_and_aligned(tmp_path):
    """Formant corpus: byte-identical regeneration; exactly 4 frames per token."""
    import hashlib

    from gonova_tts_tpu.text import text_to_ids
    from gonova_tts_tpu.train import synth_corpus

    cfg = ModelConfig()
    sents = ("A dog.", "Go now!")
    m1 = synth_corpus.generate_corpus(
        str(tmp_path / "c1"), cfg, sentences=sents,
        speakers=synth_corpus.DEFAULT_SPEAKERS[:1])
    m2 = synth_corpus.generate_corpus(
        str(tmp_path / "c2"), cfg, sentences=sents,
        speakers=synth_corpus.DEFAULT_SPEAKERS[:1])
    h = lambda p: hashlib.md5(open(p, "rb").read()).hexdigest()
    assert h(str(tmp_path / "c1/spk_low_00.wav")) == h(str(tmp_path / "c2/spk_low_00.wav"))
    wav, ids = synth_corpus.synthesize_utterance(sents[0], synth_corpus.DEFAULT_SPEAKERS[0], cfg)
    assert len(wav) == len(ids) * synth_corpus.FRAMES_PER_TOKEN * cfg.hop_length
    assert ids == text_to_ids(sents[0])


def test_make_batch_speaker_and_silence_padding(manifest):
    """Speaker embeddings flow into batches; mel padding is the silence encoding."""
    from gonova_tts_tpu.train.data import silence_mel

    cfg = tiny_mcfg()
    fake_emb = np.arange(cfg.speaker_dim, dtype=np.float32)
    ds = ManifestDataset(manifest, cfg, batch_size=2,
                         speaker_fn=lambda wav, sr: fake_emb)
    batch = next(iter(ds.epoch(0)))
    assert np.allclose(batch["speaker"][0], fake_emb)
    sil = silence_mel(cfg)
    assert sil.shape == (cfg.n_mels,)
    # Padded frames (mask 0) carry the silence vector, not zeros.
    i, t = 0, int(batch["frame_mask"][0].sum())
    if t < batch["mel"].shape[1]:
        np.testing.assert_allclose(batch["mel"][i, -1], sil, atol=1e-6)
        assert not np.allclose(sil, 0.0)


def test_vendored_demo_checkpoint_restores():
    """assets/checkpoints/demo_ema_f16.npz must restore to the production model's
    exact param tree (the serve path accepts it via model_path)."""
    import os

    import jax
    import numpy as np

    from gonova_tts_tpu.config import ModelConfig
    from gonova_tts_tpu.models import tts
    from gonova_tts_tpu.train.checkpoint import restore_params

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "checkpoints", "demo_ema_f16.npz",
    )
    assert os.path.exists(path), "vendored demo checkpoint missing"
    params = restore_params(path)
    ref = jax.eval_shape(lambda: tts.init(jax.random.PRNGKey(0), ModelConfig()))
    got = jax.tree_util.tree_map(lambda x: np.shape(x), params)
    want = jax.tree_util.tree_map(lambda x: tuple(x.shape), ref)
    assert got == want


def test_make_batch_short_audio_more_tokens_than_frames(tmp_path):
    """Regression: a clip with fewer mel frames than tokens used to crash the
    collate (uniform durations floored at 1 frame/token overshot the mel)."""
    sr = 24000
    cfg = tiny_mcfg()
    audio = 0.3 * np.sin(2 * np.pi * 180 * np.arange(int(0.08 * sr)) / sr).astype(np.float32)
    path = str(tmp_path / "short.wav")
    write_wav(path, audio, sr)
    ex = prepare_example(path, "a much longer text than this tiny clip can cover", cfg)
    assert len(ex.tokens) > ex.mel.shape[0]
    batch = make_batch([ex], cfg)
    assert int(batch["durations"].sum()) == int(batch["frame_mask"].sum())
    assert int(batch["durations"].sum()) <= ex.mel.shape[0]


def test_manifest_aligner_durations_used(tmp_path):
    """The documented third manifest field (external-aligner durations) must reach
    the training targets (regression: parsed but silently discarded)."""
    sr = 24000
    cfg = tiny_mcfg()
    audio = 0.3 * np.sin(2 * np.pi * 160 * np.arange(int(1.0 * sr)) / sr).astype(np.float32)
    path = str(tmp_path / "al.wav")
    write_wav(path, audio, sr)
    probe = prepare_example(path, "Hi there.", cfg)
    n_tok = len(probe.tokens)
    durs = [2] * n_tok
    mpath = str(tmp_path / "m.txt")
    with open(mpath, "w") as f:
        f.write(f"{path}|Hi there.|{' '.join(str(d) for d in durs)}\n")
    ds = ManifestDataset(mpath, cfg, batch_size=1)
    batch = next(iter(ds.epoch(0)))
    assert list(batch["durations"][0, :n_tok]) == durs


def test_partial_batch_pad_rows_are_masked(tmp_path):
    """Regression: the final partial batch repeated its last example as LIVE rows,
    multiplying that utterance's gradient weight; pad rows must carry zero masks."""
    sr = 24000
    cfg = tiny_mcfg()
    audio = 0.3 * np.sin(2 * np.pi * 150 * np.arange(int(1.0 * sr)) / sr).astype(np.float32)
    path = str(tmp_path / "p.wav")
    write_wav(path, audio, sr)
    mpath = str(tmp_path / "m.txt")
    with open(mpath, "w") as f:
        f.write(f"{path}|Only one example here.\n")
    ds = ManifestDataset(mpath, cfg, batch_size=4)
    batch = next(iter(ds.epoch(0)))
    assert batch["token_mask"][0].sum() > 0
    assert batch["token_mask"][1:].sum() == 0
    assert batch["frame_mask"][1:].sum() == 0


def test_manifest_rejects_unknown_extra_field(tmp_path):
    """Regression: a typo'd extra field used to be silently consumed as the
    durations column (flipping the run out of learned alignment, or crashing
    far away in int()); it must fail at parse time with the line number."""
    mpath = str(tmp_path / "bad.txt")
    with open(mpath, "w") as f:
        f.write("a.wav|Hello.|speaker=spk1\n")
    with pytest.raises(ValueError, match="bad.txt:1"):
        load_manifest(mpath)
    # Space-joined integers still parse as durations.
    with open(mpath, "w") as f:
        f.write("a.wav|Hello.|3 4 5\n")
    assert load_manifest(mpath)[0]["durations"] == "3 4 5"


def test_make_batch_rejects_overlong_audio_for_alignment():
    """Regression: audio beyond bucket*max_frames_per_token was silently cut
    while all tokens stayed, corrupting every MAS duration target."""
    from gonova_tts_tpu.train.data import Example

    cfg = tiny_mcfg()
    t_cap = 32 * cfg.max_frames_per_token
    t = t_cap + 10
    e = Example(
        tokens=np.arange(1, 5, dtype=np.int32),
        mel=np.zeros((t, cfg.n_mels), np.float32),
        pitch_frames=np.zeros((t,), np.float32),
        audio=np.zeros((t * cfg.hop_length,), np.float32),
        align_mel=np.zeros((t, cfg.n_mels), np.float32),
    )
    with pytest.raises(ValueError, match="corrupt alignment"):
        make_batch([e], cfg, token_buckets=(32,), learn_alignment=True)


def test_learn_alignment_requires_manifest():
    """Forcing --learn-alignment with synthetic batches must fail with a clear
    message, not a KeyError deep in the loss at trace time."""
    from gonova_tts_tpu.train.loop import train

    cfg = Config()
    cfg.model = tiny_mcfg()
    with pytest.raises(ValueError, match="learn-alignment requires"):
        train(config=cfg, steps=1, learn_alignment=True)


def test_ema_debias_removes_init_bias():
    """Zero-seeded EMA + debias must return exactly the (constant) params after
    any number of updates; the old params-seeded shadow kept decay^t of the
    phase-start weights in every checkpoint (~37% of RANDOM INIT at t=1000)."""
    import jax.numpy as jnp

    from gonova_tts_tpu.train import step as tstep

    p = {"w": jnp.full((4,), 2.5)}
    decay = 0.999
    ema = tstep.ema_init_zeros(p)
    for _ in range(50):
        ema = tstep.ema_update(ema, p, decay)
    fixed = tstep.ema_debias(ema, decay, 50)
    np.testing.assert_allclose(np.asarray(fixed["w"]), 2.5, rtol=1e-5)
    # The raw zero-seeded shadow alone is badly biased at small t...
    assert float(ema["w"][0]) < 0.2
    # ...and the old params-seeded scheme keeps decay^t of the init around.
    legacy = tstep.ema_init({"w": jnp.zeros((4,))})
    for _ in range(50):
        legacy = tstep.ema_update(legacy, p, decay)
    assert abs(float(legacy["w"][0]) - 2.5) > 0.1


def test_f0_no_octave_doubling_with_strong_second_harmonic():
    """Regression: the biased (lag-tapered) autocorrelation tilted argmax toward
    the half-period peak — an 80 Hz voice with a strong 2nd harmonic read as
    160 Hz, corrupting every training pitch target."""
    sr = 24000
    t = np.arange(3 * sr) / sr
    x = 0.5 * np.sin(2 * np.pi * 80 * t) + 0.45 * np.sin(2 * np.pi * 160 * t)
    f0 = estimate_f0(x, sr)
    v = f0[f0 > 0]
    assert len(v) > 0.8 * len(f0)
    assert abs(np.median(v) - 80.0) < 4.0


def test_f0_low_pitch_is_voiced():
    """Regression: the implicit (N-lag)/N taper capped a clean 60 Hz tone's
    normalized peak at ~0.61-with-noise-below-threshold, so low-pitched frames
    were systematically marked unvoiced."""
    sr = 24000
    t = np.arange(2 * sr) / sr
    y = 0.5 * np.sin(2 * np.pi * 60 * t)
    f0 = estimate_f0(y, sr)
    v = f0[f0 > 0]
    assert len(v) > 0.8 * len(f0)
    assert abs(np.median(v) - 60.0) < 3.0


def test_generate_corpus_guards():
    """Holdout-leak + separator guards: the ref clip must never embed held-out
    audio (it conditions every training example), and '|' in sentence text would
    silently mis-split the manifest."""
    from gonova_tts_tpu.train.synth_corpus import DEFAULT_SENTENCES, generate_corpus

    with pytest.raises(ValueError, match="no training sentences"):
        generate_corpus("/tmp/never_written", holdout=len(DEFAULT_SENTENCES))
    with pytest.raises(ValueError, match="must not contain"):
        generate_corpus("/tmp/never_written", sentences=("a | b",), holdout=0)


def test_scalable_corpus_pools():
    """make_sentences/make_speakers: deterministic, unique, and the held-out
    tail (last two default sentences) is IDENTICAL at every corpus size so the
    generalization study's held-out numbers stay comparable across sizes."""
    from gonova_tts_tpu.train.synth_corpus import (
        DEFAULT_SENTENCES, DEFAULT_SPEAKERS, make_sentences, make_speakers,
        rate_for_text,
    )

    s48, s120 = make_sentences(48), make_sentences(120)
    assert s48 == make_sentences(48)  # deterministic
    assert len(set(s120)) == 120  # unique
    assert s48[-2:] == s120[-2:] == DEFAULT_SENTENCES[-2:]  # fixed held-out tail
    assert s48[:-2] == s120[: len(s48) - 2]  # train side is a prefix
    assert make_sentences(5) == DEFAULT_SENTENCES[:5]
    sp = make_speakers(10)
    assert sp[:4] == DEFAULT_SPEAKERS and len({s.name for s in sp}) == 10
    f0s = [s.f0 for s in sp[4:]]
    assert all(90.0 < f < 290.0 for f in f0s) and f0s == sorted(f0s)
    # Per-sentence tempo is deterministic and bounded.
    r = rate_for_text(s120[0])
    assert r == rate_for_text(s120[0]) and 0.75 <= r <= 1.30


def test_corpus_meta_roundtrip(tmp_path):
    """generate_corpus writes corpus_meta.json; load_corpus_meta reconstructs
    the exact generation parameters (the eval tools' ground-truth source)."""
    from gonova_tts_tpu.train.synth_corpus import (
        generate_corpus, load_corpus_meta, make_sentences, make_speakers,
        utterance_durations,
    )
    from gonova_tts_tpu.text import text_to_ids

    cfg = ModelConfig()
    sents, spks = make_sentences(3), make_speakers(2)
    generate_corpus(str(tmp_path / "c"), cfg, sentences=sents, speakers=spks,
                    variable=True, holdout=1, rate_variation=True)
    meta = load_corpus_meta(str(tmp_path / "c"))
    assert tuple(meta["sentences"]) == sents
    assert tuple(meta["speakers"]) == spks
    assert meta["variable"] and meta["rate_variation"] and meta["holdout"] == 1
    # Pre-meta corpora fall back to the defaults.
    legacy = load_corpus_meta(str(tmp_path))
    assert len(legacy["sentences"]) == 12 and not legacy["variable"]
    # rate_variation scales the ground-truth durations the meta flag gates:
    # total length tracks the per-sentence tempo within per-token rounding.
    from gonova_tts_tpu.train.synth_corpus import make_sentences as _ms, rate_for_text

    text = next(t for t in _ms(40) if abs(rate_for_text(t) - 1.0) > 0.15)
    ids = text_to_ids(text)
    base = utterance_durations(ids, text)
    rated = utterance_durations(ids, text, rate_variation=True)
    assert all(d >= 1 for d in rated)
    ratio = sum(rated) / sum(base)
    assert abs(ratio - rate_for_text(text)) < 0.1


def test_jitter_floor_tool(tmp_path):
    """tools/jitter_floor.py: both floors computed, positive, and the salted
    rendition differs from ground truth (alt-jitter floor > 0) while the
    salt leaves token ids untouched (len ratios stay near 1)."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    from gonova_tts_tpu.train import synth_corpus

    cfg = ModelConfig()
    sents = ("A dog ran.", "Go now!", "She saw him.", "We ate pie.")
    synth_corpus.generate_corpus(
        str(tmp_path / "c"), cfg, sentences=sents,
        speakers=synth_corpus.DEFAULT_SPEAKERS[:2], variable=True, holdout=2,
    )
    repo = Path(__file__).resolve().parents[1]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, str(repo / "tools" / "jitter_floor.py"),
         "--corpus", str(tmp_path / "c")],
        capture_output=True, text=True, cwd=repo, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n_utterances"] == 4  # 2 speakers x 2 held-out sentences
    assert out["floor_alt_jitter_mel_l1"] > 0.1
    assert out["floor_mean_dur_mel_l1"] > 0.1
    assert 0.7 < out["alt_len_ratio"] < 1.3
    assert 0.7 < out["mean_len_ratio"] < 1.3


def test_jitter_salt_changes_durations_only(tmp_path):
    """jitter_salt yields a different iid realization of the same tokens."""
    from gonova_tts_tpu.text import text_to_ids
    from gonova_tts_tpu.train.synth_corpus import utterance_durations

    ids = text_to_ids("The quick brown fox jumps over the lazy dog.")
    a = utterance_durations(ids, "t", jitter_salt="")
    b = utterance_durations(ids, "t", jitter_salt="\x00altseed")
    assert len(a) == len(b) == len(ids)
    assert a != b  # different realization
    # Same class-conditional ranges: means within the jitter spread.
    import numpy as np
    assert abs(float(np.mean(a)) - float(np.mean(b))) < 1.5
