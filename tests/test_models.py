"""Model stack tests: shapes, masking invariants, jit-compilability, and the
length-regulator contract (SURVEY.md §7 hard part #1: padding must not corrupt audio)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gonova_tts_tpu.config import ModelConfig
from gonova_tts_tpu.models import acoustic, layers, registry, speaker, tts, vocoder


@pytest.fixture(scope="module")
def cfg():
    # Small dims for fast CPU tests; same topology as production config.
    return ModelConfig(
        d_model=64,
        n_heads=2,
        d_ff=128,
        encoder_layers=2,
        decoder_layers=2,
        speaker_dim=32,
        upsample_initial_channel=32,
        vocab_size=64,
        n_mels=80,
        vocoder_family="hifigan",
    )


@pytest.fixture(scope="module")
def params(cfg):
    return tts.init(jax.random.PRNGKey(0), cfg)


def _inputs(cfg, b=2, l=16, seed=1):
    rng = np.random.default_rng(seed)
    tokens = jnp.asarray(rng.integers(1, 40, size=(b, l)), jnp.int32)
    lengths = jnp.asarray([l, l // 2])[:b]
    mask = (jnp.arange(l)[None, :] < lengths[:, None]).astype(jnp.float32)
    tokens = tokens * mask.astype(jnp.int32)
    spk = jnp.asarray(rng.standard_normal((b, cfg.speaker_dim)), jnp.float32)
    exagg = jnp.asarray([0.5, 0.0])[:b]
    return tokens, mask, spk, exagg


# ---------------------------------------------------------------- layers


def test_layernorm_normalizes():
    p = layers.layernorm_init(16)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 16)) * 5 + 3, jnp.float32)
    y = layers.layernorm(p, x)
    np.testing.assert_allclose(np.asarray(y.mean(-1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.std(-1)), 1.0, atol=1e-2)


def test_conv1d_transpose_exact_upsample():
    rng = jax.random.PRNGKey(0)
    p = layers.conv1d_init(rng, 8, 4, 16)
    x = jnp.ones((2, 10, 8))
    y = layers.conv1d_transpose(p, x, stride=8)
    assert y.shape == (2, 80, 4)


def test_conv1d_transpose_matches_manual_dilated_conv():
    """Transposed conv == zero-stuffed (lhs-dilated) conv with flipped kernel."""
    rng = jax.random.PRNGKey(1)
    k, s, cin, cout = 4, 2, 3, 5
    p = layers.conv1d_init(rng, cin, cout, k)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 6, cin)), jnp.float32)
    y = layers.conv1d_transpose(p, x, stride=s)
    pad = (k - s) // 2
    # lax.conv_transpose(transpose_kernel=False) == lhs-dilated conv with the SAME
    # (unflipped) kernel and the adjusted padding.
    ref = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(1,),
        padding=[(k - 1 - pad, k - 1 - pad)],
        lhs_dilation=(s,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )[:, : 6 * s, :] + p["b"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)


def test_mha_mask_blocks_padding():
    rng = jax.random.PRNGKey(0)
    p = layers.mha_init(rng, 32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 32)), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0]], jnp.float32)
    y1 = layers.mha(p, x, 4, mask)
    # Change padded positions' content — valid outputs must not change.
    x2 = x.at[:, 4:].set(99.0)
    y2 = layers.mha(p, x2, 4, mask)
    np.testing.assert_allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]), atol=1e-5)


# ---------------------------------------------------------------- length regulator


def test_length_regulate_expansion():
    enc = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    dur = jnp.asarray([[2, 1, 3, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0]], jnp.float32)
    out = acoustic.length_regulate(enc, dur, mask, max_frames=8)
    idx = np.asarray(out["token_idx"][0])
    np.testing.assert_array_equal(idx[:6], [0, 0, 1, 2, 2, 2])
    assert float(out["total_frames"][0]) == 6
    np.testing.assert_array_equal(np.asarray(out["frame_mask"][0]), [1, 1, 1, 1, 1, 1, 0, 0])
    # Expanded frames copy the right encoder rows; padding frames are zeroed.
    np.testing.assert_allclose(np.asarray(out["frames"][0, 0]), np.asarray(enc[0, 0]))
    np.testing.assert_allclose(np.asarray(out["frames"][0, 3]), np.asarray(enc[0, 2]))
    np.testing.assert_allclose(np.asarray(out["frames"][0, 7]), 0.0)


def test_length_regulate_overflow_clamped():
    enc = jnp.ones((1, 2, 4))
    dur = jnp.asarray([[5, 5]], jnp.int32)
    mask = jnp.ones((1, 2))
    out = acoustic.length_regulate(enc, dur, mask, max_frames=6)
    # total=10 > max_frames=6: mask covers all 6 frames, no OOB index.
    assert np.asarray(out["frame_mask"]).sum() == 6
    assert np.asarray(out["token_idx"]).max() <= 1


# ---------------------------------------------------------------- acoustic model


@pytest.mark.slow
def test_acoustic_shapes(cfg, params):
    tokens, mask, spk, exagg = _inputs(cfg)
    out = acoustic.forward(params["acoustic"], tokens, mask, spk, exagg, cfg)
    b, l = tokens.shape
    t = l * cfg.max_frames_per_token
    assert out["mel"].shape == (b, t, cfg.n_mels)
    assert out["frame_mask"].shape == (b, t)
    assert out["durations"].shape == (b, l)
    assert np.isfinite(np.asarray(out["mel"])).all()


def test_acoustic_padding_invariance(cfg, params):
    """Changing token values in padded positions must not change valid output."""
    tokens, mask, spk, exagg = _inputs(cfg)
    out1 = acoustic.forward(params["acoustic"], tokens, mask, spk, exagg, cfg)
    tokens2 = jnp.where(mask.astype(bool), tokens, 63)  # scribble on padding
    out2 = acoustic.forward(params["acoustic"], tokens2, mask, spk, exagg, cfg)
    fm = np.asarray(out1["frame_mask"])[..., None].astype(bool)
    np.testing.assert_allclose(
        np.asarray(out1["mel"]) * fm, np.asarray(out2["mel"]) * fm, atol=1e-4
    )


def test_acoustic_teacher_durations(cfg, params):
    tokens, mask, spk, exagg = _inputs(cfg)
    dur = jnp.full(tokens.shape, 2, jnp.int32)
    out = acoustic.forward(params["acoustic"], tokens, mask, spk, exagg, cfg, durations=dur)
    expected = np.asarray((dur * mask.astype(jnp.int32)).sum(axis=-1))
    np.testing.assert_array_equal(np.asarray(out["total_frames"]), expected)


@pytest.mark.slow
def test_exaggeration_changes_output(cfg, params):
    tokens, mask, spk, _ = _inputs(cfg, b=1, l=16)
    out0 = acoustic.forward(params["acoustic"], tokens, mask, spk, jnp.asarray([0.0]), cfg)
    out1 = acoustic.forward(params["acoustic"], tokens, mask, spk, jnp.asarray([1.0]), cfg)
    assert not np.allclose(np.asarray(out0["mel"]), np.asarray(out1["mel"]), atol=1e-6)


# ---------------------------------------------------------------- vocoder


def test_vocoder_upsample_factor(cfg):
    assert vocoder.upsample_factor(cfg) == 256 == cfg.hop_length


@pytest.mark.slow
def test_vocoder_shapes(cfg, params):
    mel = jnp.zeros((2, 32, cfg.n_mels))
    wav = vocoder.forward(params["vocoder"], mel, cfg)
    assert wav.shape == (2, 32 * 256)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0  # tanh range


@pytest.mark.slow
def test_vocoder_locality(cfg, params):
    """Vocoder is convolutional: a mel change at frame f must not affect samples far
    outside f's receptive field (no global leakage)."""
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 64, cfg.n_mels)), jnp.float32)
    wav1 = np.asarray(vocoder.forward(params["vocoder"], mel, cfg))
    mel2 = mel.at[0, 60].add(10.0)
    wav2 = np.asarray(vocoder.forward(params["vocoder"], mel2, cfg))
    # Samples corresponding to frames 0..8 (well before frame 60) must be untouched.
    np.testing.assert_allclose(wav1[0, : 8 * 256], wav2[0, : 8 * 256], atol=1e-4)
    # And the region at frame 60 must change.
    assert not np.allclose(wav1[0, 60 * 256 : 61 * 256], wav2[0, 60 * 256 : 61 * 256], atol=1e-4)


@pytest.mark.slow
def test_discriminators_run(cfg, params):
    wav = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4096)), jnp.float32)
    mpd = vocoder.mpd_init(jax.random.PRNGKey(3), width=0.25)
    for logits, feats in vocoder.mpd_apply(mpd, wav):
        assert np.isfinite(np.asarray(logits)).all()
        assert len(feats) == 6  # 5 conv levels + post (paper topology)
    msd = vocoder.msd_init(jax.random.PRNGKey(4), width=0.25)
    for logits, feats in vocoder.msd_apply(msd, wav):
        assert np.isfinite(np.asarray(logits)).all()


# ---------------------------------------------------------------- speaker encoder


@pytest.mark.slow
def test_speaker_embedding_normalized(cfg, params):
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((2, 100, cfg.n_mels)), jnp.float32)
    mask = jnp.ones((2, 100))
    emb = speaker.forward(params["speaker"], mel, mask)
    assert emb.shape == (2, cfg.speaker_dim)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(emb, axis=-1)), 1.0, atol=1e-5)


@pytest.mark.slow
def test_speaker_mask_invariance(cfg, params):
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, 100, cfg.n_mels)), jnp.float32)
    mask = jnp.concatenate([jnp.ones((1, 50)), jnp.zeros((1, 50))], axis=1)
    e1 = speaker.forward(params["speaker"], mel, mask)
    mel2 = mel.at[:, 50:].set(77.0)
    e2 = speaker.forward(params["speaker"], mel2, mask)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-3)


# ---------------------------------------------------------------- full pipeline


def test_pipeline_jit_compiles_and_runs(cfg, params):
    tokens, mask, spk, exagg = _inputs(cfg)

    fn = jax.jit(lambda p, t, m, s, e: tts.synthesize(p, t, m, s, e, cfg))
    out = fn(params, tokens, mask, spk, exagg)
    b, l = tokens.shape
    assert out["audio"].shape == (b, l * cfg.max_frames_per_token * 256)
    assert np.isfinite(np.asarray(out["audio"])).all()
    # Samples beyond total_samples are exactly zero (masked).
    a = np.asarray(out["audio"])
    ts = np.asarray(out["total_samples"])
    assert np.all(a[1, ts[1] :] == 0.0)


@pytest.mark.slow
def test_pipeline_bf16_runs(cfg, params):
    tokens, mask, spk, exagg = _inputs(cfg)
    out = tts.synthesize(params, tokens, mask, spk, exagg, cfg, dtype=jnp.bfloat16)
    assert out["audio"].dtype == jnp.float32  # outputs always f32
    assert np.isfinite(np.asarray(out["audio"])).all()


def test_registry():
    fams = registry.available()
    assert {"novaspeech", "novagan", "novaspk", "novatts"} <= set(fams)
    assert registry.get("novatts").kind == "pipeline"
    with pytest.raises(KeyError):
        registry.get("nope")


def test_fused_predictors_match_separate(cfg, params):
    """predictors_apply_fused must equal two predictor_apply calls exactly."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, cfg.d_model)), jnp.float32)
    mask = jnp.asarray([[1] * 16, [1] * 9 + [0] * 7], jnp.float32)
    p = params["acoustic"]
    dur_sep = acoustic.predictor_apply(p["dur_pred"], x, mask)
    pitch_sep = acoustic.predictor_apply(p["pitch_pred"], x, mask)
    dur_f, pitch_f = acoustic.predictors_apply_fused(p["dur_pred"], p["pitch_pred"], x, mask)
    np.testing.assert_allclose(np.asarray(dur_f), np.asarray(dur_sep), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pitch_f), np.asarray(pitch_sep), atol=1e-5)


# ---------------------------------------------------------------- fused acoustic path


@pytest.mark.slow
def test_acoustic_pallas_forward_matches_xla(cfg):
    """acoustic.forward with the fused transformer-stack kernel (interpret mode on
    CPU) matches the pure-XLA path end-to-end."""
    fcfg = cfg.model_copy(update={"acoustic_pallas": True})
    p = acoustic.init(jax.random.PRNGKey(3), cfg)
    tokens, mask, spk, exagg = _inputs(cfg)
    ref = acoustic.forward(p, tokens, mask, spk, exagg, cfg, dtype=jnp.float32)
    ours = acoustic.forward(p, tokens, mask, spk, exagg, fcfg, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ours["mel"]), np.asarray(ref["mel"]), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_array_equal(
        np.asarray(ours["durations"]), np.asarray(ref["durations"])
    )
