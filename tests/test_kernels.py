"""Pallas kernel tests (interpret mode on CPU; the same kernels compile on TPU).

Oracle: the pure-JAX DSP implementations in gonova_tts_tpu/audio."""

import jax.numpy as jnp
import numpy as np
import pytest

from gonova_tts_tpu.audio import mel_spectrogram
from gonova_tts_tpu.ops import mel_spectrogram_pallas


@pytest.fixture(scope="module")
def audio(rng):
    # 2 batch, 2 s @ 24 kHz — covers multiple 128-frame blocks (187 frames).
    return jnp.asarray(rng.standard_normal((2, 48000 - 48000 % 256)).astype(np.float32) * 0.3)


def test_fused_mel_matches_oracle(audio):
    ours = np.asarray(mel_spectrogram_pallas(audio, interpret=True))
    oracle = np.asarray(mel_spectrogram(audio))
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=2e-4, rtol=1e-4)


def test_fused_mel_single_example(audio):
    one = audio[0]
    ours = np.asarray(mel_spectrogram_pallas(one, interpret=True))
    oracle = np.asarray(mel_spectrogram(one))
    assert ours.ndim == 2
    np.testing.assert_allclose(ours, oracle, atol=2e-4, rtol=1e-4)


def test_fused_mel_block_boundary(rng):
    """Exactly one block (128 frames) and just over (129 frames)."""
    for frames in (128, 129):
        x = jnp.asarray(rng.standard_normal((1, frames * 256)).astype(np.float32))
        ours = np.asarray(mel_spectrogram_pallas(x, interpret=True))
        oracle = np.asarray(mel_spectrogram(x))
        assert ours.shape == (1, frames, 80)
        np.testing.assert_allclose(ours, oracle, atol=2e-4, rtol=1e-4)


def test_fused_mel_rejects_bad_hop():
    with pytest.raises(ValueError):
        mel_spectrogram_pallas(jnp.zeros((1, 1000)), n_fft=1000, hop_length=300, interpret=True)


# ---------------------------------------------------------------- ConvNeXt block


def test_fused_convnext_matches_oracle(rng):
    import jax
    import jax.numpy as jnp

    from gonova_tts_tpu.config import ModelConfig
    from gonova_tts_tpu.models import vocos
    from gonova_tts_tpu.ops import convnext_block_pallas

    cfg = ModelConfig(vocos_dim=128, vocos_ff=256, vocos_layers=1)
    params = vocos.init(jax.random.PRNGKey(0), cfg)
    blk = params["blocks"][0]
    x = jnp.asarray(rng.standard_normal((2, 300, 128)).astype(np.float32))
    oracle = np.asarray(vocos._block_apply(blk, x, jnp.float32))
    ours = np.asarray(
        convnext_block_pallas(
            x, blk["dw"], blk["dw_b"], blk["ln"]["g"], blk["ln"]["b"],
            blk["pw1"]["w"], blk["pw1"]["b"], blk["pw2"]["w"], blk["pw2"]["b"],
            blk["gamma"], interpret=True, bf16=False,
        )
    )
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_fused_convnext_tile_boundary(rng):
    """Exactly one tile (256) and just over (257 frames): halo correctness."""
    import jax
    import jax.numpy as jnp

    from gonova_tts_tpu.config import ModelConfig
    from gonova_tts_tpu.models import vocos
    from gonova_tts_tpu.ops import convnext_block_pallas

    cfg = ModelConfig(vocos_dim=128, vocos_ff=256, vocos_layers=1)
    params = vocos.init(jax.random.PRNGKey(1), cfg)
    blk = params["blocks"][0]
    for t in (256, 257):
        x = jnp.asarray(rng.standard_normal((1, t, 128)).astype(np.float32))
        oracle = np.asarray(vocos._block_apply(blk, x, jnp.float32))
        ours = np.asarray(
            convnext_block_pallas(
                x, blk["dw"], blk["dw_b"], blk["ln"]["g"], blk["ln"]["b"],
                blk["pw1"]["w"], blk["pw1"]["b"], blk["pw2"]["w"], blk["pw2"]["b"],
                blk["gamma"], interpret=True, bf16=False,
            )
        )
        np.testing.assert_allclose(ours, oracle, atol=2e-4, rtol=1e-4)


def test_vocos_forward_with_pallas_flag(rng):
    import jax
    import jax.numpy as jnp

    from gonova_tts_tpu.config import ModelConfig
    from gonova_tts_tpu.models import vocos

    cfg = ModelConfig(vocos_dim=128, vocos_ff=256, vocos_layers=2)
    params = vocos.init(jax.random.PRNGKey(2), cfg)
    mel = jnp.asarray(rng.standard_normal((1, 40, cfg.n_mels)).astype(np.float32))
    plain = np.asarray(vocos.forward(params, mel, cfg))
    # vocos_pallas now routes to the whole-stack mega-kernel (the only Pallas
    # variant that meets XLA); interpret mode auto-resolves on the CPU backend.
    cfg2 = cfg.model_copy(update={"vocos_pallas": True})
    fused = np.asarray(vocos.forward(params, mel, cfg2))
    np.testing.assert_allclose(fused, plain, atol=5e-4, rtol=1e-3)
    # Above the kernel's VMEM frame budget the flag falls back to XLA (no crash).
    from gonova_tts_tpu.ops.vocos_stack_kernel import MAX_T

    long_mel = jnp.asarray(
        rng.standard_normal((1, MAX_T + 8, cfg.n_mels)).astype(np.float32)
    )
    a = np.asarray(vocos.forward(params, long_mel, cfg2))
    b = np.asarray(vocos.forward(params, long_mel, cfg))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_vocos_stack_kernel_matches_sequential_blocks(rng):
    """Whole-stack fused kernel == sequential _block_apply (batch 2/4/8)."""
    import jax
    import jax.numpy as jnp

    from gonova_tts_tpu.config import ModelConfig
    from gonova_tts_tpu.models import vocos
    from gonova_tts_tpu.ops.vocos_stack_kernel import vocos_stack_pallas

    cfg = ModelConfig(vocos_dim=128, vocos_ff=256, vocos_layers=3)
    params = vocos.init(jax.random.PRNGKey(0), cfg)
    stacked = [
        jnp.stack([b["dw"] for b in params["blocks"]]),
        jnp.stack([b["dw_b"] for b in params["blocks"]]),
        jnp.stack([b["ln"]["g"] for b in params["blocks"]]),
        jnp.stack([b["ln"]["b"] for b in params["blocks"]]),
        jnp.stack([b["pw1"]["w"] for b in params["blocks"]]),
        jnp.stack([b["pw1"]["b"] for b in params["blocks"]]),
        jnp.stack([b["pw2"]["w"] for b in params["blocks"]]),
        jnp.stack([b["pw2"]["b"] for b in params["blocks"]]),
        jnp.stack([b["gamma"] for b in params["blocks"]]),
    ]
    for b in (2, 4):
        x = jnp.asarray(rng.standard_normal((b, 50, 128)).astype(np.float32))
        y = x
        for blk in params["blocks"]:
            y = vocos._block_apply(blk, y, jnp.float32)
        ours = np.asarray(vocos_stack_pallas(x, *stacked, interpret=True, bf16=False))
        np.testing.assert_allclose(ours, np.asarray(y), atol=3e-4)


# ---------------------------------------------------------------- transformer stack


@pytest.fixture(scope="module")
def tstack():
    import jax

    from gonova_tts_tpu.models import layers

    D, H, F, L = 64, 4, 128, 2
    p = layers.transformer_stack_init(jax.random.PRNGKey(0), L, D, H, F, 3)
    return p, D, H


def _tstack_case(p, H, B, T, lengths, window, rng):
    import jax

    from gonova_tts_tpu.models import layers
    from gonova_tts_tpu.ops.transformer_stack_kernel import (
        stack_block_params,
        transformer_stack_pallas,
    )

    D = p["blocks"][0]["attn"]["q"]["w"].shape[0]
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    mask = (jnp.arange(T)[None] < jnp.asarray(lengths)[:, None]).astype(jnp.float32)
    x = x * mask[..., None]
    ref = layers.transformer_stack(p, x, H, mask, jnp.float32, attention_window=window)
    st = stack_block_params(p["blocks"], H)
    ours = transformer_stack_pallas(
        x, mask, st, p["ln_out"]["g"], p["ln_out"]["b"], H,
        window=window, interpret=True, bf16=False,
    )
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=5e-5, rtol=1e-4)


def test_fused_transformer_stack_full_attention(tstack, rng):
    p, D, H = tstack
    _tstack_case(p, H, B=4, T=32, lengths=[32, 20, 7, 32], window=None, rng=rng)


def test_fused_transformer_stack_local_attention(tstack, rng):
    p, D, H = tstack
    _tstack_case(p, H, B=2, T=128, lengths=[128, 77], window=16, rng=rng)


def test_fused_transformer_stack_window_ge_t_equals_full(tstack, rng):
    """When 3*window >= T both paths reduce to full attention (kernel + XLA agree)."""
    p, D, H = tstack
    _tstack_case(p, H, B=2, T=32, lengths=[32, 17], window=16, rng=rng)


def test_fused_transformer_stack_bf16_close(tstack, rng):
    """bf16 compute stays within bf16-scale error of the f32 oracle."""
    import jax

    from gonova_tts_tpu.models import layers
    from gonova_tts_tpu.ops.transformer_stack_kernel import (
        stack_block_params,
        transformer_stack_pallas,
    )

    p, D, H = tstack
    B, T = 2, 64
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    mask = jnp.ones((B, T), jnp.float32)
    ref = layers.transformer_stack(p, x, H, mask, jnp.float32)
    st = stack_block_params(p["blocks"], H)
    ours = transformer_stack_pallas(
        x, mask, st, p["ln_out"]["g"], p["ln_out"]["b"], H,
        window=None, interpret=True, bf16=True,
    ).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(ours - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert err / scale < 0.05, f"bf16 relative error {err / scale}"


def test_mel_pallas_unsupported_framing_falls_back(rng):
    """Regression: n_fft/hop beyond the kernel's _ROW_PAD budget crashed at trace
    time with an opaque shape error; it must fall back to the XLA mel."""
    import jax.numpy as jnp

    from gonova_tts_tpu.audio.mel import mel_spectrogram
    from gonova_tts_tpu.ops.mel_kernel import mel_spectrogram_pallas

    x = jnp.asarray(rng.standard_normal((1, 64 * 40)).astype(np.float32))
    got = np.asarray(
        mel_spectrogram_pallas(x, n_fft=1024, hop_length=64, interpret=True)
    )
    want = np.asarray(mel_spectrogram(x, n_fft=1024, hop_length=64))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_vocos_forward_istft_precision_config(rng):
    """istft_precision knob: every mode's output stays within the documented
    <3e-5 relative error of the default-precision path through the full forward
    (trivially true on CPU where all are f32; the TPU gaps are pinned in PERF.md)."""
    import jax
    import jax.numpy as jnp

    from gonova_tts_tpu.config import ModelConfig
    from gonova_tts_tpu.models import vocos

    cfg = ModelConfig(
        vocos_dim=128, vocos_ff=256, vocos_layers=2, compute_dtype="float32",
        istft_precision="default",
    )
    params = vocos.init(jax.random.PRNGKey(3), cfg)
    mel = jnp.asarray(rng.standard_normal((1, 24, cfg.n_mels)).astype(np.float32))
    plain = np.asarray(vocos.forward(params, mel, cfg))
    scale = np.abs(plain).max()
    for mode in ("auto", "high", "highest"):
        cfg_m = cfg.model_copy(update={"istft_precision": mode})
        out = np.asarray(vocos.forward(params, mel, cfg_m))
        assert np.abs(out - plain).max() / scale < 3e-5, mode
