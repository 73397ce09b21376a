"""Lane-folded HiFi-GAN generator (models/vocoder_folded.py): exactness vs the plain
layout, shape fallbacks, gradients, and the tts-level dispatch flag.

The folded path must be numerically identical to `vocoder.forward` (same sums
reorganized plus exact-zero terms), so these are tight-tolerance tests, not
statistical ones.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from gonova_tts_tpu.config import ModelConfig
from gonova_tts_tpu.models import tts, vocoder, vocoder_folded


def _cfg(**kw):
    base = dict(
        d_model=64,
        n_heads=2,
        d_ff=128,
        encoder_layers=1,
        decoder_layers=1,
        speaker_dim=32,
        vocab_size=64,
        n_mels=80,
        vocoder_family="hifigan",
    )
    base.update(kw)
    return ModelConfig(**base)


def _forward_pair(cfg, t_mel, b=2, seed=0):
    params = vocoder.init(jax.random.PRNGKey(seed), cfg)
    mel = jnp.asarray(
        np.random.default_rng(seed).standard_normal((b, t_mel, cfg.n_mels)), jnp.float32
    )
    ref = vocoder.forward(params, mel, cfg, dtype=jnp.float32)
    fold = vocoder_folded.forward(params, mel, cfg, dtype=jnp.float32)
    return ref, fold


def test_folded_exact_production_geometry():
    # Production geometry (rates 8,8,2,2 / C 256→16): stages 1-3 run folded,
    # conv_post folds to 128 lanes.
    ref, fold = _forward_pair(_cfg(), t_mel=8)
    assert fold.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fold), np.asarray(ref), rtol=1e-5, atol=2e-5)


def test_folded_exact_narrow_geometry():
    # Narrow channels (32→2): every upsample takes the folded zero-stuffed path,
    # fold factors reach 64.
    cfg = _cfg(upsample_initial_channel=32)
    ref, fold = _forward_pair(cfg, t_mel=8)
    np.testing.assert_allclose(np.asarray(fold), np.asarray(ref), rtol=1e-5, atol=2e-5)


def test_folded_exact_indivisible_lengths_fall_back():
    # t_mel=7 → audio length 7·256 is not a multiple of 128·… at every stage;
    # per-stage fallbacks must still produce the exact result.
    ref, fold = _forward_pair(_cfg(), t_mel=7)
    np.testing.assert_allclose(np.asarray(fold), np.asarray(ref), rtol=1e-5, atol=2e-5)


def test_folded_exact_odd_rates():
    # Non-power-of-two rate (3): fold factors and stuffing must not assume 2^k.
    cfg = _cfg(upsample_rates=[3, 4], upsample_kernels=[6, 8], upsample_initial_channel=64)
    ref, fold = _forward_pair(cfg, t_mel=8)
    np.testing.assert_allclose(np.asarray(fold), np.asarray(ref), rtol=1e-5, atol=2e-5)


def test_folded_exact_even_resblock_kernel_with_dilation():
    # Even resblock kernel + dilation>1: XLA SAME pads ((k-1)*d)//2 low, which is NOT
    # ((k-1)//2)*d — regression test for the offset-centering bug found in review.
    cfg = _cfg(
        upsample_rates=[4, 4],
        upsample_kernels=[8, 8],
        upsample_initial_channel=64,
        resblock_kernels=[4],
        resblock_dilations=[[3, 1]],
    )
    ref, fold = _forward_pair(cfg, t_mel=8)
    np.testing.assert_allclose(np.asarray(fold), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_registry_novagan_routes_folded():
    from gonova_tts_tpu.models import registry

    cfg = _cfg(upsample_initial_channel=32)
    fam = registry.get("novagan")
    params = fam.init(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(np.random.default_rng(3).standard_normal((1, 8, cfg.n_mels)), jnp.float32)
    via_registry = fam.forward(params, mel, cfg, dtype=jnp.float32)
    via_tts = vocoder_folded.forward(params, mel, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(via_registry), np.asarray(via_tts), rtol=0, atol=0)


def test_folded_jits_and_is_differentiable():
    cfg = _cfg(upsample_initial_channel=32)
    params = vocoder.init(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8, cfg.n_mels)), jnp.float32)

    def loss_fold(p):
        return jnp.sum(vocoder_folded.forward(p, mel, cfg) ** 2)

    def loss_ref(p):
        return jnp.sum(vocoder.forward(p, mel, cfg) ** 2)

    g_fold = jax.jit(jax.grad(loss_fold))(params)
    g_ref = jax.grad(loss_ref)(params)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fold)
    flat_r, _ = jax.flatten_util.ravel_pytree(g_ref)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_r), rtol=1e-4, atol=1e-4)


def test_tts_vocode_dispatches_folded():
    # cfg.hifigan_folded=True routes tts.vocode through the folded path; the flag
    # off must give the same numbers (exactness), pinning the dispatch wiring.
    cfg_on = _cfg(upsample_initial_channel=32, hifigan_folded=True)
    cfg_off = _cfg(upsample_initial_channel=32, hifigan_folded=False)
    params = tts.init(jax.random.PRNGKey(0), cfg_on)
    mel = jnp.asarray(np.random.default_rng(2).standard_normal((2, 8, cfg_on.n_mels)), jnp.float32)
    on = tts.vocode(params, mel, cfg_on, dtype=jnp.float32)
    off = tts.vocode(params, mel, cfg_off, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(on), np.asarray(off), rtol=1e-5, atol=2e-5)
