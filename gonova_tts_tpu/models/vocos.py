"""NovaVocos — iSTFT-head vocoder (Vocos-class), the TPU-first flagship.

Why this family exists alongside the HiFi-GAN generator (vocoder.py): HiFi-GAN's
transposed-conv pyramid shrinks channels as time expands (256 → 16), so on TPU most of
its convs run at <1/8 MXU lane utilization and the sample-rate MRF stacks are HBM-bound.
NovaVocos never leaves frame rate: ConvNeXt-style blocks (depthwise k=7 + pointwise
512→1536→512 MLPs) predict an STFT (log-magnitude + phase) per mel frame, and the
waveform is produced by an exact inverse-DFT matmul + constant-overlap-add — all
contractions are ≥512 wide, mapping straight onto the MXU.  Same contract as the
HiFi-GAN family: mel [B, T, n_mels] → waveform [B, T * hop].

The iSTFT uses the same framing convention as gonova_tts_tpu/audio/stft.py (periodic
Hann, hop = n_fft / 4), for which the squared-window overlap sum is the constant 1.5
(COLA), so overlap-add is four shifted adds and one multiply — no normalization pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..audio.stft import hann_window, idft_bases
from . import layers
from .layers import Params


def _block_init(rng, dim: int, ff: int, kernel: int = 7) -> Params:
    ks = jax.random.split(rng, 3)
    return {
        # Depthwise conv: one filter per channel, stored [kernel, dim].
        "dw": jax.random.normal(ks[0], (kernel, dim), jnp.float32) * (1.0 / np.sqrt(kernel)),
        "dw_b": jnp.zeros((dim,), jnp.float32),
        "ln": layers.layernorm_init(dim),
        "pw1": layers.dense_init(ks[1], dim, ff),
        "pw2": layers.dense_init(ks[2], ff, dim),
        "gamma": jnp.full((dim,), 1e-2, jnp.float32),  # layer scale
    }


def _depthwise_conv(w: jnp.ndarray, b: jnp.ndarray, x: jnp.ndarray, dtype) -> jnp.ndarray:
    """Depthwise conv via feature_group_count (SAME padding). x: [B, T, C]."""
    k, c = w.shape
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        w.astype(dtype)[:, None, :],  # [k, 1, C] with feature_group_count=C
        window_strides=(1,),
        padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
        preferred_element_type=dtype,
    )
    return y + b.astype(dtype)


def _block_apply(p: Params, x: jnp.ndarray, dtype) -> jnp.ndarray:
    h = _depthwise_conv(p["dw"], p["dw_b"], x, dtype)
    h = layers.layernorm(p["ln"], h)
    h = layers.dense(p["pw1"], h, dtype)
    h = jax.nn.gelu(h)
    h = layers.dense(p["pw2"], h, dtype)
    return x + h * p["gamma"].astype(h.dtype)


def init(rng, cfg: ModelConfig) -> Params:
    dim, ff, n_layers = cfg.vocos_dim, cfg.vocos_ff, cfg.vocos_layers
    n_bins = cfg.n_fft // 2 + 1
    # polar: (log-mag, phase). cartesian: (log-mag, x, y) — see forward().
    head_mult = {"polar": 2, "cartesian": 3}[cfg.vocos_head]
    ks = jax.random.split(rng, n_layers + 3)
    return {
        "embed": layers.conv1d_init(ks[0], cfg.n_mels, dim, 7),
        "blocks": [_block_init(ks[1 + i], dim, ff) for i in range(n_layers)],
        "ln_out": layers.layernorm_init(dim),
        "head": layers.dense_init(ks[n_layers + 1], dim, head_mult * n_bins),
    }


def forward(params: Params, mel: jnp.ndarray, cfg: ModelConfig, dtype=jnp.float32) -> jnp.ndarray:
    """mel [B, T, n_mels] → waveform [B, T * hop] (hop = n_fft // 4)."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    assert n_fft == 4 * hop, "NovaVocos assumes 4x-overlap framing (n_fft == 4*hop)"
    assert cfg.win_length == n_fft, (
        "NovaVocos synthesizes with the full n_fft Hann; a shorter win_length "
        "would silently diverge from the analysis framing (audio/stft.py) and "
        "break the constant-NOLA overlap-add"
    )
    n_bins = n_fft // 2 + 1
    b, t, _ = mel.shape

    x = layers.conv1d(params["embed"], mel.astype(dtype), dtype=dtype)
    use_stack_kernel = False
    if cfg.vocos_pallas:
        from ..ops.vocos_stack_kernel import MAX_T, vocos_stack_pallas

        # The whole-stack mega-kernel is the only Pallas variant that meets XLA
        # (PERF.md; the per-block kernel measured slower and is not wired). XLA
        # fallback above its VMEM frame budget, interpret mode on CPU.
        use_stack_kernel = t <= MAX_T
    if use_stack_kernel:
        blks = params["blocks"]
        x = vocos_stack_pallas(
            x,
            jnp.stack([blk["dw"] for blk in blks]),
            jnp.stack([blk["dw_b"] for blk in blks]),
            jnp.stack([blk["ln"]["g"] for blk in blks]),
            jnp.stack([blk["ln"]["b"] for blk in blks]),
            jnp.stack([blk["pw1"]["w"] for blk in blks]),
            jnp.stack([blk["pw1"]["b"] for blk in blks]),
            jnp.stack([blk["pw2"]["w"] for blk in blks]),
            jnp.stack([blk["pw2"]["b"] for blk in blks]),
            jnp.stack([blk["gamma"] for blk in blks]),
            interpret=jax.default_backend() == "cpu",
            bf16=(dtype == jnp.bfloat16),
        )
    else:
        for blk in params["blocks"]:
            x = _block_apply(blk, x, dtype)
    x = layers.layernorm(params["ln_out"], x)
    head = layers.dense(params["head"], x, dtype).astype(jnp.float32)

    log_mag = head[..., :n_bins]
    mag = jnp.exp(jnp.clip(log_mag, -14.0, 6.0))
    if cfg.vocos_head == "cartesian":
        # Direction-pair parametrization: phase as a normalized (x, y) vector.
        # Same magnitude parametrization as polar (training parity); kills the
        # cos+sin over [B, T, bins] — the serving profile's named VPU-bound
        # segment — for one rsqrt + multiplies. (The original Vocos head is
        # polar: github.com/gemelo-ai/vocos ISTFTHead; reference README's model
        # family implies it via its iSTFT vocoder. The cartesian form is this
        # rebuild's TPU reformulation; exactness pinned in tests.)
        xdir = head[..., n_bins : 2 * n_bins]
        ydir = head[..., 2 * n_bins :]
        inv = jax.lax.rsqrt(xdir * xdir + ydir * ydir + 1e-12)
        real = mag * xdir * inv
        imag = mag * ydir * inv
    else:
        phase = head[..., n_bins:]
        real = mag * jnp.cos(phase)
        imag = mag * jnp.sin(phase)
    # iDFT accuracy (config.ModelConfig.istft_precision): on TPU a plain f32
    # matmul at DEFAULT precision runs one-pass-bf16 multiplies (~2e-3 mean
    # relative error, above the PCM16 LSB); precision=HIGH is XLA's 3-pass
    # ~f24 algorithm (1.3e-5 mean — below the LSB) at −1% two-stage headline
    # cost, while HIGHEST (6-pass, f32-true 1.3e-7) costs ~12% (on-chip A/B in
    # PERF.md "iDFT precision"). Auto = HIGH on TPU, default precision on
    # backends whose f32 matmul is already exact.
    mode = cfg.istft_precision
    if mode == "auto":
        mode = "high" if jax.default_backend() == "tpu" else "default"
    return istft_synthesis(
        real, imag, n_fft, hop,
        precision={
            "default": None,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }[mode],
    )


def istft_synthesis(
    real: jnp.ndarray, imag: jnp.ndarray, n_fft: int, hop: int, precision=None
) -> jnp.ndarray:
    """Exact windowed iSTFT for 4x-overlap framing: [B, T, bins]x2 → [B, T*hop].

    Inverse real-DFT as a matmul, synthesis window, 4-shift overlap-add, NOLA
    normalization (matches audio/stft.py's framing convention; unit-tested against its
    istft).

    `precision` is forwarded to the inverse-DFT einsum. On TPU the DEFAULT
    precision runs one-pass-bf16 multiplies (~2e-3 mean relative error, above the
    PCM16 LSB), so `forward` passes Precision.HIGH there — XLA's 3-pass ~f24
    algorithm (1.3e-5 mean rel err, below the LSB) at −1% two-stage headline
    cost; HIGHEST (6-pass, f32-true 1.3e-7) costs ~12% and stays opt-in.
    History: rounds 2–3 shipped a hand-rolled split-bf16 form (hi/lo
    decomposition, three explicit bf16 matmuls) here; a round-4 on-chip probe
    showed XLA's algebraic simplifier DEFEATS that decomposition under jit —
    its output was bitwise identical to the default-precision path — so it was
    one-pass-bf16 accuracy all along (its <3e-5 pinning test only ever ran on
    CPU, where einsum math differs). Precision.HIGH is the supported,
    actually-working way to ask for what the hand split intended."""
    b, t, _ = real.shape
    icos, isin = idft_bases(n_fft)
    # Same (R, I) convention as audio/stft.py's stft_ri/istft pair. The synthesis
    # window is FOLDED into the bases (linear in the frame), which deletes the
    # separate [B, T, n_fft] window-multiply pass after the matmul.
    window = jnp.asarray(hann_window(n_fft))
    bases = jnp.concatenate([jnp.asarray(icos), -jnp.asarray(isin)], axis=0) * window[None, :]
    coef = jnp.concatenate([real, imag], axis=-1)  # [B, T, 2*bins]
    # [B, T, n_fft] (window already applied via bases)
    frames = jnp.einsum("btc,cn->btn", coef, bases, precision=precision)

    # frames[:, i, :] contributes to samples [i*hop - (n_fft-hop)/2 ... ) in the
    # stft.py convention (reflect pad (n_fft-hop)/2 trimmed). With n_fft = 4*hop:
    # output[n] = sum_{k=0..3} frames[n//hop - k + pad_frames, (k*hop + n%hop)] / 1.5
    segs = frames.reshape(b, t, 4, hop)  # [B, T, k, hop]
    out = jnp.zeros((b, (t + 3) * hop), jnp.float32)
    for k in range(4):
        out = out.at[:, k * hop : (k + t) * hop].add(segs[:, :, k, :].reshape(b, t * hop))
    # Constant NOLA normalization: for periodic Hann at 4x overlap the interior
    # window-sum is exactly 1.5.  Deliberately constant at the clip edges too (no
    # edge compensation): the first/last ~1.5*hop samples get a natural window
    # fade-in/out (declick), and — crucially for streaming — the synthesis becomes
    # exactly composable: a window's interior output is independent of where the
    # clip boundary lies, so context-padded streaming windows reproduce the
    # one-shot pass (tests/test_engine.py streaming-exactness test) PROVIDED the
    # context covers the ConvNeXt receptive field PLUS 2 frames — the lead trim
    # below means each emitted sample draws on frames up to 2 before / 1 after
    # its own frame (measured: float-noise-floor agreement only from RF+2).
    out = out / 1.5
    # Trim the (n_fft - hop)/2 = 1.5*hop edge pad on each side to align sample 0 with
    # frame 0 (matching stft.py's centered framing).
    lead = (n_fft - hop) // 2
    return out[:, lead : lead + t * hop]
