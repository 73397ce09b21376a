"""NovaGAN — HiFi-GAN-class vocoder generator (mel frames → waveform).

Transposed-conv upsampling (×8·8·2·2 = 256 = hop length) with multi-receptive-field
(MRF) residual fusion stacks, per the HiFi-GAN architecture (PAPERS.md: HiFi-GAN,
arxiv 2010.05646).  Implemented NWC feature-last for TPU; every conv is a
`lax.conv_general_dilated` that XLA maps onto the MXU; the Pallas fused variant of the
MRF stack lives in gonova_tts_tpu/ops.

Also includes the discriminators' building blocks used by the training subsystem:
multi-period (MPD) and multi-scale (MSD) discriminators, matching the HiFi-GAN paper's
topology (strided/grouped convs), used by gonova_tts_tpu/train.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import layers
from .layers import Params

LRELU_SLOPE = 0.1


# ---------------------------------------------------------------- generator


def _resblock_init(rng, channels: int, kernel: int, dilations: List[int]) -> Params:
    ks = jax.random.split(rng, 2 * len(dilations))
    return {
        "convs1": [
            layers.conv1d_init(ks[2 * i], channels, channels, kernel) for i in range(len(dilations))
        ],
        "convs2": [
            layers.conv1d_init(ks[2 * i + 1], channels, channels, kernel)
            for i in range(len(dilations))
        ],
    }


def _resblock_apply(
    p: Params, x: jnp.ndarray, dilations: List[int], dtype=jnp.float32
) -> jnp.ndarray:
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        h = layers.leaky_relu(x, LRELU_SLOPE)
        h = layers.conv1d(c1, h, dilation=d, dtype=dtype)
        h = layers.leaky_relu(h, LRELU_SLOPE)
        h = layers.conv1d(c2, h, dtype=dtype)
        x = x + h
    return x


def init(rng, cfg: ModelConfig) -> Params:
    n_up = len(cfg.upsample_rates)
    ks = jax.random.split(rng, 2 + n_up * (1 + len(cfg.resblock_kernels)))
    ch = cfg.upsample_initial_channel
    params: Params = {
        "conv_pre": layers.conv1d_init(ks[0], cfg.n_mels, ch, 7),
        "ups": [],
        "mrfs": [],
    }
    ki = 1
    for i, (rate, kernel) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        in_ch, out_ch = ch // (2**i), ch // (2 ** (i + 1))
        params["ups"].append(layers.conv1d_init(ks[ki], in_ch, out_ch, kernel))
        ki += 1
        mrf = []
        for rk, rd in zip(cfg.resblock_kernels, cfg.resblock_dilations):
            mrf.append(_resblock_init(ks[ki], out_ch, rk, rd))
            ki += 1
        params["mrfs"].append(mrf)
    params["conv_post"] = layers.conv1d_init(ks[ki], ch // (2**n_up), 1, 7)
    return params


def forward(params: Params, mel: jnp.ndarray, cfg: ModelConfig, dtype=jnp.float32) -> jnp.ndarray:
    """mel [B, T, n_mels] → waveform [B, T * prod(upsample_rates)]."""
    x = layers.conv1d(params["conv_pre"], mel.astype(dtype), dtype=dtype)
    for up, mrf, rate in zip(params["ups"], params["mrfs"], cfg.upsample_rates):
        x = layers.leaky_relu(x, LRELU_SLOPE)
        x = layers.conv1d_transpose(up, x, rate, dtype=dtype)
        acc = None
        for block, (rk, rd) in zip(mrf, zip(cfg.resblock_kernels, cfg.resblock_dilations)):
            y = _resblock_apply(block, x, rd, dtype=dtype)
            acc = y if acc is None else acc + y
        x = acc / float(len(mrf))
    x = layers.leaky_relu(x, LRELU_SLOPE)
    x = layers.conv1d(params["conv_post"], x, dtype=dtype)
    return jnp.tanh(x[..., 0].astype(jnp.float32))


def upsample_factor(cfg: ModelConfig) -> int:
    f = 1
    for r in cfg.upsample_rates:
        f *= r
    return f


# ---------------------------------------------------------------- discriminators
# (training-only; topology per HiFi-GAN paper §2.3)

_MPD_PERIODS = (2, 3, 5, 7, 11)


def _width_fn(width: float):
    """Channel scaler for the discriminator width knob: multiples of 16 (grouped
    convs need divisibility; MXU lanes like it), floor 16."""

    def w(c: int) -> int:
        return max(16, int(round(c * width / 16.0)) * 16)

    return w


def mpd_init(rng, width: float = 1.0) -> Params:
    """Multi-period discriminator: one conv stack per period.

    Paper topology (HiFi-GAN §3 / official repo DiscriminatorP): five k=5 conv
    levels — 1→32→128→512→1024 at stride 3, then 1024→1024 at stride 1 — before
    the k=3 post conv. The final stride-1 level doubles the deepest receptive
    field and is a feature-matching tap; omitting it (pre-round-3 bug) trained
    the generator against a weaker critic than documented.

    `width` scales every channel count (structure/strides/taps unchanged):
    1.0 = paper capacity; tests and tiny-corpus runs use fractions to keep
    compile/step cost proportionate. Discriminators never enter serving
    checkpoints, so the knob cannot drift a served model."""
    subs = []
    w = _width_fn(width)
    for i, _period in enumerate(_MPD_PERIODS):
        ks = jax.random.split(jax.random.fold_in(rng, i), 6)
        chans = [(1, w(32)), (w(32), w(128)), (w(128), w(512)), (w(512), w(1024)),
                 (w(1024), w(1024))]
        convs = [layers.conv1d_init(ks[j], cin, cout, 5) for j, (cin, cout) in enumerate(chans)]
        subs.append(
            {
                "convs": convs,
                "conv_post": layers.conv1d_init(ks[5], w(1024), 1, 3),
            }
        )
    return {"subs": subs}


def _mpd_sub_apply(p: Params, x2d: jnp.ndarray, dtype=jnp.float32) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """x2d: [B, T//period, period] treated as [B*period, T//period, 1] conv stack."""
    b, t, period = x2d.shape
    h = x2d.transpose(0, 2, 1).reshape(b * period, t, 1)
    feats = []
    for j, c in enumerate(p["convs"]):
        # Paper strides: 3 for the channel-growing levels, 1 for the final
        # 1024→1024 level.
        h = layers.conv1d(c, h, stride=3 if j < len(p["convs"]) - 1 else 1, dtype=dtype)
        h = layers.leaky_relu(h, LRELU_SLOPE)
        feats.append(h)
    out = layers.conv1d(p["conv_post"], h, dtype=dtype)
    feats.append(out)
    return out.reshape(b, -1), feats


def mpd_apply(p: Params, wav: jnp.ndarray, dtype=jnp.float32):
    """wav [B, T] → per-period (logits, feature list)."""
    b, t = wav.shape
    outs = []
    for sub, period in zip(p["subs"], _MPD_PERIODS):
        t_pad = ((t + period - 1) // period) * period
        x = jnp.pad(wav, ((0, 0), (0, t_pad - t)), mode="reflect")
        x2d = x.reshape(b, t_pad // period, period)
        outs.append(_mpd_sub_apply(sub, x2d, dtype))
    return outs


# MSD conv schedule — the paper's (MelGAN-derived) DiscriminatorS:
# (in, out, kernel, stride, groups). Grouped k=41 convs carry most of the
# capacity; the k=5 penultimate level is the deepest feature-matching tap.
_MSD_SCHEDULE = (
    (1, 128, 15, 1, 1),
    (128, 128, 41, 2, 4),
    (128, 256, 41, 2, 16),
    (256, 512, 41, 4, 16),
    (512, 1024, 41, 4, 16),
    (1024, 1024, 41, 1, 16),
    (1024, 1024, 5, 1, 1),
)


def msd_init(rng, width: float = 1.0) -> Params:
    """Multi-scale discriminator on 1x, 2x, 4x average-pooled audio.

    Paper topology (official repo DiscriminatorS): the grouped-conv schedule in
    _MSD_SCHEDULE per scale, AvgPool1d(4, stride 2) between scales. The
    pre-round-3 stack (five ungrouped stride-4 convs, pool k=2) had a
    substantially smaller receptive field than the topology the training docs
    claim. Grouped convs are slow on TPU for GENERATOR-sized workloads
    (PERF.md HiFi-GAN diagnosis) but these run only in the training step, where
    fidelity to the published objective outranks step time. `width` as in
    mpd_init (group counts unchanged — the 16-multiple floor keeps them valid)."""
    subs = []
    w = _width_fn(width)
    for i in range(3):
        ks = jax.random.split(jax.random.fold_in(rng, 100 + i), len(_MSD_SCHEDULE) + 1)
        convs = [
            layers.conv1d_init(
                ks[j], cin if cin == 1 else w(cin), w(cout), k, groups=g
            )
            for j, (cin, cout, k, _s, g) in enumerate(_MSD_SCHEDULE)
        ]
        subs.append(
            {"convs": convs, "conv_post": layers.conv1d_init(ks[-1], w(1024), 1, 3)}
        )
    return {"subs": subs}


def _avg_pool1d(x: jnp.ndarray, k: int, stride: int, pad: int) -> jnp.ndarray:
    """torch AvgPool1d(k, stride, pad) with count_include_pad=True (the default
    the reference topology uses): zero-pad both sides, mean over k."""
    b, t = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    n = (t + 2 * pad - k) // stride + 1
    idx = jnp.arange(n)[:, None] * stride + jnp.arange(k)[None, :]
    return xp[:, idx].mean(axis=-1)


def msd_apply(p: Params, wav: jnp.ndarray, dtype=jnp.float32):
    outs = []
    x = wav
    for i, sub in enumerate(p["subs"]):
        if i > 0:
            x = _avg_pool1d(x, 4, 2, 2)
        h = x[..., None]
        feats = []
        for c, (_ci, _co, _k, stride, groups) in zip(sub["convs"], _MSD_SCHEDULE):
            h = layers.conv1d(c, h, stride=stride, dtype=dtype, groups=groups)
            h = layers.leaky_relu(h, LRELU_SLOPE)
            feats.append(h)
        out = layers.conv1d(sub["conv_post"], h, dtype=dtype)
        feats.append(out)
        outs.append((out.reshape(out.shape[0], -1), feats))
    return outs
