"""Lane-folded NovaGAN generator: HiFi-GAN reformulated for MXU lane economics.

Why this exists (PERF.md "HiFi-GAN family on-chip diagnosis"): the generator's late
stages run convs at C=16..64 channels over very long sequences. On TPU the MXU output
tile is 128 lanes wide, so a C=16 conv wastes 7/8 of the machine — measured 228×
slower than a C=128 conv at equal FLOPs. The family is lane-utilization-bound, not
HBM-bound, so kernel fusion alone cannot recover it; only a *layout* change can.

The layout change: fold time into lanes. A signal x[t, c] at audio rate T with C
channels is stored as X[u, r·C + c] with t = u·f + r and fold factor f = 128//C, so
every tensor is exactly 128 lanes wide. A SAME conv (kernel k, dilation d) at the
audio rate becomes a conv over folded steps u whose weight W_f[tap, r_in·C+ci,
r_out·C+co] is the original w[j, ci, co] scattered by

    q = r_out + offset_j,   tap = floor(q / f) - lo,   r_in = q mod f,

i.e. a banded block matrix materialized dense (the MXU computes the structural zeros,
but those lanes were idle anyway). Transposed convs zero-stuff *in folded space*
(a reshape + pad — the stuffed signal at rate T·s is exactly the folded signal at
fold f·s) and then run the same folded conv with offsets j - (k-1-p), matching
`layers.conv1d_transpose` (lax.conv_transpose, no kernel flip). Changing fold factor
at equal rate is a pure reshape, so stages glue together with no data movement.

Numerically equivalent to `vocoder.forward`: the same sums reorganized plus
exact-zero terms — bit-identical in f64; in f32/bf16 the reassociated accumulation
order can differ at rounding level (amplified through deep MRF stacks on some
geometries) — pinned by tests/test_vocoder_folded.py. Differentiable (plain XLA
ops), so the same path serves *and* trains.

Reference analog: none — the reference's vocoder lives inside the external
chatterbox-tts package (reference core/synthesizer.py:344-350); the HiFi-GAN topology
follows the HiFi-GAN paper (PAPERS.md, arxiv 2010.05646) as implemented in
models/vocoder.py.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from . import layers, vocoder
from .layers import Params

LRELU_SLOPE = vocoder.LRELU_SLOPE

MXU_LANES = 128


def _target_fold(channels: int) -> int:
    """Fold factor that brings a C-channel tensor to (at least) 128 lanes."""
    return max(1, MXU_LANES // channels)


@functools.lru_cache(maxsize=None)
def _fold_selector(
    k: int, f_in: int, f_out: int, offsets: Tuple[int, ...]
) -> Tuple[np.ndarray, int]:
    """Static scatter map for folding a conv weight.

    Returns S [k, K_f, f_in, f_out] with S[j, tap, r_in, r_out] = 1 where original
    tap j contributes to folded tap `tap` connecting input sub-position r_in to
    output sub-position r_out, plus `lo` (the most-negative folded-step offset).
    """
    lo = min((r + o) // f_in for r in range(f_out) for o in offsets)
    hi = max((r + o) // f_in for r in range(f_out) for o in offsets)
    k_f = hi - lo + 1
    sel = np.zeros((k, k_f, f_in, f_out), dtype=np.float32)
    for r_out in range(f_out):
        for j, o in enumerate(offsets):
            q = r_out + o
            sel[j, q // f_in - lo, q % f_in, r_out] = 1.0
    return sel, lo


def _fold_weight(
    w: jnp.ndarray, f_in: int, f_out: int, offsets: Sequence[int]
) -> Tuple[jnp.ndarray, int]:
    """w [k, Cin, Cout] → W_f [K_f, f_in·Cin, f_out·Cout] (dense banded block matrix)."""
    k, cin, cout = w.shape
    sel, lo = _fold_selector(k, f_in, f_out, tuple(offsets))
    wf = jnp.einsum("jtqr,jio->tqiro", jnp.asarray(sel, w.dtype), w)
    return wf.reshape(sel.shape[1], f_in * cin, f_out * cout), lo


def _folded_conv(
    x: jnp.ndarray,  # [B, U, f_in·Cin]
    wf: jnp.ndarray,  # [K_f, f_in·Cin, f_out·Cout]
    bias: jnp.ndarray,  # [Cout]
    f_out: int,
    lo: int,
    stride: int,
    dtype,
) -> jnp.ndarray:
    hi = lo + wf.shape[0] - 1
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        wf.astype(dtype),
        window_strides=(stride,),
        padding=[(-lo, hi)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=dtype,
    )
    return y + jnp.tile(bias, f_out).astype(dtype)


def _conv_same(p: Params, x: jnp.ndarray, f: int, dilation: int, dtype) -> jnp.ndarray:
    """SAME conv on a fold-f tensor; plain conv when f == 1."""
    if f == 1:
        return layers.conv1d(p, x, dilation=dilation, dtype=dtype)
    k = p["w"].shape[0]
    # XLA SAME pads ((eff_k-1)//2) low, eff_k = (k-1)*d + 1 — derive offsets from
    # that (for odd k it's the symmetric (k-1)//2*d; for even k the low pad differs).
    pad_low = ((k - 1) * dilation) // 2
    offsets = [j * dilation - pad_low for j in range(k)]
    wf, lo = _fold_weight(p["w"], f, f, offsets)
    return _folded_conv(x, wf, p["b"], f, lo, 1, dtype)


def _refold(x: jnp.ndarray, f_from: int, channels: int, f_to: int) -> jnp.ndarray:
    """[B, U, f_from·C] → [B, U', f_to·C] at the same audio rate (pure reshapes)."""
    if f_from == f_to:
        return x
    b, u, _ = x.shape
    t = u * f_from
    return x.reshape(b, t, channels).reshape(b, t // f_to, f_to * channels)


def _resblock_folded(
    p: Params, x: jnp.ndarray, dilations: List[int], f: int, dtype
) -> jnp.ndarray:
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        h = layers.leaky_relu(x, LRELU_SLOPE)
        h = _conv_same(c1, h, f, d, dtype)
        h = layers.leaky_relu(h, LRELU_SLOPE)
        h = _conv_same(c2, h, f, 1, dtype)
        x = x + h
    return x


def forward(params: Params, mel: jnp.ndarray, cfg: ModelConfig, dtype=jnp.float32) -> jnp.ndarray:
    """mel [B, T, n_mels] → waveform [B, T · prod(upsample_rates)].

    Same parameter pytree and same result as `vocoder.forward`; only the on-device
    layout differs. Falls back to the plain layout per-stage when T doesn't divide.
    """
    b, t_mel, _ = mel.shape
    x = layers.conv1d(params["conv_pre"], mel.astype(dtype), dtype=dtype)
    ch = cfg.upsample_initial_channel
    f = 1  # current fold factor; x is [B, T/f, f·C]
    t = t_mel
    for i, (rate, kernel) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        c_in, c_out = ch // (2**i), ch // (2 ** (i + 1))
        x = layers.leaky_relu(x, LRELU_SLOPE)
        up = params["ups"][i]
        if f == 1 and c_out >= MXU_LANES // 2:
            # Wide enough: plain transposed conv (folding buys nothing at >=64 lanes).
            x = layers.conv1d_transpose(up, x, rate, dtype=dtype)
            f = 1
        else:
            # Zero-stuff in folded space: [B, U, f, 1, C] pad→ [B, U, f, rate, C];
            # the stuffed audio-rate-T·s signal IS the fold-(f·rate) layout.
            u = x.shape[1]
            x = jnp.pad(
                x.reshape(b, u, f, 1, c_in), ((0, 0), (0, 0), (0, 0), (0, rate - 1), (0, 0))
            ).reshape(b, u, f * rate * c_in)
            pad = (kernel - rate) // 2
            offsets = [j - (kernel - 1 - pad) for j in range(kernel)]
            f *= rate
            wf, lo = _fold_weight(up["w"], f, f, offsets)
            x = _folded_conv(x, wf, up["b"], f, lo, 1, dtype)
        t *= rate
        f_t = _target_fold(c_out) if t % _target_fold(c_out) == 0 else f
        x = _refold(x, f, c_out, f_t)
        f = f_t
        acc = None
        for block, rd in zip(params["mrfs"][i], cfg.resblock_dilations):
            y = _resblock_folded(block, x, rd, f, dtype)
            acc = y if acc is None else acc + y
        x = acc / float(len(params["mrfs"][i]))
    x = layers.leaky_relu(x, LRELU_SLOPE)
    post = params["conv_post"]
    k_post = post["w"].shape[0]
    if t % MXU_LANES == 0 and MXU_LANES % f == 0:
        # Fold the 1-channel output all the way to 128 lanes (strided folded conv).
        offsets = [j - (k_post - 1) // 2 for j in range(k_post)]
        wf, lo = _fold_weight(post["w"], f, MXU_LANES, offsets)
        x = _folded_conv(x, wf, post["b"], MXU_LANES, lo, MXU_LANES // f, dtype)
        wav = x.reshape(b, t)
    else:
        x = _refold(x, f, ch // (2 ** len(cfg.upsample_rates)), 1)
        wav = layers.conv1d(post, x, dtype=dtype)[..., 0]
    return jnp.tanh(wav.astype(jnp.float32))
