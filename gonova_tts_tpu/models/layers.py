"""Shared neural layers: plain functional JAX (params = pytrees, init/apply pure fns).

No flax/haiku dependency on the compute path: explicit pytrees keep sharding rules,
Pallas handoff, and checkpoint layout transparent.  All dense/conv contractions are
MXU-shaped (feature dims multiples of 128 where it matters) and take a `dtype` compute
argument so the engine can run bf16 with f32 params.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------- init helpers


def dense_init(rng, in_dim: int, out_dim: int, scale: Optional[float] = None) -> Params:
    if scale is None:
        scale = math.sqrt(2.0 / (in_dim + out_dim))  # xavier
    w = jax.random.normal(rng, (in_dim, out_dim), dtype=jnp.float32) * scale
    return {"w": w, "b": jnp.zeros((out_dim,), dtype=jnp.float32)}


def conv1d_init(
    rng, in_ch: int, out_ch: int, kernel: int, scale: Optional[float] = None,
    groups: int = 1,
) -> Params:
    if in_ch % groups or out_ch % groups:
        raise ValueError(f"groups={groups} must divide in_ch={in_ch} and out_ch={out_ch}")
    if scale is None:
        scale = math.sqrt(2.0 / (kernel * in_ch // groups + out_ch))
    w = jax.random.normal(rng, (kernel, in_ch // groups, out_ch), dtype=jnp.float32) * scale
    return {"w": w, "b": jnp.zeros((out_ch,), dtype=jnp.float32)}


def layernorm_init(dim: int) -> Params:
    return {"g": jnp.ones((dim,), dtype=jnp.float32), "b": jnp.zeros((dim,), dtype=jnp.float32)}


def embedding_init(rng, vocab: int, dim: int) -> Params:
    return {"table": jax.random.normal(rng, (vocab, dim), dtype=jnp.float32) * 0.02}


# ---------------------------------------------------------------- apply fns


def dense(p: Params, x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.dot(x.astype(dtype), p["w"].astype(dtype), preferred_element_type=dtype) + p[
        "b"
    ].astype(dtype)


def embedding(p: Params, ids: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    return p["table"].astype(dtype)[ids]


def layernorm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    # Normalize in f32 for stability regardless of compute dtype.
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * p["g"] + p["b"]).astype(x.dtype)


def conv1d(
    p: Params,
    x: jnp.ndarray,
    stride: int = 1,
    dilation: int = 1,
    padding: str = "SAME",
    dtype=jnp.float32,
    groups: int = 1,
) -> jnp.ndarray:
    """x: [B, T, C_in] (NWC) → [B, T', C_out]. groups>1 = grouped conv (the weight
    must come from conv1d_init(..., groups=...): shape [k, C_in//groups, C_out])."""
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        p["w"].astype(dtype),
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=dtype,
    )
    return y + p["b"].astype(dtype)


def conv1d_transpose(
    p: Params, x: jnp.ndarray, stride: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Transposed conv, output length exactly T * stride (HiFi-GAN upsampler shape).

    Matches torch ConvTranspose1d(kernel, stride, padding=(kernel - stride) // 2)
    for even kernel - stride.
    """
    kernel = p["w"].shape[0]
    pad = (kernel - stride) // 2
    y = jax.lax.conv_transpose(
        x.astype(dtype),
        p["w"].astype(dtype),
        strides=(stride,),
        padding=[(kernel - 1 - pad, kernel - 1 - pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=dtype,
    )
    # conv_transpose with padding [(k-1-p, k-1-p)] yields length (T-1)*s + k - 2p;
    # slice the tail so length == T * s exactly.
    target = x.shape[1] * stride
    return y[:, :target, :] + p["b"].astype(dtype)


def leaky_relu(x: jnp.ndarray, slope: float = 0.1) -> jnp.ndarray:
    return jnp.where(x >= 0, x, x * slope)


def sinusoidal_positions(length: int, dim: int, dtype=np.float32) -> np.ndarray:
    """Standard transformer sinusoidal position table [length, dim] (host-computed)."""
    pos = np.arange(length)[:, None].astype(np.float64)
    i = np.arange(dim // 2)[None, :].astype(np.float64)
    angles = pos / np.power(10000.0, 2 * i / dim)
    table = np.zeros((length, dim), dtype=np.float64)
    table[:, 0::2] = np.sin(angles)
    table[:, 1::2] = np.cos(angles)
    return table.astype(dtype)


# ---------------------------------------------------------------- attention


def mha_init(rng, dim: int) -> Params:
    ks = jax.random.split(rng, 4)
    return {
        "q": dense_init(ks[0], dim, dim),
        "k": dense_init(ks[1], dim, dim),
        "v": dense_init(ks[2], dim, dim),
        "o": dense_init(ks[3], dim, dim),
    }


def mha(
    p: Params, x: jnp.ndarray, n_heads: int, mask: Optional[jnp.ndarray] = None, dtype=jnp.float32
) -> jnp.ndarray:
    """Self-attention. x: [B, T, D]; mask: [B, T] (1 = valid). n_heads is static
    (never stored in the params pytree — ints in pytrees would be traced under jit)."""
    b, t, d = x.shape
    h = n_heads
    dh = d // h
    q = dense(p["q"], x, dtype).reshape(b, t, h, dh)
    k = dense(p["k"], x, dtype).reshape(b, t, h, dh)
    v = dense(p["v"], x, dtype).reshape(b, t, h, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(dh)
    if mask is not None:
        bias = jnp.where(mask[:, None, None, :].astype(bool), 0.0, -1e9)
        logits = logits + bias
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v, preferred_element_type=dtype)
    return dense(p["o"], out.reshape(b, t, d), dtype)


def local_mha(
    p: Params,
    x: jnp.ndarray,
    n_heads: int,
    window: int,
    mask: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Blocked local self-attention: each block of `window` queries attends to its own
    block and both neighbors (effective span 3*window, centered).

    Why: the acoustic decoder runs over mel frames (T up to 1536); full T×T attention
    materializes O(T²) logits per head — ~600 MB/layer at the largest bucket — while
    frame-level dependencies after length regulation are local.  Blocked local
    attention is O(T · 3w · d), MXU-shaped ([w, 3w] logit tiles), and numerically
    equals full attention when T ≤ 2*window (every block reaches every
    block; pinned by tests). In (2w, 3w] the two DIFFER — edge blocks
    cannot reach the far block — so dispatch must not substitute full
    there.

    x: [B, T, D] with T % window == 0; mask: [B, T] (1 = valid).
    """
    b, t, d = x.shape
    if t % window != 0:
        raise ValueError(f"T={t} must be a multiple of window={window}")
    h = n_heads
    dh = d // h
    nb = t // window

    q = dense(p["q"], x, dtype).reshape(b, nb, window, h, dh)
    k = dense(p["k"], x, dtype).reshape(b, nb, window, h, dh)
    v = dense(p["v"], x, dtype).reshape(b, nb, window, h, dh)

    def with_neighbors(arr):
        # [B, nb, w, h, dh] → [B, nb, 3w, h, dh]: previous, self, next (zero-edged).
        prev = jnp.pad(arr, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :-1]
        nxt = jnp.pad(arr, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))[:, 1:]
        return jnp.concatenate([prev, arr, nxt], axis=2)

    kn = with_neighbors(k)
    vn = with_neighbors(v)
    logits = jnp.einsum("bnqhd,bnkhd->bnhqk", q, kn, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(dh)

    if mask is None:
        key_mask = jnp.ones((b, t), dtype=jnp.float32)
    else:
        key_mask = mask.astype(jnp.float32)
    km = key_mask.reshape(b, nb, window)
    km_prev = jnp.pad(km, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    km_next = jnp.pad(km, ((0, 0), (0, 1), (0, 0)))[:, 1:]
    km_full = jnp.concatenate([km_prev, km, km_next], axis=2)  # [B, nb, 3w]
    bias = jnp.where(km_full[:, :, None, None, :].astype(bool), 0.0, -1e9)
    logits = logits + bias

    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
    out = jnp.einsum("bnhqk,bnkhd->bnqhd", attn, vn, preferred_element_type=dtype)
    return dense(p["o"], out.reshape(b, t, d), dtype)


# ---------------------------------------------------------------- transformer block


def transformer_block_init(rng, dim: int, n_heads: int, d_ff: int, conv_kernel: int = 3) -> Params:
    ks = jax.random.split(rng, 3)
    return {
        "ln1": layernorm_init(dim),
        "attn": mha_init(ks[0], dim),
        "ln2": layernorm_init(dim),
        # FastSpeech-style conv FFN (k-wide conv → relu → k-wide conv).
        "ff1": conv1d_init(ks[1], dim, d_ff, conv_kernel),
        "ff2": conv1d_init(ks[2], d_ff, dim, conv_kernel),
    }


def transformer_block(
    p: Params, x: jnp.ndarray, n_heads: int, mask: Optional[jnp.ndarray] = None, dtype=jnp.float32,
    attention_window: Optional[int] = None,
) -> jnp.ndarray:
    """Pre-LN block; `mask` [B, T] zeroes padded positions between sublayers so padding
    never contaminates the conv FFN receptive field. attention_window selects blocked
    local attention (see local_mha) instead of full attention."""
    mask_f = None if mask is None else mask[..., None].astype(x.dtype)
    normed = layernorm(p["ln1"], x)
    # Threshold is 2*window, NOT 3*window: for T <= 2w every block attends every
    # block, so block-local == full and the cheaper full kernel is safe. In
    # (2w, 3w] they genuinely differ (edge blocks can't reach the far block) —
    # dispatching full there would silently change the attended-key sets between
    # two shapes of the SAME request (the two-stage engine re-runs the decoder at
    # a smaller frame bucket and relies on shape-independent semantics).
    if attention_window is not None and 2 * attention_window < x.shape[1]:
        attended = local_mha(p["attn"], normed, n_heads, attention_window, mask, dtype)
    else:
        attended = mha(p["attn"], normed, n_heads, mask, dtype)
    h = x + attended
    if mask_f is not None:
        h = h * mask_f
    y = layernorm(p["ln2"], h)
    y = conv1d(p["ff1"], y, dtype=dtype)
    y = jax.nn.relu(y)
    y = conv1d(p["ff2"], y, dtype=dtype)
    out = h + y
    if mask_f is not None:
        out = out * mask_f
    return out


def transformer_stack_init(
    rng, n_layers: int, dim: int, n_heads: int, d_ff: int, conv_kernel: int = 3
) -> Params:
    ks = jax.random.split(rng, n_layers)
    return {
        "blocks": [
            transformer_block_init(ks[i], dim, n_heads, d_ff, conv_kernel)
            for i in range(n_layers)
        ],
        "ln_out": layernorm_init(dim),
    }


def transformer_stack(
    p: Params, x: jnp.ndarray, n_heads: int, mask: Optional[jnp.ndarray] = None, dtype=jnp.float32,
    attention_window: Optional[int] = None,
) -> jnp.ndarray:
    for blk in p["blocks"]:
        x = transformer_block(blk, x, n_heads, mask, dtype, attention_window)
    return layernorm(p["ln_out"], x)
