"""NovaSpeech — FastPitch-class non-autoregressive acoustic model.

phonemes [B, L] + speaker embedding [B, S] + exaggeration [B]
    → encoder (pre-LN transformer, conv FFN)
    → duration & pitch predictors (per phoneme)
    → static-shape length regulator (searchsorted gather, T = L * max_frames_per_token)
    → decoder (pre-LN transformer) → log-mel frames [B, T, n_mels] + frame mask.

TPU-first design notes (vs the reference's external 0.5B autoregressive Llama TTS,
SURVEY.md §2.2): no token-by-token decode loop — the whole utterance is a handful of
batched MXU matmuls with fully static shapes; variable length lives only in masks.
The reference's `exaggeration` knob (services/tts/core/synthesizer.py:344-350) maps to
pitch-variance scaling: pitch' = mean + (1 + exaggeration) * (pitch - mean).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import layers
from .layers import Params


def predictor_init(rng, dim: int, hidden: int = 256, kernel: int = 3) -> Params:
    ks = jax.random.split(rng, 3)
    return {
        "c1": layers.conv1d_init(ks[0], dim, hidden, kernel),
        "ln1": layers.layernorm_init(hidden),
        "c2": layers.conv1d_init(ks[1], hidden, hidden, kernel),
        "ln2": layers.layernorm_init(hidden),
        "out": layers.dense_init(ks[2], hidden, 1),
    }


def predictor_apply(p: Params, x: jnp.ndarray, mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Variance predictor: [B, L, D] → [B, L] scalar per position."""
    m = mask[..., None].astype(x.dtype)
    h = layers.conv1d(p["c1"], x * m, dtype=dtype)
    h = layers.layernorm(p["ln1"], jax.nn.relu(h))
    h = layers.conv1d(p["c2"], h * m, dtype=dtype)
    h = layers.layernorm(p["ln2"], jax.nn.relu(h))
    return layers.dense(p["out"], h, dtype)[..., 0] * mask.astype(dtype)


def predictors_apply_fused(
    p_a: Params, p_b: Params, x: jnp.ndarray, mask: jnp.ndarray, dtype=jnp.float32
):
    """Run two variance predictors as ONE grouped-conv pass (same math as two
    `predictor_apply` calls — pinned by tests).

    Why: each predictor is ~8 tiny ops on [B, L, 256]; on TPU this stage is
    op-count-bound (~40 µs per fused region — PERF.md breakdown), so halving the op
    count nearly halves its wall time. Weights concat per call (device-side copy,
    trivial); param layout unchanged.
    """
    m = mask[..., None].astype(x.dtype)
    hidden = p_a["c1"]["w"].shape[-1]

    def grouped_conv(wa, ba, wb, bb, inp):
        # feature_group_count=2: input [B, L, 2*Cin] (the two groups' inputs stacked),
        # kernel [k, Cin, 2*H] (out channels split by group).
        w = jnp.concatenate([wa, wb], axis=-1).astype(dtype)
        b = jnp.concatenate([ba, bb]).astype(dtype)
        y = jax.lax.conv_general_dilated(
            inp.astype(dtype),
            w,
            window_strides=(1,),
            padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=2,
            preferred_element_type=dtype,
        )
        return y + b

    def dual_layernorm(pa_ln, pb_ln, h):
        # Per-half LN: [B, L, 2, H] normalized over the last axis.
        bdims = h.shape[:-1]
        h4 = h.reshape(bdims + (2, hidden)).astype(jnp.float32)
        mean = jnp.mean(h4, axis=-1, keepdims=True)
        var = jnp.var(h4, axis=-1, keepdims=True)
        normed = (h4 - mean) * jax.lax.rsqrt(var + 1e-5)
        g = jnp.stack([pa_ln["g"], pb_ln["g"]])
        bb = jnp.stack([pa_ln["b"], pb_ln["b"]])
        return ((normed * g + bb).reshape(bdims + (2 * hidden,))).astype(dtype)

    x2 = jnp.concatenate([x * m, x * m], axis=-1)
    h = grouped_conv(p_a["c1"]["w"], p_a["c1"]["b"], p_b["c1"]["w"], p_b["c1"]["b"], x2)
    h = dual_layernorm(p_a["ln1"], p_b["ln1"], jax.nn.relu(h))
    h = h * m  # [B, L, 1] broadcasts over both groups' channels
    h = grouped_conv(p_a["c2"]["w"], p_a["c2"]["b"], p_b["c2"]["w"], p_b["c2"]["b"], h)
    h = dual_layernorm(p_a["ln2"], p_b["ln2"], jax.nn.relu(h))
    # Final per-group projection to a scalar: [B, L, 2, H] x [2, H] -> [B, L, 2].
    h4 = h.reshape(h.shape[:-1] + (2, hidden))
    w_out = jnp.stack([p_a["out"]["w"][:, 0], p_b["out"]["w"][:, 0]]).astype(dtype)  # [2, H]
    b_out = jnp.stack([p_a["out"]["b"][0], p_b["out"]["b"][0]]).astype(dtype)  # [2]
    out = jnp.einsum("blgh,gh->blg", h4, w_out, preferred_element_type=dtype) + b_out
    mm = mask.astype(dtype)
    return out[..., 0] * mm, out[..., 1] * mm


def _stack(
    p: Params,
    x: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: ModelConfig,
    dtype,
    window=None,
    as_if_len=None,
) -> jnp.ndarray:
    """Transformer stack dispatch: fused whole-stack Pallas kernel when
    cfg.acoustic_pallas (inference-only — no VJP), else the pure-XLA path.
    Long-form frame buckets (T > 768) keep XLA: the kernel's per-sequence f32
    FFN tap accumulator would exceed the 16 MB VMEM budget there.

    `as_if_len` (the one-graph worst-case frame count, same idea as
    local_attention_from): the kernel-vs-XLA choice must be SHAPE-INDEPENDENT —
    the kernel's bf16 staging differs from XLA's f32 path by far more than the
    1-int16-LSB bound the two-stage dispatch is pinned to, so a request must
    take the same numeric path at every dispatch shape."""
    if (
        cfg.acoustic_pallas
        and dtype in (jnp.float32, jnp.bfloat16)
        and x.shape[1] <= 768
        and (as_if_len or x.shape[1]) <= 768
        and cfg.conv_kernel == 3  # the fused kernel hardcodes 3 conv-FFN taps
    ):
        from ..ops.transformer_stack_kernel import (
            stack_block_params,
            transformer_stack_pallas,
        )

        st = stack_block_params(p["blocks"], cfg.n_heads)
        return transformer_stack_pallas(
            x, mask, st, p["ln_out"]["g"], p["ln_out"]["b"], cfg.n_heads,
            window=window, bf16=(dtype == jnp.bfloat16),
        ).astype(dtype)
    return layers.transformer_stack(p, x, cfg.n_heads, mask, dtype, attention_window=window)


def init(rng, cfg: ModelConfig) -> Params:
    ks = jax.random.split(rng, 8)
    d = cfg.d_model
    return {
        "embed": layers.embedding_init(ks[0], cfg.vocab_size, d),
        "spk_proj": layers.dense_init(ks[1], cfg.speaker_dim, d),
        "encoder": layers.transformer_stack_init(
            ks[2], cfg.encoder_layers, d, cfg.n_heads, cfg.d_ff, cfg.conv_kernel
        ),
        "dur_pred": predictor_init(ks[3], d),
        "pitch_pred": predictor_init(ks[4], d),
        "pitch_embed": layers.dense_init(ks[5], 1, d),
        "decoder": layers.transformer_stack_init(
            ks[6], cfg.decoder_layers, d, cfg.n_heads, cfg.d_ff, cfg.conv_kernel
        ),
        "mel_out": layers.dense_init(ks[7], d, cfg.n_mels),
    }


def length_regulate(
    enc: jnp.ndarray, durations: jnp.ndarray, token_mask: jnp.ndarray, max_frames: int
) -> Dict[str, jnp.ndarray]:
    """Expand per-token encodings to per-frame encodings with fully static shapes.

    durations: [B, L] non-negative ints. Padded tokens are zeroed HERE via
    token_mask — relying on callers to pre-zero them made the parameter dead and
    the invariant silent.
    Frame t maps to the token j with cumsum(dur)[j-1] <= t < cumsum(dur)[j], via a
    branch-free searchsorted-style comparison (O(L*T) mask matmul — tiny vs attention,
    and perfectly MXU/VPU friendly; no dynamic shapes, no scatter).
    """
    durations = durations * token_mask.astype(durations.dtype)
    cum = jnp.cumsum(durations, axis=-1)  # [B, L]
    total = cum[:, -1]  # [B]
    t_idx = jnp.arange(max_frames)[None, :, None]  # [1, T, 1]
    # frame→token assignment: count how many cumsums are <= t  == index of owning token
    token_idx = jnp.sum(cum[:, None, :] <= t_idx, axis=-1)  # [B, T]
    token_idx = jnp.minimum(token_idx, enc.shape[1] - 1)
    # Expand via one-hot matmul rather than gather: TPU gathers are slow, while the
    # [T, L] @ [L, D] contraction rides the MXU (measured ~7% off the whole acoustic
    # pass). Exact — each output row sums one encoder row with zeros.
    onehot = jax.nn.one_hot(token_idx, enc.shape[1], dtype=enc.dtype)  # [B, T, L]
    frames = jnp.einsum(
        "btl,bld->btd", onehot, enc, preferred_element_type=enc.dtype
    )
    frame_mask = (jnp.arange(max_frames)[None, :] < total[:, None]).astype(enc.dtype)
    return {
        "frames": frames * frame_mask[..., None],
        "frame_mask": frame_mask,
        "token_idx": token_idx,
        "total_frames": total,
    }


def encode(
    params: Params,
    tokens: jnp.ndarray,  # [B, L] int32
    token_mask: jnp.ndarray,  # [B, L] 1 = valid
    speaker: jnp.ndarray,  # [B, speaker_dim]
    exaggeration: jnp.ndarray,  # [B]
    cfg: ModelConfig,
    durations: Optional[jnp.ndarray] = None,  # teacher durations [B, L] (training)
    dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """Token-domain half: embedding → encoder → predictors → pitch conditioning.

    Everything here is [B, L]-shaped (no frame-domain tensors), so the serving
    engine can run it as its own graph, read back `total_frames` (a [B] int32 —
    one tiny host round trip), and dispatch the frame-domain half at a right-sized
    frame bucket instead of the L*max_frames_per_token worst case (engine
    two_stage_batch; PERF.md structural-padding note)."""
    b, l = tokens.shape
    mask_f = token_mask.astype(dtype)

    x = layers.embedding(params["embed"], tokens, dtype)
    x = x + jnp.asarray(layers.sinusoidal_positions(l, cfg.d_model), dtype)[None]
    spk = layers.dense(params["spk_proj"], speaker.astype(dtype), dtype)  # [B, D]
    x = (x + spk[:, None, :]) * mask_f[..., None]

    enc = _stack(params["encoder"], x, token_mask, cfg, dtype)

    # Duration + pitch predictors in one grouped pass (see predictors_apply_fused).
    log_dur, pitch = predictors_apply_fused(
        params["dur_pred"], params["pitch_pred"], enc, token_mask, dtype
    )
    if durations is None:
        dur = jnp.round(jnp.exp(log_dur.astype(jnp.float32)) - 1.0)
        dur = jnp.clip(dur, 1.0, float(cfg.max_frames_per_token)).astype(jnp.int32)
        dur = dur * token_mask.astype(jnp.int32)
    else:
        dur = durations.astype(jnp.int32) * token_mask.astype(jnp.int32)

    # Pitch with exaggeration-scaled variance (reference knob mapping).
    denom = jnp.maximum(jnp.sum(mask_f, axis=-1, keepdims=True), 1.0)
    pitch_mean = jnp.sum(pitch * mask_f, axis=-1, keepdims=True) / denom
    scale = (1.0 + exaggeration.astype(dtype))[:, None]
    pitch_scaled = (pitch_mean + scale * (pitch - pitch_mean)) * mask_f
    enc = enc + layers.dense(params["pitch_embed"], pitch_scaled[..., None], dtype)
    enc = enc * mask_f[..., None]

    return {
        "enc": enc,
        "spk": spk,
        "durations": dur,
        "log_durations": log_dur,
        "pitch": pitch,
        "total_frames": jnp.cumsum(dur, axis=-1)[:, -1],
    }


def decode(
    params: Params,
    enc: jnp.ndarray,  # [B, L, D] pitch-conditioned encoder output (encode()["enc"])
    spk: jnp.ndarray,  # [B, D] projected speaker (encode()["spk"])
    durations: jnp.ndarray,  # [B, L] int32 (already masked)
    token_mask: jnp.ndarray,  # [B, L]
    max_frames: int,
    cfg: ModelConfig,
    dtype=jnp.float32,
    local_attention_from: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Frame-domain half: length regulate → decoder → mel.

    Exactness under a smaller `max_frames`: the math for frames below each
    sequence's total_frames is identical to the full-size graph as long as
    max_frames >= total_frames.max() — padded frames are zeroed before the
    decoder, attention is frame-masked, and the conv-FFN taps see the same zero
    neighborhoods either way (pinned to one int16 LSB in tests/test_engine.py;
    different-shaped XLA programs may fuse differently, so final-ULP f32
    rounding can differ even though the arithmetic is the same).
    `local_attention_from` makes the local-vs-full attention choice as if the
    frame axis were that long (the engine passes the one-graph worst case, so a
    frame-bucketed dispatch picks the same attention kind the one-graph shape
    would — block-local attention is absolute-position-blocked, so the choice,
    not the bucket, is what must match)."""
    reg = length_regulate(enc, durations, token_mask, max_frames)
    dec_in = reg["frames"] + spk[:, None, :] * reg["frame_mask"][..., None]
    use_local = (
        cfg.decoder_attention_window is not None
        and (local_attention_from or max_frames) >= cfg.local_attention_min_frames
    )
    dec = _stack(
        params["decoder"], dec_in, reg["frame_mask"], cfg, dtype,
        window=cfg.decoder_attention_window if use_local else None,
        as_if_len=local_attention_from or max_frames,
    )
    mel = layers.dense(params["mel_out"], dec, dtype)  # [B, T, n_mels]
    mel = mel * reg["frame_mask"][..., None]
    return {
        "mel": mel,
        "frame_mask": reg["frame_mask"],
        "total_frames": reg["total_frames"],
    }


def forward(
    params: Params,
    tokens: jnp.ndarray,  # [B, L] int32
    token_mask: jnp.ndarray,  # [B, L] 1 = valid
    speaker: jnp.ndarray,  # [B, speaker_dim]
    exaggeration: jnp.ndarray,  # [B]
    cfg: ModelConfig,
    durations: Optional[jnp.ndarray] = None,  # teacher durations [B, L] (training)
    dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    l = tokens.shape[1]
    e = encode(
        params, tokens, token_mask, speaker, exaggeration, cfg,
        durations=durations, dtype=dtype,
    )
    d = decode(
        params, e["enc"], e["spk"], e["durations"], token_mask,
        l * cfg.max_frames_per_token, cfg, dtype=dtype,
    )
    return {
        "mel": d["mel"],
        "frame_mask": d["frame_mask"],
        "durations": e["durations"],
        "log_durations": e["log_durations"],
        "pitch": e["pitch"],
        "total_frames": d["total_frames"],
    }


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
