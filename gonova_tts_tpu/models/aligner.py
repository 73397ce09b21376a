"""Alignment learning: text↔mel aligner with monotonic alignment search (MAS).

The reference's external model learns alignments internally (its autoregressive
decoder attends over text — services/tts/core/synthesizer.py:344-350), so it trains
from raw (text, audio) pairs. This module gives the in-repo FastPitch-class stack the
same capability: duration targets are EXTRACTED from the data rather than supplied by
a manifest or an external forced aligner.

Design (RAD-TTS / "One TTS Alignment To Rule Them All" style, built TPU-first):

  * a small convolutional text encoder (own token embedding — decoupled from the
    acoustic encoder so the aligner cannot be starved by acoustic-loss gradients)
    and mel encoder project both sides into one space; the alignment score is the
    negative squared L2 distance, log-softmax-normalized over tokens per frame;
  * `forward_sum_loss` — the differentiable CTC-like marginalization over all
    monotonic paths — trains the projections;
  * `mas_durations` — Viterbi over the same scores — extracts hard per-token
    durations that supervise the duration predictor and drive the length regulator
    during training.

TPU-native notes: both recursions are `lax.scan`s over the frame axis with the token
axis vectorized ([B, L] per step — pure VPU work), all shapes static; variable lengths
live in masks. The Viterbi backtrack is a reverse scan over the stored stay/advance
choices. No host round trips, no dynamic shapes, no per-sample Python (the standard
numpy implementation of MAS is a per-utterance double loop on the host; here the whole
batch aligns inside the train step's XLA program).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from . import layers
from .layers import Params

_NEG_INF = -1e9


def init(rng, cfg: ModelConfig, dim: int = 128) -> Params:
    """Text + mel projection stacks. `dim` is the shared alignment space.

    The TEXT side is context-INDEPENDENT (kernel-1 convs — a per-token MLP over
    the embedding): with context-sensitive keys the saturated softmax admits
    degenerate solutions where "token x in context y" imitates a neighbor's
    acoustics and MAS extracts a wrong segmentation at zero loss (measured on a
    permuted-prototype toy: max duration error 5 frames with k=3 keys vs 2 — the
    mel-side boundary blur — with k=1). Phoneme identity anchors the alignment
    space; acoustic context stays on the mel side."""
    ks = jax.random.split(rng, 6)
    return {
        "embed": layers.embedding_init(ks[0], cfg.vocab_size, dim),
        "t_c1": layers.conv1d_init(ks[1], dim, dim, 1),
        "t_c2": layers.conv1d_init(ks[2], dim, dim, 1),
        "m_c1": layers.conv1d_init(ks[3], cfg.n_mels, dim * 2, 3),
        "m_c2": layers.conv1d_init(ks[4], dim * 2, dim, 3),
        "m_c3": layers.conv1d_init(ks[5], dim, dim, 1),
    }


def log_probs(
    p: Params,
    tokens: jnp.ndarray,  # [B, L] int32
    mel: jnp.ndarray,  # [B, T, n_mels]
    token_mask: jnp.ndarray,  # [B, L]
    dtype=jnp.float32,
) -> jnp.ndarray:
    """log p(token j | frame t): [B, T, L], log-softmax over valid tokens."""
    keys = layers.embedding(p["embed"], tokens, dtype)
    keys = layers.conv1d(p["t_c1"], keys, dtype=dtype)
    keys = layers.conv1d(p["t_c2"], jax.nn.relu(keys), dtype=dtype)  # [B, L, D]
    q = layers.conv1d(p["m_c1"], mel.astype(dtype), dtype=dtype)
    q = layers.conv1d(p["m_c2"], jax.nn.relu(q), dtype=dtype)
    q = layers.conv1d(p["m_c3"], jax.nn.relu(q), dtype=dtype)  # [B, T, D]
    # -||q - k||^2 via the expanded form: three MXU/VPU-friendly contractions
    # instead of materializing [B, T, L, D].
    qq = jnp.sum(q * q, axis=-1)[:, :, None]  # [B, T, 1]
    kk = jnp.sum(keys * keys, axis=-1)[:, None, :]  # [B, 1, L]
    qk = jnp.einsum("btd,bld->btl", q, keys, preferred_element_type=dtype)
    scores = -(qq - 2.0 * qk + kk) / jnp.sqrt(jnp.asarray(q.shape[-1], dtype))
    scores = jnp.where(token_mask[:, None, :] > 0, scores, _NEG_INF)
    return jax.nn.log_softmax(scores.astype(jnp.float32), axis=-1)


def _padded_log_p(
    log_p: jnp.ndarray, token_mask: jnp.ndarray, frame_mask: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rewrite padding so static-shape recursions end at (T_b-1, L_b-1).

    For frames past a sample's real length the only allowed state is the LAST
    valid token (score 0 there, -inf elsewhere), and the last REAL frame is
    additionally constrained to that token — without the endpoint constraint a
    Viterbi/forward-sum path could defer its arrival at L_b-1 into the padded
    tail, leaving the final token zero real frames. Together the two rewrites
    make evaluating/backtracking at the static final frame exactly equivalent to
    evaluating at (T_b-1, L_b-1)."""
    l_valid = jnp.sum(token_mask, axis=-1).astype(jnp.int32)  # [B]
    t_valid = jnp.sum(frame_mask, axis=-1).astype(jnp.int32)  # [B]
    L = log_p.shape[-1]
    last_tok = jax.nn.one_hot(l_valid - 1, L, dtype=log_p.dtype)  # [B, L]
    pad_row = jnp.where(last_tok > 0, 0.0, _NEG_INF)  # [B, L]
    t_idx = jnp.arange(log_p.shape[1])[None, :]  # [1, T]
    is_end = (t_idx == (t_valid - 1)[:, None])[:, :, None]  # [B, T, 1]
    log_p = jnp.where(is_end & (last_tok[:, None, :] == 0), _NEG_INF, log_p)
    live = frame_mask[:, :, None] > 0
    return jnp.where(live, log_p, pad_row[:, None, :]), l_valid, t_valid


def forward_sum_loss(
    log_p: jnp.ndarray,  # [B, T, L] from log_probs
    token_mask: jnp.ndarray,
    frame_mask: jnp.ndarray,
) -> jnp.ndarray:
    """-log sum over monotonic alignments (CTC-like), mean over batch, per-frame.

    alpha[t, j] = log_p[t, j] + logaddexp(alpha[t-1, j], alpha[t-1, j-1]);
    loss_b = -alpha[T_b-1, L_b-1] / T_b."""
    log_p, l_valid, t_valid = _padded_log_p(log_p, token_mask, frame_mask)
    b, t_max, l_max = log_p.shape
    alpha0 = jnp.full((b, l_max), _NEG_INF).at[:, 0].set(log_p[:, 0, 0])

    def step(alpha, lp_t):
        prev = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=_NEG_INF)[:, :-1]
        alpha = lp_t + jnp.logaddexp(alpha, prev)
        return alpha, None

    alpha, _ = jax.lax.scan(step, alpha0, jnp.moveaxis(log_p[:, 1:], 1, 0))
    final = jnp.sum(alpha * jax.nn.one_hot(l_valid - 1, l_max), axis=-1)  # [B]
    return jnp.mean(-final / jnp.maximum(t_valid.astype(jnp.float32), 1.0))


def mas_durations(
    log_p: jnp.ndarray,  # [B, T, L]; call under stop_gradient (hard targets)
    token_mask: jnp.ndarray,
    frame_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Viterbi monotonic alignment → per-token durations [B, L] int32.

    Forward: best[t, j] = log_p[t, j] + max(best[t-1, j], best[t-1, j-1]), with the
    stay/advance choice recorded. Backward: from (T-1, L_b-1), j -= choice[t][j].
    Durations are frame counts per token over the REAL frames only."""
    log_p, l_valid, t_valid = _padded_log_p(log_p, token_mask, frame_mask)
    b, t_max, l_max = log_p.shape
    best0 = jnp.full((b, l_max), _NEG_INF).at[:, 0].set(log_p[:, 0, 0])

    def fwd(best, lp_t):
        prev = jnp.pad(best, ((0, 0), (1, 0)), constant_values=_NEG_INF)[:, :-1]
        advance = prev > best  # True → came from j-1
        best = lp_t + jnp.where(advance, prev, best)
        return best, advance

    _, choices = jax.lax.scan(fwd, best0, jnp.moveaxis(log_p[:, 1:], 1, 0))
    # choices: [T-1, B, L] for frames 1..T-1.

    j_last = l_valid - 1  # [B] path ends at the last valid token

    def bwd(j, adv_t):
        took = jnp.take_along_axis(adv_t, j[:, None], axis=-1)[:, 0]
        j_prev = j - took.astype(jnp.int32)
        return j_prev, j

    j0, path_rev = jax.lax.scan(bwd, j_last, choices, reverse=True)
    path = jnp.concatenate([j0[None], path_rev], axis=0)  # [T, B] token per frame
    onehot = jax.nn.one_hot(path.T, l_max, dtype=jnp.float32)  # [B, T, L]
    dur = jnp.sum(onehot * frame_mask[:, :, None], axis=1)  # padded frames excluded
    return dur.astype(jnp.int32)


def bin_loss(
    log_p: jnp.ndarray,  # [B, T, L]
    durations: jnp.ndarray,  # [B, L] int32 (MAS output)
    frame_mask: jnp.ndarray,
) -> jnp.ndarray:
    """-mean log p along the hard path (sharpens the soft alignment onto the
    extracted one; RAD-TTS' binarization term)."""
    cum = jnp.cumsum(durations, axis=-1)  # [B, L]
    t_idx = jnp.arange(log_p.shape[1])[None, :, None]
    token_idx = jnp.sum(cum[:, None, :] <= t_idx, axis=-1)
    token_idx = jnp.minimum(token_idx, log_p.shape[-1] - 1)  # [B, T]
    onpath = jnp.take_along_axis(log_p, token_idx[:, :, None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(frame_mask), 1.0)
    return -jnp.sum(onpath * frame_mask) / denom


def token_pitch(
    pitch_frames: jnp.ndarray,  # [B, T]
    durations: jnp.ndarray,  # [B, L]
    frame_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Per-token mean of a frame-level feature under the given segmentation
    (used to re-pool pitch targets once MAS durations replace the collate-time
    uniform spread). Returns [B, L]."""
    cum = jnp.cumsum(durations, axis=-1)
    t_idx = jnp.arange(pitch_frames.shape[1])[None, :, None]
    token_idx = jnp.sum(cum[:, None, :] <= t_idx, axis=-1)
    token_idx = jnp.minimum(token_idx, durations.shape[-1] - 1)
    onehot = jax.nn.one_hot(token_idx, durations.shape[-1], dtype=jnp.float32)
    onehot = onehot * frame_mask[:, :, None]
    sums = jnp.einsum("btl,bt->bl", onehot, pitch_frames)
    counts = jnp.sum(onehot, axis=1)
    return sums / jnp.maximum(counts, 1.0)


def diagnostics(
    log_p: jnp.ndarray, durations: jnp.ndarray, frame_mask: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Aligner health metrics: mean on-path prob (confidence) and duration entropy."""
    conf = jnp.exp(-bin_loss(log_p, durations, frame_mask))
    return {"align_conf": conf}
