"""Alignment learning: text↔mel aligner with monotonic alignment search (MAS).

The reference's external model learns alignments internally (its autoregressive
decoder attends over text — services/tts/core/synthesizer.py:344-350), so it trains
from raw (text, audio) pairs. This module gives the in-repo FastPitch-class stack the
same capability: duration targets are EXTRACTED from the data rather than supplied by
a manifest or an external forced aligner.

Design (Glow-TTS-style likelihood alignment; see log_probs for the measured
failure analysis that drove it):

  * a per-token MLP head (own token embedding — decoupled from the acoustic
    encoder so the aligner cannot be starved by acoustic-loss gradients) predicts
    a mel-space PROTOTYPE per token; the frame "query" is the CMN-normalized
    short-window mel frame itself (data.py's `align_mel`, win = hop — no learned
    mel encoder, no cross-frame blur); the alignment score is the negative
    temperature-scaled squared distance plus a learnable normalized-position
    diagonal term, log-softmax-normalized over tokens per frame;
  * `forward_sum_loss` — the differentiable CTC-like marginalization over all
    monotonic paths — trains the prototypes;
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
    """Token→mel-prototype head (Glow-TTS-style likelihood alignment).

    There is deliberately NO learned mel-side encoder (see log_probs: the frame
    "query" is the CMN-normalized mel frame itself). `dim` is the hidden width
    of the per-token prototype MLP; the TEXT side is context-INDEPENDENT
    (kernel-1 convs — a per-token MLP over the embedding), so a symbol has one
    prototype and alignment is anchored to phoneme identity."""
    ks = jax.random.split(rng, 3)
    return {
        "embed": layers.embedding_init(ks[0], cfg.vocab_size, dim),
        "t_c1": layers.conv1d_init(ks[1], dim, dim, 1),
        "t_c2": layers.conv1d_init(ks[2], dim, cfg.n_mels, 1),
        # Learnable distance temperature (softplus'd): scores =
        # -softplus(temp) * mean-squared CMN-mel distance.
        "temp": jnp.asarray(1.0, jnp.float32),
        # Learnable normalized-position diagonal coefficient (softplus'd in
        # log_probs; init ~100 ↔ a Gaussian prior of width 0.07 in normalized
        # coordinates). See log_probs for why this is load-bearing.
        "diag": jnp.asarray(100.0, jnp.float32),
    }


def diagonal_prior(
    token_mask: jnp.ndarray,  # [B, L]
    frame_mask: jnp.ndarray,  # [B, T]
    sigma: float = 0.12,
) -> jnp.ndarray:
    """Static near-diagonal alignment prior, log-space, [B, T, L].

    The forward-sum objective alone has strong off-diagonal local optima — with
    random-init projections the soft alignment mass lands on arbitrary tokens and
    the gradient reinforces whatever it lands on (measured here: dur_corr
    plateaus ≈0.2 on the variable-duration corpus with no prior). RAD-TTS and
    "One TTS Alignment To Rule Them All" solve this with a static 2D
    near-diagonal prior over normalized positions, annealed away once the learned
    scores carry the alignment. Gaussian in normalized coordinates (the
    beta-binomial of the papers has the same shape; a Gaussian keeps it one fused
    VPU expression): -0.5 * ((j+.5)/L_b - (t+.5)/T_b)^2 / sigma^2, per-sample
    valid lengths from the masks. Added to the UNNORMALIZED scores (pre-softmax),
    so the result stays a proper log-distribution over tokens."""
    l_valid = jnp.maximum(jnp.sum(token_mask, axis=-1), 1.0)  # [B]
    t_valid = jnp.maximum(jnp.sum(frame_mask, axis=-1), 1.0)  # [B]
    t_pos = (jnp.arange(frame_mask.shape[1])[None, :] + 0.5) / t_valid[:, None]
    j_pos = (jnp.arange(token_mask.shape[1])[None, :] + 0.5) / l_valid[:, None]
    d = t_pos[:, :, None] - j_pos[:, None, :]  # [B, T, L]
    return -0.5 * (d / sigma) ** 2


def log_probs(
    p: Params,
    tokens: jnp.ndarray,  # [B, L] int32
    mel: jnp.ndarray,  # [B, T, n_mels]
    token_mask: jnp.ndarray,  # [B, L]
    dtype=jnp.float32,
    prior: jnp.ndarray = None,  # [B, T, L] log-space (diagonal_prior), optional
    frame_mask: jnp.ndarray = None,  # [B, T]; None = all frames valid
) -> jnp.ndarray:
    """log p(token j | frame t): [B, T, L], log-softmax over valid tokens.

    Scores = -softplus(temp) * mean-squared distance between the CMN-normalized
    mel FRAME (the query is the data itself — no learned mel encoder) and a
    per-token predicted mel PROTOTYPE, plus a learnable normalized-position
    diagonal term. Both design points are load-bearing, established by measured
    failures of the usual two-tower encoder design on the deterministic corpus:

    * No mel encoder: with a learned conv encoder (RF 5) the forward-sum
      objective is satisfied by ANY monotone segmentation the encoder can
      memorize per utterance — it confidently (p~0.99, loss 0.06) learned a
      systematically time-warped alignment (vowels absorbing 13-26 frames,
      dur MAE 4.4, corr 0.23), and mel-noise + k=1 ablations didn't recover.
      With the raw (CMN'd) frame as the query, a warped segment forces the
      symbol's shared prototype to cover alien frames at real L2 cost, so the
      true segmentation — the monotone, symbol-tied k-means optimum — is the
      objective's minimum (Glow-TTS's likelihood-MAS argument with an
      identity-covariance Gaussian per token).

    * Position term: text keys are context-independent (identical symbols →
      identical prototypes), so on content alone a correct frame scores at most
      1/multiplicity under the per-frame softmax — on real sentences (8× "<sp>",
      3× "S", ...) the TRUE alignment pays -log(multiplicity) per frame and
      LOSES to parking ~all frames on one unique-symbol token at p~0.9 with
      1-frame visits elsewhere (measured: dur MAE 4.8, corr 0.13, even with an
      annealed static prior). (t/T - j/L) in the score makes each occurrence
      distinct and far-off-diagonal hogging expensive; the coefficient is
      learnable (softplus, init ~100 ≈ Gaussian width 0.07 normalized).

    CMN (per-utterance cepstral mean subtraction over valid frames) removes the
    speaker's average loudness/tilt so shared prototypes fit across speakers."""
    keys = layers.embedding(p["embed"], tokens, dtype)
    keys = layers.conv1d(p["t_c1"], keys, dtype=dtype)
    keys = layers.conv1d(p["t_c2"], jax.nn.relu(keys), dtype=dtype)  # [B, L, n_mels]
    if frame_mask is None:
        fm = jnp.ones(mel.shape[:2], dtype)
    else:
        fm = frame_mask.astype(dtype)
    denom = jnp.maximum(jnp.sum(fm, axis=1, keepdims=True), 1.0)[..., None]
    cmn = jnp.sum(mel.astype(dtype) * fm[:, :, None], axis=1, keepdims=True) / denom
    q = mel.astype(dtype) - cmn  # [B, T, n_mels]
    # ||q - k||^2 / n_mels via the expanded form — one MXU contraction, no
    # [B, T, L, n_mels] materialization.
    qq = jnp.sum(q * q, axis=-1)[:, :, None]  # [B, T, 1]
    kk = jnp.sum(keys * keys, axis=-1)[:, None, :]  # [B, 1, L]
    qk = jnp.einsum("btd,bld->btl", q, keys, preferred_element_type=dtype)
    dist = (qq - 2.0 * qk + kk) / q.shape[-1]
    scores = -jax.nn.softplus(p["temp"]).astype(dtype) * dist
    l_valid = jnp.maximum(jnp.sum(token_mask, axis=-1), 1.0)  # [B]
    if frame_mask is None:
        t_valid = jnp.full((tokens.shape[0],), mel.shape[1], jnp.float32)
    else:
        t_valid = jnp.maximum(jnp.sum(frame_mask, axis=-1), 1.0)
    t_pos = (jnp.arange(mel.shape[1])[None, :] + 0.5) / t_valid[:, None]
    j_pos = (jnp.arange(tokens.shape[1])[None, :] + 0.5) / l_valid[:, None]
    d = (t_pos[:, :, None] - j_pos[:, None, :]).astype(scores.dtype)
    scores = scores - jax.nn.softplus(p["diag"]).astype(scores.dtype) * d * d
    if prior is not None:
        scores = scores + prior.astype(scores.dtype)
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
