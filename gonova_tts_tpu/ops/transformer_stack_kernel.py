"""Whole-stack fused transformer kernel: all acoustic encoder/decoder layers in ONE
pallas_call.

Why: PERF.md's acoustic breakdown shows the stage is op-count-bound — every XLA fused
region costs ~30-40 µs regardless of FLOPs, and a 4-layer stack is ~50 regions
(LN/QKV/logits/softmax/AV/out-proj/residual/conv-FFN per layer), so the encoder+decoder
burn 2.1 ms where the FLOPs cost ~0.6 ms.  This kernel applies the pattern that won for
the vocoder (`ops/vocos_stack_kernel.py`): one grid step processes a batch tile through
the ENTIRE layer stack with the activation resident in VMEM, while each layer's big
weight matrices stream from HBM with double buffering (next layer's weights DMA while
the current layer computes).

Per grid step (ROWS batch rows, full sequence):
  act [rows, T, D] resident in VMEM (compute dtype)
  for each layer l:                 (weights DMA'd into slot l%2; slot l+1 prefetched)
    f32 LN → per-head Q/K/V nt-matmuls → blocked-local or full attention
    (f32 logits/softmax) → per-head out-proj accumulated in f32 → residual+mask
    → f32 LN → conv-FFN as 3 shifted MXU matmuls per conv (k=3 taps) → residual+mask
  final LN → out

Mosaic layout rules shape the weight layout (learned on-chip, see git history):
memref/value slices must be 128-lane aligned, so (a) Q/K/V for ALL heads come from
one [D, 3*H*dh_pad] matmul whose per-head column groups are zero-padded to
dh_pad = 128 lanes — every per-head slice lands on a 128 boundary, and the zero
lanes flow through logits/AV/out-proj contributing exactly zero (wo has zero rows
at the pads); (b) per-head attention outputs concatenate in a [rows, T, H*dh_pad]
scratch so the out-projection is ONE matmul; (c) key masking is computed from a
broadcasted iota against per-sequence lengths instead of slicing a bias row at
64-wide offsets.  Sequences longer than the VMEM budget (T > 768 at F=1024) are
the caller's problem — `acoustic._stack` falls back to XLA there (the long-form
buckets are bandwidth-friendly under XLA's local attention already).

Masking note: the kernel assumes prefix masks (mask[i] = arange(T) < length_i) for
the BLOCKED-LOCAL path — every mask in this framework is a padded prefix mask.  The
full-attention path supports arbitrary masks (it reads whole mask rows).

Attention semantics match `layers.mha` / `layers.local_mha` exactly: -1e9 key bias,
f32 softmax, blocked-local span = own block + both neighbors (zero-padded edges
masked).  The conv-FFN matches `layers.conv1d(SAME, k=3)`: y[t] = x[t-1]·w0 + x[t]·w1
+ x[t+1]·w2, sequence edges zero.

allclose-tested against `layers.transformer_stack` in tests/test_kernels.py (interpret
mode, f32); the engine enables it on the TPU backend for inference only (training keeps
the XLA path — this kernel defines no VJP).

Reference analog: none — the reference's model is external torch
(services/tts/core/synthesizer.py:185); this is the TPU-native acoustic compute path.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def stack_block_params(blocks, n_heads: int):
    """Stack a `layers.transformer_stack` blocks list into per-layer arrays in the
    kernel layout (see module docstring).  Pure jnp — safe to call under jit.

    Returns a dict:
      ln1_g/ln1_b/ln2_g/ln2_b [L, D]
      wqkv [L, 3, H, dh_pad, D]  (transposed + head-padded)   bqkv [L, 3, H, dh_pad]
      wo   [L, H, dh_pad, D]     (head-padded)                bo   [L, D]
      w1   [L, 3, D, F]          b1 [L, F]     (conv tap-major, WIO layout)
      w2   [L, 3, F, D]          b2 [L, D]
    """
    d = blocks[0]["attn"]["q"]["w"].shape[0]
    dh = d // n_heads
    dh_pad = _round_up(dh, LANE)

    def head_cols(w):  # [D, D] -> [D, H*dh_pad]: per-head columns padded to 128 lanes
        ht = w.reshape(d, n_heads, dh)
        return jnp.pad(ht, ((0, 0), (0, 0), (0, dh_pad - dh))).reshape(d, n_heads * dh_pad)

    def head_bias(b):  # [D] -> [H*dh_pad]
        return jnp.pad(b.reshape(n_heads, dh), ((0, 0), (0, dh_pad - dh))).reshape(-1)

    def wo_padded(w):  # [D, D] -> [H*dh_pad, D]: zero rows in the head pads
        return jnp.pad(
            w.reshape(n_heads, dh, d), ((0, 0), (0, dh_pad - dh), (0, 0))
        ).reshape(n_heads * dh_pad, d)

    def stack(fn):
        return jnp.stack([fn(b) for b in blocks])

    return {
        "ln1_g": stack(lambda b: b["ln1"]["g"]),
        "ln1_b": stack(lambda b: b["ln1"]["b"]),
        "ln2_g": stack(lambda b: b["ln2"]["g"]),
        "ln2_b": stack(lambda b: b["ln2"]["b"]),
        # One [D, 3*H*dh_pad] matrix: q, then k, then v column groups.
        "wqkv": stack(
            lambda b: jnp.concatenate(
                [head_cols(b["attn"][k]["w"]) for k in ("q", "k", "v")], axis=1
            )
        ),
        "bqkv": stack(
            lambda b: jnp.concatenate(
                [head_bias(b["attn"][k]["b"]) for k in ("q", "k", "v")]
            )
        ),
        "wo": stack(lambda b: wo_padded(b["attn"]["o"]["w"])),
        "bo": stack(lambda b: b["attn"]["o"]["b"]),
        "w1": stack(lambda b: b["ff1"]["w"]),
        "b1": stack(lambda b: b["ff1"]["b"]),
        "w2": stack(lambda b: b["ff2"]["w"]),
        "b2": stack(lambda b: b["ff2"]["b"]),
    }


def _zero_map(ndim: int):
    """Index map pinning a resident (non-blocked) input to block (0, ..., 0)."""
    return lambda i: (0,) * ndim


def _ln(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * g + b


def _dot_nt(a, b):
    """a [M, K] · b [N, K] -> [M, N], f32 accumulation (contract both last dims)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _stack_kernel(
    # --- VMEM-blocked tensor inputs
    x_ref,  # [rows, T, D]
    mask_ref,  # [rows, 1, T] f32 (middle singleton keeps the block spec tile-legal)
    # --- small resident params
    ln1g_ref, ln1b_ref, ln2g_ref, ln2b_ref,  # [L, D]
    bqkv_ref,  # [L, 3*H*dh_pad]
    bo_ref,  # [L, D]
    b1_ref,  # [L, F]
    b2_ref,  # [L, D]
    lnog_ref, lnob_ref,  # [1, D]
    # --- streamed weights (HBM)
    wqkv_ref,  # [L, D, 3*H*dh_pad]
    wo_ref,  # [L, H*dh_pad, D]
    w1_ref,  # [L, 3, D, F]
    w2_ref,  # [L, 3, F, D]
    # --- output
    out_ref,  # [rows, T, D]
    *,
    n_layers: int,
    n_heads: int,
    window: Optional[int],
    eps: float,
    compute_dtype,
):
    rows, t_len, d = out_ref.shape
    dh = d // n_heads
    dh_pad = wo_ref.shape[-2] // n_heads
    hp = n_heads * dh_pad
    scale = 1.0 / math.sqrt(dh)
    # 2*window threshold — see layers.transformer_block: in (2w, 3w] local
    # and full genuinely differ, and the dispatch must be shape-independent.
    local = window is not None and 2 * window < t_len
    w = window if local else 0
    kv_len = t_len + 2 * w  # zero halo in local mode

    def body(act, khp, vhp, attnh, wqkv_s, wo_s, w1_s, w2_s, sem_w):
        mask_all = mask_ref[:].reshape(rows, t_len)  # f32 (one full read, no slicing)
        # Insert the minor dim while still f32 (Mosaic restricts non-no-op minor-dim
        # insertion to 32-bit types), then cast.
        mask_f = mask_all[..., None].astype(compute_dtype)  # [rows, T, 1]
        act[:] = x_ref[:].astype(compute_dtype)
        if local:
            # Prefix-mask lengths per sequence: key validity is 0 <= pos < length.
            lengths = jnp.sum(mask_all, axis=1)  # [rows] f32
            khp[:, :w, :] = jnp.zeros((rows, w, hp), compute_dtype)
            khp[:, w + t_len :, :] = jnp.zeros((rows, w, hp), compute_dtype)
            vhp[:, :w, :] = jnp.zeros((rows, w, hp), compute_dtype)
            vhp[:, w + t_len :, :] = jnp.zeros((rows, w, hp), compute_dtype)
        else:
            # Arbitrary-mask bias rows, one per sequence.
            bias_all = jnp.where(mask_all > 0.0, 0.0, NEG)  # [rows, T] f32

        def start_w(l, slot):
            pltpu.make_async_copy(wqkv_ref.at[l], wqkv_s.at[slot], sem_w.at[slot, 0]).start()
            pltpu.make_async_copy(wo_ref.at[l], wo_s.at[slot], sem_w.at[slot, 1]).start()
            pltpu.make_async_copy(w1_ref.at[l], w1_s.at[slot], sem_w.at[slot, 2]).start()
            pltpu.make_async_copy(w2_ref.at[l], w2_s.at[slot], sem_w.at[slot, 3]).start()

        def wait_w(l, slot):
            pltpu.make_async_copy(wqkv_ref.at[l], wqkv_s.at[slot], sem_w.at[slot, 0]).wait()
            pltpu.make_async_copy(wo_ref.at[l], wo_s.at[slot], sem_w.at[slot, 1]).wait()
            pltpu.make_async_copy(w1_ref.at[l], w1_s.at[slot], sem_w.at[slot, 2]).wait()
            pltpu.make_async_copy(w2_ref.at[l], w2_s.at[slot], sem_w.at[slot, 3]).wait()

        start_w(0, 0)
        for l in range(n_layers):
            slot = l % 2
            if l + 1 < n_layers:
                start_w(l + 1, (l + 1) % 2)
            wait_w(l, slot)

            xs = act[:]  # [rows, T, D]
            normed = _ln(xs, ln1g_ref[l], ln1b_ref[l], eps).astype(compute_dtype)
            flat = normed.reshape(rows * t_len, d)

            # ---- attention: ONE [D, 3*H*dh_pad] matmul produces q/k/v for every
            # head (per-head columns zero-padded to 128 lanes, so all value/ref
            # slices below are 128-aligned).  Zero-padded head lanes contribute
            # q_pad·k_pad = 0 to logits, zero attn output, and map to zero through
            # the zero rows of wo — exactness is free.
            qkv = (
                jnp.dot(flat, wqkv_s[slot], preferred_element_type=jnp.float32)
                + bqkv_ref[l]
            ).astype(compute_dtype)  # [rows*T, 3*H*dh_pad]
            q3 = qkv[:, :hp].reshape(rows, t_len, hp)
            khp[:, w : w + t_len, :] = qkv[:, hp : 2 * hp].reshape(rows, t_len, hp)
            vhp[:, w : w + t_len, :] = qkv[:, 2 * hp :].reshape(rows, t_len, hp)

            for h in range(n_heads):
                hs = h * dh_pad
                if local:
                    nb = t_len // w
                    for s in range(rows):
                        len_s = lengths[s]
                        q_sh = q3[s, :, hs : hs + dh_pad]  # value slice, 128-aligned

                        def blk(b, _, s=s, len_s=len_s, q_sh=q_sh, hs=hs):
                            qb = jax.lax.dynamic_slice(
                                q_sh, (b * w, 0), (w, dh_pad)
                            )
                            kb = khp[s, pl.ds(b * w, 3 * w), hs : hs + dh_pad]
                            logits = _dot_nt(qb, kb) * scale  # [w, 3w] f32
                            pos = (
                                jax.lax.broadcasted_iota(jnp.int32, (1, 3 * w), 1)
                                + b * w
                                - w
                            )
                            valid = (pos >= 0) & (pos.astype(jnp.float32) < len_s)
                            logits = logits + jnp.where(valid, 0.0, NEG)
                            p = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
                            ab = jnp.dot(
                                p, vhp[s, pl.ds(b * w, 3 * w), hs : hs + dh_pad],
                                preferred_element_type=jnp.float32,
                            )
                            attnh[s, pl.ds(b * w, w), hs : hs + dh_pad] = ab.astype(
                                compute_dtype
                            )
                            return 0

                        jax.lax.fori_loop(0, nb, blk, 0)
                else:
                    for s in range(rows):
                        q_sh = q3[s, :, hs : hs + dh_pad]
                        logits = (
                            _dot_nt(q_sh, khp[s, :, hs : hs + dh_pad]) * scale
                        )  # [T, T] f32
                        logits = logits + bias_all[s][None, :]
                        p = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
                        ab = jnp.dot(
                            p, vhp[s, :, hs : hs + dh_pad],
                            preferred_element_type=jnp.float32,
                        )
                        attnh[s, :, hs : hs + dh_pad] = ab.astype(compute_dtype)

            # One out-projection over the concatenated (padded) heads.
            acc = (
                jnp.dot(
                    attnh[:].reshape(rows * t_len, hp),
                    wo_s[slot],
                    preferred_element_type=jnp.float32,
                )
                + bo_ref[l]
            ).reshape(rows, t_len, d)
            h_res = (xs + acc.astype(compute_dtype)) * mask_f

            # ---- conv-FFN: k=3 SAME conv as 3 shifted MXU matmuls per conv.
            # Per sequence (shifts never cross sequences; bounds the f32 [T, F]
            # tap-accumulation temporaries to one sequence at a time).
            n2_all = _ln(h_res, ln2g_ref[l], ln2b_ref[l], eps).astype(compute_dtype)
            for s in range(rows):
                n2 = n2_all[s]  # [T, D]
                sd = jnp.concatenate([jnp.zeros_like(n2[:1]), n2[:-1]], axis=0)
                su = jnp.concatenate([n2[1:], jnp.zeros_like(n2[:1])], axis=0)
                h1 = (
                    jnp.dot(sd, w1_s[slot, 0], preferred_element_type=jnp.float32)
                    + jnp.dot(n2, w1_s[slot, 1], preferred_element_type=jnp.float32)
                    + jnp.dot(su, w1_s[slot, 2], preferred_element_type=jnp.float32)
                    + b1_ref[l]
                )
                h1 = jax.nn.relu(h1).astype(compute_dtype)  # [T, F]
                hd = jnp.concatenate([jnp.zeros_like(h1[:1]), h1[:-1]], axis=0)
                hu = jnp.concatenate([h1[1:], jnp.zeros_like(h1[:1])], axis=0)
                y = (
                    jnp.dot(hd, w2_s[slot, 0], preferred_element_type=jnp.float32)
                    + jnp.dot(h1, w2_s[slot, 1], preferred_element_type=jnp.float32)
                    + jnp.dot(hu, w2_s[slot, 2], preferred_element_type=jnp.float32)
                    + b2_ref[l]
                )
                act[s, :, :] = (h_res[s] + y.astype(compute_dtype)) * mask_f[s]

        final = _ln(act[:], lnog_ref[0], lnob_ref[0], eps)
        out_ref[:] = final.astype(out_ref.dtype)

    f_dim = b1_ref.shape[-1]
    pl.run_scoped(
        body,
        pltpu.VMEM((rows, t_len, d), compute_dtype),  # act
        pltpu.VMEM((rows, kv_len, hp), compute_dtype),  # khp
        pltpu.VMEM((rows, kv_len, hp), compute_dtype),  # vhp
        pltpu.VMEM((rows, t_len, hp), compute_dtype),  # attnh
        pltpu.VMEM((2, d, 3 * hp), compute_dtype),  # wqkv slots
        pltpu.VMEM((2, hp, d), compute_dtype),  # wo slots
        pltpu.VMEM((2, 3, d, f_dim), compute_dtype),
        pltpu.VMEM((2, 3, f_dim, d), compute_dtype),
        pltpu.SemaphoreType.DMA((2, 4)),
    )


def transformer_stack_pallas(*args, interpret: Optional[bool] = None, **kwargs):
    """Public wrapper: resolves interpret mode (forced on the CPU backend, where
    Mosaic cannot compile) then dispatches to the jitted implementation."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _transformer_stack_pallas(*args, interpret=interpret, **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "window", "eps", "interpret", "bf16", "rows_per_step"),
)
def _transformer_stack_pallas(
    x: jnp.ndarray,  # [B, T, D]
    mask: jnp.ndarray,  # [B, T] (1 = valid)
    stacked: dict,  # from stack_block_params
    ln_out_g: jnp.ndarray,  # [D]
    ln_out_b: jnp.ndarray,  # [D]
    n_heads: int,
    window: Optional[int] = None,
    eps: float = 1e-5,
    interpret: bool = False,
    bf16: bool = True,
    rows_per_step: int = 0,  # 0 = auto
) -> jnp.ndarray:
    """Fused equivalent of `layers.transformer_stack(p, x, n_heads, mask, dtype,
    attention_window=window)`. Output dtype follows the compute dtype choice."""
    b, t, d = x.shape
    n_layers = stacked["ln1_g"].shape[0]
    compute_dtype = jnp.bfloat16 if bf16 else jnp.float32
    if rows_per_step <= 0:
        # The FFN runs per sequence, so the binding VMEM terms are the act/kv/attn
        # scratch and the per-seq f32 [T, F] tap accumulator; short sequences
        # (encoder) can afford more rows per grid step than long ones (decoder).
        # Above T=512 even rows=2 oversubscribes the ~16 MB budget at the default
        # widths (act+kv+attn ~6 MB/row at T=768 plus ~8.4 MB of weight slots),
        # so long buckets drop to one row per step.
        want = 8 if t <= 128 else (2 if t <= 512 else 1)
        rows_per_step = 1
        for cand in (want, want // 2, 2):
            if cand >= 1 and b % cand == 0:
                rows_per_step = cand
                break
    elif b % rows_per_step != 0:
        # A non-divisor would silently TRUNCATE the grid: rows beyond
        # (b // rows_per_step) * rows_per_step would be returned uninitialized.
        raise ValueError(
            f"rows_per_step={rows_per_step} must divide batch {b} (or pass 0 = auto)"
        )
    rows = rows_per_step
    local = window is not None and 2 * window < t
    if local and t % window != 0:
        raise ValueError(f"T={t} must be a multiple of window={window}")

    cd = compute_dtype
    out = pl.pallas_call(
        functools.partial(
            _stack_kernel,
            n_layers=n_layers,
            n_heads=n_heads,
            window=window,
            eps=eps,
            compute_dtype=cd,
        ),
        grid=(b // rows,),
        in_specs=[
            pl.BlockSpec((rows, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, t), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            *[
                pl.BlockSpec(s.shape, _zero_map(s.ndim), memory_space=pltpu.VMEM)
                for s in (
                    stacked["ln1_g"], stacked["ln1_b"], stacked["ln2_g"],
                    stacked["ln2_b"], stacked["bqkv"], stacked["bo"],
                    stacked["b1"], stacked["b2"],
                )
            ],
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # wqkv — streamed
            pl.BlockSpec(memory_space=pl.ANY),  # wo
            pl.BlockSpec(memory_space=pl.ANY),  # w1
            pl.BlockSpec(memory_space=pl.ANY),  # w2
        ],
        out_specs=pl.BlockSpec((rows, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, d), cd),
        interpret=interpret,
    )(
        x.astype(cd),
        mask.astype(jnp.float32).reshape(b, 1, t),
        stacked["ln1_g"], stacked["ln1_b"], stacked["ln2_g"], stacked["ln2_b"],
        stacked["bqkv"].astype(jnp.float32),
        stacked["bo"].astype(jnp.float32),
        stacked["b1"].astype(jnp.float32),
        stacked["b2"].astype(jnp.float32),
        ln_out_g.reshape(1, d).astype(jnp.float32),
        ln_out_b.reshape(1, d).astype(jnp.float32),
        stacked["wqkv"].astype(cd),
        stacked["wo"].astype(cd),
        stacked["w1"].astype(cd),
        stacked["w2"].astype(cd),
    )
    return out
