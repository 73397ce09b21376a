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
    f32 LN → per-head Q/K/V matmuls (weights pre-split per head so no lane-dim
    activation slicing) → blocked-local or full attention (f32 logits/softmax)
    → per-head out-proj accumulated in f32 → residual+mask
    → f32 LN → conv-FFN as 3 shifted MXU matmuls per conv (k=3 taps) → residual+mask
  final LN → out

Attention semantics match `layers.mha` / `layers.local_mha` exactly: key-mask bias
-1e9, f32 softmax, blocked-local span = own block + both neighbors (zero-padded edges
masked).  The conv-FFN matches `layers.conv1d(SAME, k=3)`: y[t] = x[t-1]·w0 + x[t]·w1
+ x[t+1]·w2 (sequence edges zero — identical to XLA SAME padding since padded rows are
masked to zero between sublayers).

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


def stack_block_params(blocks, n_heads: int):
    """Stack a `layers.transformer_stack` blocks list into per-layer arrays with
    per-head weight splits (kernel layout).  Pure jnp — safe to call under jit.

    Returns a dict:
      ln1_g/ln1_b/ln2_g/ln2_b [L, D]
      wqkv [L, 3, H, D, dh]   bqkv [L, 3, H, dh]
      wo   [L, H, dh, D]      bo   [L, D]
      w1   [L, 3, D, F]       b1   [L, F]     (conv tap-major, torch/WIO layout)
      w2   [L, 3, F, D]       b2   [L, D]
    """
    d = blocks[0]["attn"]["q"]["w"].shape[0]
    dh = d // n_heads

    def per_head_in(w):  # [D, D] -> [H, D, dh]
        return jnp.transpose(w.reshape(d, n_heads, dh), (1, 0, 2))

    def stack(fn):
        return jnp.stack([fn(b) for b in blocks])

    return {
        "ln1_g": stack(lambda b: b["ln1"]["g"]),
        "ln1_b": stack(lambda b: b["ln1"]["b"]),
        "ln2_g": stack(lambda b: b["ln2"]["g"]),
        "ln2_b": stack(lambda b: b["ln2"]["b"]),
        "wqkv": stack(
            lambda b: jnp.stack(
                [per_head_in(b["attn"][k]["w"]) for k in ("q", "k", "v")]
            )
        ),
        "bqkv": stack(
            lambda b: jnp.stack(
                [b["attn"][k]["b"].reshape(n_heads, dh) for k in ("q", "k", "v")]
            )
        ),
        "wo": stack(lambda b: b["attn"]["o"]["w"].reshape(n_heads, dh, d)),
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
    """a [M, K] · b [N, K] -> [M, N], f32 accumulation (logits layout: both operands
    contract their last dim — no explicit transpose)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _stack_kernel(
    # --- VMEM-blocked tensor inputs
    x_ref,  # [rows, T, D]
    mask_ref,  # [rows, T]
    # --- small resident params
    ln1g_ref, ln1b_ref, ln2g_ref, ln2b_ref,  # [L, D]
    bqkv_ref,  # [L, 3, H, dh]
    bo_ref,  # [L, D]
    b1_ref,  # [L, F]
    b2_ref,  # [L, D]
    lnog_ref, lnob_ref,  # [1, D]
    # --- streamed weights (HBM)
    wqkv_ref,  # [L, 3, H, D, dh]
    wo_ref,  # [L, H, dh, D]
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
    scale = 1.0 / math.sqrt(dh)
    local = window is not None and 3 * window < t_len
    w = window if local else 0
    kv_len = t_len + 2 * w  # zero-padded neighbor halo in local mode

    def body(act, qh, khp, vhp, attnh, biasp, wqkv_s, wo_s, w1_s, w2_s, sem_w):
        # Insert the minor dim while still f32 (Mosaic only supports non-no-op minor
        # dim insertion for 32-bit types), then cast.
        mask_f = mask_ref[:][..., None].astype(compute_dtype)  # [rows, T, 1]
        act[:] = x_ref[:].astype(compute_dtype)
        # Key bias over the (padded) key axis: -1e9 at masked/halo positions.
        biasp[:] = jnp.full((rows, kv_len), NEG, jnp.float32)
        biasp[:, w : w + t_len] = jnp.where(
            mask_ref[:].astype(jnp.float32) > 0.0, 0.0, NEG
        )
        if local:  # zero the halo rows once; layer loop only rewrites the center
            khp[:, :w, :] = jnp.zeros((rows, w, dh), compute_dtype)
            khp[:, w + t_len :, :] = jnp.zeros((rows, w, dh), compute_dtype)
            vhp[:, :w, :] = jnp.zeros((rows, w, dh), compute_dtype)
            vhp[:, w + t_len :, :] = jnp.zeros((rows, w, dh), compute_dtype)

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

            # ---- attention: per-head Q/K/V (weights pre-split per head: result lane
            # dim is dh — no half-lane activation slicing), f32 logits/softmax.
            acc = jnp.broadcast_to(
                bo_ref[l].astype(jnp.float32)[None, None], (rows, t_len, d)
            )
            for h in range(n_heads):
                q = (
                    jnp.dot(flat, wqkv_s[slot, 0, h], preferred_element_type=jnp.float32)
                    + bqkv_ref[l, 0, h]
                ).astype(compute_dtype)
                k = (
                    jnp.dot(flat, wqkv_s[slot, 1, h], preferred_element_type=jnp.float32)
                    + bqkv_ref[l, 1, h]
                ).astype(compute_dtype)
                v = (
                    jnp.dot(flat, wqkv_s[slot, 2, h], preferred_element_type=jnp.float32)
                    + bqkv_ref[l, 2, h]
                ).astype(compute_dtype)
                qh[:] = q.reshape(rows, t_len, dh)
                khp[:, w : w + t_len, :] = k.reshape(rows, t_len, dh)
                vhp[:, w : w + t_len, :] = v.reshape(rows, t_len, dh)

                if local:
                    nb = t_len // w
                    for s in range(rows):
                        def blk(b, _):
                            qb = qh[s, pl.ds(b * w, w), :]
                            kb = khp[s, pl.ds(b * w, 3 * w), :]
                            logits = _dot_nt(qb, kb) * scale
                            logits = logits + biasp[s, pl.ds(b * w, 3 * w)][None, :]
                            p = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
                            ab = jnp.dot(
                                p, vhp[s, pl.ds(b * w, 3 * w), :],
                                preferred_element_type=jnp.float32,
                            )
                            attnh[s, pl.ds(b * w, w), :] = ab.astype(compute_dtype)
                            return 0
                        jax.lax.fori_loop(0, nb, blk, 0)
                else:
                    for s in range(rows):
                        logits = _dot_nt(qh[s], khp[s]) * scale
                        logits = logits + biasp[s][None, :]
                        p = jax.nn.softmax(logits, axis=-1).astype(compute_dtype)
                        ab = jnp.dot(
                            p, vhp[s], preferred_element_type=jnp.float32
                        )
                        attnh[s, :, :] = ab.astype(compute_dtype)

                acc = acc + jnp.dot(
                    attnh[:].reshape(rows * t_len, dh),
                    wo_s[slot, h],
                    preferred_element_type=jnp.float32,
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
        pltpu.VMEM((rows, t_len, dh), compute_dtype),  # qh
        pltpu.VMEM((rows, kv_len, dh), compute_dtype),  # khp
        pltpu.VMEM((rows, kv_len, dh), compute_dtype),  # vhp
        pltpu.VMEM((rows, t_len, dh), compute_dtype),  # attnh
        pltpu.VMEM((rows, kv_len), jnp.float32),  # biasp
        pltpu.VMEM((2, 3, n_heads, d, dh), compute_dtype),
        pltpu.VMEM((2, n_heads, dh, d), compute_dtype),
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
        want = 8 if t <= 128 else 2
        rows_per_step = 1
        for cand in (want, want // 2, 2):
            if cand >= 1 and b % cand == 0:
                rows_per_step = cand
                break
    rows = rows_per_step
    local = window is not None and 3 * window < t
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
            pl.BlockSpec((rows, t), lambda i: (i, 0), memory_space=pltpu.VMEM),
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
        mask.astype(jnp.float32),
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
