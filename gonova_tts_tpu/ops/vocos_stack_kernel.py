"""Whole-stack fused NovaVocos kernel: all ConvNeXt blocks in ONE pallas_call.

Why a third generation: per-block kernels (convnext_kernel.py v1/v2) lose ~15% to XLA
because the cost at these sizes is grid-step count and inter-block HBM roundtrips, not
matmul shape (PERF.md).  This kernel runs the ENTIRE block stack for one batch row per
grid step — the activation never leaves VMEM between blocks — and streams each block's
MLP weights from HBM with double buffering so the next block's weights load while the
current block computes (pallas_guide: Double Buffering).

Per grid step (one batch row, full sequence):
  x [T+16, C] resident in VMEM (8 zero rows each side: aligned stores + dw-conv edges)
  for each block l:            (weights DMA'd into slot l%2; slot l+1 prefetched)
      dw conv (7 shifted VPU multiplies) → f32 LN → MXU MLP (bf16 in, f32 acc)
      → layer-scale residual, written back into the VMEM tile
  final tile → out

VMEM budget at C=512, F=1536, T≤512: tile ≤1.1 MB + h ≤3.2 MB + 2 weight slots
(bf16 w1+w2 = 3.2 MB each) ≈ 11 MB.  The wrapper raises for T > MAX_T (long-form
buckets) where the h intermediate would not fit — callers route those through the
pure-XLA stack (models/vocos.py, the production default).

allclose-tested against the pure-JAX stack in tests/test_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD_ROWS = 8  # zero rows each side: store alignment + dw-conv edge context
HALO = 3
MAX_T = 768  # above this, h [T, F] stops fitting comfortably — fall back
ROWS_PER_STEP = 2  # batch rows per grid step: weights stream once per step, not per row


def _stack_kernel(
    x_ref,  # [B, T + 2*PAD_ROWS, C] HBM/ANY
    dw_ref,  # [L, 8, C] VMEM (kernel dim padded 7→8 for alignment)
    dwb_ref,  # [L, C] VMEM
    lng_ref,  # [L, C] VMEM
    lnb_ref,  # [L, C] VMEM
    w1_ref,  # [L, C, F] HBM/ANY (bf16) — streamed per block
    b1_ref,  # [L, F] VMEM
    w2_ref,  # [L, F, C] HBM/ANY (bf16) — streamed per block
    b2_ref,  # [L, C] VMEM
    gamma_ref,  # [L, C] VMEM
    out_ref,  # [1, T, C] VMEM block
    *,
    n_layers: int,
    t_len: int,
    eps: float,
    compute_dtype,
):
    b_idx = pl.program_id(0)
    rows, _, c = out_ref.shape
    f = b1_ref.shape[-1]

    def body(tile, w1s, w2s, sem_x, sem_w):
        # Load `rows` batch rows (with their zero pads) once.
        dma_x = pltpu.make_async_copy(
            x_ref.at[pl.ds(b_idx * rows, rows)], tile, sem_x
        )
        dma_x.start()

        # Prefetch block 0 weights into slot 0.
        def start_w(l, slot):
            pltpu.make_async_copy(w1_ref.at[l], w1s.at[slot], sem_w.at[slot, 0]).start()
            pltpu.make_async_copy(w2_ref.at[l], w2s.at[slot], sem_w.at[slot, 1]).start()

        def wait_w(l, slot):
            pltpu.make_async_copy(w1_ref.at[l], w1s.at[slot], sem_w.at[slot, 0]).wait()
            pltpu.make_async_copy(w2_ref.at[l], w2s.at[slot], sem_w.at[slot, 1]).wait()

        start_w(0, 0)
        dma_x.wait()

        for l in range(n_layers):
            slot = l % 2
            # Prefetch the NEXT block's weights while this block computes.
            if l + 1 < n_layers:
                start_w(l + 1, (l + 1) % 2)
            wait_w(l, slot)

            xs = tile[:]  # [rows, T + 2*PAD_ROWS, C]
            center = xs[:, PAD_ROWS : PAD_ROWS + t_len, :]

            acc = jnp.broadcast_to(
                dwb_ref[l, :][None, None, :].astype(jnp.float32), (rows, t_len, c)
            )
            for j in range(7):
                off = PAD_ROWS - HALO + j
                acc = acc + xs[:, off : off + t_len, :].astype(jnp.float32) * dw_ref[
                    l, j, :
                ][None, None, :].astype(jnp.float32)

            mean = jnp.mean(acc, axis=-1, keepdims=True)
            var = jnp.mean((acc - mean) ** 2, axis=-1, keepdims=True)
            normed = (acc - mean) * jax.lax.rsqrt(var + eps)
            normed = normed * lng_ref[l, :][None, None, :] + lnb_ref[l, :][None, None, :]

            # MLP over all rows at once; h stays in the compute dtype (MXU still
            # accumulates in f32) so [rows*T, F] fits VMEM.
            flat = normed.reshape(rows * t_len, c)
            # Mosaic requires 32-bit matmul accumulation; cast the activation down to
            # the compute dtype right after (bounds the [rows*T, F] live value).
            h = (
                jnp.dot(
                    flat.astype(compute_dtype),
                    w1s[slot],
                    preferred_element_type=jnp.float32,
                )
                + b1_ref[l, :][None, :]
            ).astype(compute_dtype)
            h = jax.nn.gelu(h)
            h = jnp.dot(
                h,
                w2s[slot],
                preferred_element_type=jnp.float32,
            ) + b2_ref[l, :][None, :]
            h = h.reshape(rows, t_len, c)

            result = center + (h * gamma_ref[l, :][None, None, :]).astype(center.dtype)
            # Write back into the padded tile (offset PAD_ROWS = 8, aligned).
            tile[:, PAD_ROWS : PAD_ROWS + t_len, :] = result

        out_ref[:, :, :] = tile[:, PAD_ROWS : PAD_ROWS + t_len, :]

    pl.run_scoped(
        body,
        pltpu.VMEM((rows, t_len + 2 * PAD_ROWS, c), x_ref.dtype),
        pltpu.VMEM((2, c, f), compute_dtype),
        pltpu.VMEM((2, f, c), compute_dtype),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((2, 2)),
    )


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "bf16"))
def vocos_stack_pallas(
    x: jnp.ndarray,  # [B, T, C]
    dw: jnp.ndarray,  # [L, 7, C]
    dw_b: jnp.ndarray,  # [L, C]
    ln_g: jnp.ndarray,  # [L, C]
    ln_b: jnp.ndarray,  # [L, C]
    w1: jnp.ndarray,  # [L, C, F]
    b1: jnp.ndarray,  # [L, F]
    w2: jnp.ndarray,  # [L, F, C]
    b2: jnp.ndarray,  # [L, C]
    gamma: jnp.ndarray,  # [L, C]
    eps: float = 1e-5,
    interpret: bool = False,
    bf16: bool = True,
) -> jnp.ndarray:
    b, t, c = x.shape
    if t > MAX_T:
        raise ValueError(
            f"vocos_stack_pallas: T={t} exceeds MAX_T={MAX_T} (VMEM h-intermediate "
            "budget) — use the pure-XLA stack for long-form buckets"
        )
    n_layers = dw.shape[0]
    compute_dtype = jnp.bfloat16 if bf16 else jnp.float32
    rows = ROWS_PER_STEP if b % ROWS_PER_STEP == 0 else 1
    xp = jnp.pad(x, ((0, 0), (PAD_ROWS, PAD_ROWS), (0, 0)))
    # Pad the dw kernel dim 7 → 8 (sublane alignment for the [L, 8, C] VMEM block).
    dw8 = jnp.pad(dw, ((0, 0), (0, 1), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _stack_kernel,
            n_layers=n_layers,
            t_len=t,
            eps=eps,
            compute_dtype=compute_dtype,
        ),
        grid=(b // rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x rows: kernel DMAs
            pl.BlockSpec(dw8.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(dw_b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(ln_g.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(ln_b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # w1: streamed per block
            pl.BlockSpec(b1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # w2: streamed per block
            pl.BlockSpec(b2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(gamma.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(
        xp,
        dw8,
        dw_b,
        ln_g,
        ln_b,
        w1.astype(compute_dtype),
        b1,
        w2.astype(compute_dtype),
        b2,
        gamma,
    )
    return out
