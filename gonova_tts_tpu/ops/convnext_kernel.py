"""Fused ConvNeXt block kernel (Pallas/TPU) — the NovaVocos hot path.

One vocos block = depthwise conv k=7 → LayerNorm → dense C→F → GELU → dense F→C →
layer-scale residual.  Unfused, that is ~7 XLA kernels with [B, T, C] and [B, T, F]
intermediates round-tripping HBM per block (8 blocks per vocoder pass).  This kernel
keeps tiles resident in VMEM through the whole chain: the depthwise conv is 7 shifted
VPU multiplies over halo'd rows, the two MLP matmuls run on the MXU with f32
accumulation, and only the block output returns to HBM.

v2 notes (after measuring v1 at 2.94 ms vs XLA's 2.63 ms): each grid step now
processes ROWS_PER_TILE batch rows at once, so the pointwise matmuls see
ROWS_PER_TILE × TILE_T rows (MXU efficiency grows with row count — XLA's advantage
was running them over the whole [B*T] extent), and the MLP weights are staged in
bf16 (halves their VMEM footprint).

Halo handling: the host pads the time axis by READ_HALO on both sides (4, keeping DMA
slice lengths 8-aligned for Mosaic); tiles are disjoint on output.

allclose-tested against models/vocos._block_apply in tests/test_kernels.py (interpret
mode on CPU; compiled + measured on TPU — PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 256  # frames per grid step
HALO = 3  # depthwise kernel 7 → ±3
READ_HALO = 4  # DMA'd halo per side — keeps slice length (TILE_T + 8) 8-aligned (Mosaic)
ROWS_PER_TILE = 2  # batch rows per grid step (bigger pointwise matmuls)


def _block_kernel(
    x_ref,  # [B, T_pad + 2*READ_HALO, C] in HBM/ANY (host-padded halo)
    dw_ref,  # [7, C] VMEM
    dwb_ref,  # [1, C] VMEM
    lng_ref,  # [1, C] VMEM
    lnb_ref,  # [1, C] VMEM
    w1_ref,  # [C, F] VMEM (compute dtype)
    b1_ref,  # [1, F] VMEM
    w2_ref,  # [F, C] VMEM (compute dtype)
    b2_ref,  # [1, C] VMEM
    gamma_ref,  # [1, C] VMEM
    out_ref,  # [RB, TILE_T, C] VMEM block
    *,
    eps: float,
    compute_dtype,
):
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    rb, _, c = out_ref.shape
    f = w1_ref.shape[1]
    read_rows = TILE_T + 2 * READ_HALO
    off = READ_HALO - HALO

    def body(scratch, sem):
        dma = pltpu.make_async_copy(
            x_ref.at[
                pl.ds(b_idx * rb, rb), pl.ds(t_idx * TILE_T, read_rows), :
            ],
            scratch,
            sem,
        )
        dma.start()
        dma.wait()
        xs = scratch[:]  # [RB, read_rows, C]
        center = xs[:, READ_HALO : READ_HALO + TILE_T, :]

        # Depthwise conv k=7: seven shifted VPU multiply-adds (per batch row, batched).
        acc = jnp.broadcast_to(
            dwb_ref[0, :][None, None, :].astype(jnp.float32), (rb, TILE_T, c)
        )
        for j in range(7):
            acc = acc + xs[:, off + j : off + j + TILE_T, :].astype(jnp.float32) * dw_ref[
                j, :
            ][None, None, :].astype(jnp.float32)

        # LayerNorm over channels (f32).
        mean = jnp.mean(acc, axis=-1, keepdims=True)
        var = jnp.mean((acc - mean) ** 2, axis=-1, keepdims=True)
        normed = (acc - mean) * jax.lax.rsqrt(var + eps)
        normed = normed * lng_ref[0, :][None, None, :] + lnb_ref[0, :][None, None, :]

        # Pointwise MLP on the MXU over all RB*TILE_T rows at once.
        flat = normed.reshape(rb * TILE_T, c)
        h = (
            jnp.dot(
                flat.astype(compute_dtype),
                w1_ref[:, :],
                preferred_element_type=jnp.float32,
            )
            + b1_ref[0, :][None, :]
        )
        h = jax.nn.gelu(h)
        h = (
            jnp.dot(
                h.astype(compute_dtype),
                w2_ref[:, :],
                preferred_element_type=jnp.float32,
            )
            + b2_ref[0, :][None, :]
        )
        h = h.reshape(rb, TILE_T, c)

        out_ref[:, :, :] = center + (h * gamma_ref[0, :][None, None, :]).astype(center.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((rb, read_rows, c), x_ref.dtype),
        pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "bf16"))
def convnext_block_pallas(
    x: jnp.ndarray,  # [B, T, C]
    dw: jnp.ndarray,  # [7, C]
    dw_b: jnp.ndarray,  # [C]
    ln_g: jnp.ndarray,
    ln_b: jnp.ndarray,
    w1: jnp.ndarray,  # [C, F]
    b1: jnp.ndarray,
    w2: jnp.ndarray,  # [F, C]
    b2: jnp.ndarray,
    gamma: jnp.ndarray,
    eps: float = 1e-5,
    interpret: bool = False,
    bf16: bool = True,
) -> jnp.ndarray:
    b, t, c = x.shape
    n_t_tiles = -(-t // TILE_T)
    t_pad = n_t_tiles * TILE_T
    rb = ROWS_PER_TILE if b % ROWS_PER_TILE == 0 else 1
    n_b_tiles = b // rb
    xp = jnp.pad(x, ((0, 0), (READ_HALO, READ_HALO + (t_pad - t)), (0, 0)))

    compute_dtype = jnp.bfloat16 if bf16 else jnp.float32
    w1c = w1.astype(compute_dtype)
    w2c = w2.astype(compute_dtype)

    out = pl.pallas_call(
        functools.partial(_block_kernel, eps=eps, compute_dtype=compute_dtype),
        grid=(n_b_tiles, n_t_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM; kernel DMAs halo tiles
            pl.BlockSpec((7, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w1.shape[1]), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rb, TILE_T, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_b_tiles * rb, t_pad, c), x.dtype),
        interpret=interpret,
    )(
        xp,
        dw,
        dw_b[None],
        ln_g[None],
        ln_b[None],
        w1c,
        b1[None],
        w2c,
        b2[None],
        gamma[None],
    )
    return out[:b, :t, :]
