"""Fused ConvNeXt block kernel (Pallas/TPU) — the NovaVocos hot path.

One vocos block = depthwise conv k=7 → LayerNorm → dense C→F → GELU → dense F→C →
layer-scale residual.  Unfused, that is ~7 XLA kernels with [B, T, C] and [B, T, F]
intermediates round-tripping HBM per block (8 blocks per vocoder pass).  This kernel
keeps one [TILE_T, C] tile resident in VMEM through the whole chain: the depthwise
conv is 7 shifted VPU multiplies over a halo'd tile, the two MLP matmuls run on the
MXU with f32 accumulation, and only the block output returns to HBM.

Halo handling: the host pads the time axis by 3 on both sides, so every tile can read
[t0, t0 + TILE_T + 6) without branching; tiles are disjoint on output.

allclose-tested against models/vocos._block_apply in tests/test_kernels.py (interpret
mode on CPU; compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 256  # frames per grid step
HALO = 3  # depthwise kernel 7 → ±3
READ_HALO = 4  # DMA'd halo per side — padded to keep slice length (TILE_T + 8) 8-aligned (Mosaic tiling)


def _block_kernel(
    x_ref,  # [B, T+6, C] in HBM/ANY (host-padded halo)
    dw_ref,  # [7, C] VMEM
    dwb_ref,  # [1, C] VMEM
    lng_ref,  # [1, C] VMEM
    lnb_ref,  # [1, C] VMEM
    w1_ref,  # [C, F] VMEM
    b1_ref,  # [1, F] VMEM
    w2_ref,  # [F, C] VMEM
    b2_ref,  # [1, C] VMEM
    gamma_ref,  # [1, C] VMEM
    out_ref,  # [1, TILE_T, C] VMEM block
    *,
    eps: float,
    compute_dtype,
):
    b_idx = pl.program_id(0)
    t_idx = pl.program_id(1)
    c = out_ref.shape[-1]

    def body(scratch, sem):
        dma = pltpu.make_async_copy(
            x_ref.at[b_idx, pl.ds(t_idx * TILE_T, TILE_T + 2 * READ_HALO), :],
            scratch,
            sem,
        )
        dma.start()
        dma.wait()
        xs = scratch[:]  # [TILE_T + 2*READ_HALO, C]
        off = READ_HALO - HALO  # skip the alignment padding
        center = xs[READ_HALO : READ_HALO + TILE_T, :]

        # Depthwise conv k=7: seven shifted VPU multiply-adds.
        acc = dwb_ref[0, :][None, :].astype(jnp.float32)
        acc = jnp.broadcast_to(acc, (TILE_T, c)).astype(jnp.float32)
        for j in range(7):
            acc = acc + xs[off + j : off + j + TILE_T, :].astype(jnp.float32) * dw_ref[j, :][
                None, :
            ].astype(jnp.float32)

        # LayerNorm over channels (f32).
        mean = jnp.mean(acc, axis=-1, keepdims=True)
        var = jnp.mean((acc - mean) ** 2, axis=-1, keepdims=True)
        normed = (acc - mean) * jax.lax.rsqrt(var + eps)
        normed = normed * lng_ref[0, :][None, :] + lnb_ref[0, :][None, :]

        # Pointwise MLP on the MXU.
        h = (
            jnp.dot(
                normed.astype(compute_dtype),
                w1_ref[:, :].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + b1_ref[0, :][None, :]
        )
        h = jax.nn.gelu(h)
        h = (
            jnp.dot(
                h.astype(compute_dtype),
                w2_ref[:, :].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + b2_ref[0, :][None, :]
        )

        out_ref[0, :, :] = center + (h * gamma_ref[0, :][None, :]).astype(center.dtype)

    pl.run_scoped(
        body,
        pltpu.VMEM((TILE_T + 2 * READ_HALO, c), x_ref.dtype),
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
    n_tiles = -(-t // TILE_T)
    t_pad = n_tiles * TILE_T
    xp = jnp.pad(x, ((0, 0), (READ_HALO, READ_HALO + (t_pad - t)), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _block_kernel,
            eps=eps,
            compute_dtype=jnp.bfloat16 if bf16 else jnp.float32,
        ),
        grid=(b, n_tiles),
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
            (1, TILE_T, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, c), x.dtype),
        interpret=interpret,
    )(
        xp,
        dw,
        dw_b[None],
        ln_g[None],
        ln_b[None],
        w1,
        b1[None],
        w2,
        b2[None],
        gamma[None],
    )
    return out[:, :t, :]
