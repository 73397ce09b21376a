"""On-chip microbench: fused transformer-stack Pallas kernel vs the XLA stack.

Shapes mirror the production acoustic stage (PERF.md breakdown): encoder
B=16 x L=64 x D=256 (full attention) and decoder B=16 x T=512 x D=256 (the 64-token
bucket; full attention — local only engages at T>=1024) plus the T=1536 long-form
bucket with blocked-local attention (window 64).

Methodology = bench.py's: K passes chained in one jitted fori_loop with a
data-dependent carry, one scalar readback, dispatch overhead subtracted.

Usage: python tools/bench_tstack.py            (TPU)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import enable_cache, timeit as _timeit

K = 64


def timeit(fn, *args, k=K):
    return _timeit(fn, *args, k=k, repeats=5)


def main() -> None:
    enable_cache()

    from gonova_tts_tpu.models import layers
    from gonova_tts_tpu.ops.transformer_stack_kernel import (
        stack_block_params,
        transformer_stack_pallas,
    )

    D, H, F, L = 256, 4, 1024, 4
    p = layers.transformer_stack_init(jax.random.PRNGKey(0), L, D, H, F, 3)
    st = stack_block_params(p["blocks"], H)
    st = jax.tree_util.tree_map(jnp.asarray, st)  # materialize once
    results = {}
    for name, b, t, window in (
        ("encoder_B16_T64", 16, 64, None),
        ("decoder_B16_T512", 16, 512, None),
        ("decoder_B8_T768_local64", 8, 768, 64),
    ):
        x = jax.random.normal(jax.random.PRNGKey(1), (b, t, D), jnp.bfloat16)
        mask = jnp.ones((b, t), jnp.float32)

        def xla_fn(x, mask=mask, window=window):
            return layers.transformer_stack(
                p, x, H, mask, jnp.bfloat16, attention_window=window
            )

        def fused_fn(x, mask=mask, window=window):
            return transformer_stack_pallas(
                x, mask, st, p["ln_out"]["g"], p["ln_out"]["b"], H,
                window=window, bf16=True,
            )

        ms_xla = timeit(xla_fn, x)
        ms_fused = timeit(fused_fn, x)
        results[name] = {"xla_ms": round(ms_xla, 3), "fused_ms": round(ms_fused, 3),
                         "speedup": round(ms_xla / ms_fused, 2)}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
