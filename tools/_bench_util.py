"""Shared on-chip measurement harness for the tools/bench_* scripts.

One canonical copy of the methodology PERF.md documents: K passes chained on-device
inside one jitted fori_loop with a data-dependent carry (nothing folds away), one
scalar readback, dispatch+readback overhead measured separately and subtracted —
required because this environment's axon `block_until_ready` does not synchronize
and host readbacks carry ~30 ms tunnel latency.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def enable_cache() -> None:
    """Persistent compilation cache (first tunnel compiles cost minutes)."""
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def timeit(fn, *args, k: int = 64, repeats: int = 3) -> float:
    """ms per pass of fn(*args); the first arg carries the loop data-dependence."""

    @jax.jit
    def step(*a):
        def body(_, carry):
            out = fn(a[0] + carry * 1e-12, *a[1:])
            return jnp.mean(jnp.abs(out.astype(jnp.float32)))

        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    @jax.jit
    def noop(x):
        return jnp.sum(x) * 0.0

    float(step(*args))
    float(noop(args[0]))
    overhead = min(
        (lambda t0=time.perf_counter(): (float(noop(args[0])), time.perf_counter() - t0)[1])()
        for _ in range(repeats)
    )
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(step(*args))
        times.append(time.perf_counter() - t0)
    return (float(np.median(times)) - overhead) / k * 1e3
