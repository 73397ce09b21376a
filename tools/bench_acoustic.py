"""On-chip A/B: full acoustic pass (and full pipeline) with acoustic_pallas on/off.

The stack-level microbench (tools/bench_tstack.py) measures the transformer stacks in
isolation; this measures what serving actually pays — acoustic.forward includes the
predictors, length regulator, pitch conditioning and masking glue, and the fused
kernel's value proposition is removing inter-stage fusion-region boundaries.

Methodology = bench.py's (K chained passes in one fori_loop, data-dependent carry,
dispatch overhead subtracted).
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

K = 64


def timeit(fn, *args):
    @jax.jit
    def step(*a):
        def body(_, carry):
            out = fn(a[0] + carry * 1e-12, *a[1:])
            return jnp.mean(jnp.abs(out.astype(jnp.float32)))

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    @jax.jit
    def noop(x):
        return jnp.sum(x) * 0.0

    float(step(*args))
    float(noop(args[0]))
    overhead = min(
        (lambda t0=time.perf_counter(): (float(noop(args[0])), time.perf_counter() - t0)[1])()
        for _ in range(5)
    )
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(step(*args))
        times.append(time.perf_counter() - t0)
    return (float(np.median(times)) - overhead) / K * 1e3  # ms per pass


def main() -> None:
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from gonova_tts_tpu.config import ModelConfig
    from gonova_tts_tpu.models import acoustic, tts

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--bucket", type=int, default=64)
    a = ap.parse_args()
    batch, bucket = a.batch, a.bucket
    cfg_off = ModelConfig(acoustic_pallas=False)
    cfg_on = ModelConfig(acoustic_pallas=True)
    params = jax.jit(lambda k: tts.init(k, cfg_off))(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(4, 48, (batch, bucket)), jnp.int32)
    mask = jnp.ones((batch, bucket), jnp.float32)
    spk = jnp.asarray(rng.standard_normal((batch, cfg_off.speaker_dim)), jnp.float32)
    exagg = jnp.full((batch,), 0.5, jnp.float32)
    durations = jnp.full((batch, bucket), 5, jnp.int32)

    results = {"batch": batch, "bucket": bucket}
    for name, cfg in (("xla", cfg_off), ("fused", cfg_on)):
        def ac_fn(spk, cfg=cfg):
            return acoustic.forward(
                params["acoustic"], tokens, mask, spk, exagg, cfg,
                durations=durations, dtype=jnp.bfloat16,
            )["mel"]

        def pipe_fn(spk, cfg=cfg):
            ac = acoustic.forward(
                params["acoustic"], tokens, mask, spk, exagg, cfg,
                durations=durations, dtype=jnp.bfloat16,
            )
            return tts.vocode(params, ac["mel"], cfg, dtype=jnp.bfloat16)

        results[f"acoustic_{name}_ms"] = round(timeit(ac_fn, spk), 3)
        results[f"pipeline_{name}_ms"] = round(timeit(pipe_fn, spk), 3)
        print(json.dumps({k: v for k, v in results.items()}), flush=True)

    results["acoustic_speedup"] = round(
        results["acoustic_xla_ms"] / results["acoustic_fused_ms"], 3
    )
    results["pipeline_speedup"] = round(
        results["pipeline_xla_ms"] / results["pipeline_fused_ms"], 3
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
