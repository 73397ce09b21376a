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

from _bench_util import enable_cache, timeit as _timeit

K = 64


def timeit(fn, *args, k=K):
    return _timeit(fn, *args, k=k, repeats=5)


def main() -> None:
    enable_cache()

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
