"""HiFi-GAN family on-chip diagnosis: where the 877 audio-s/s goes, and whether a
fused Pallas kernel could recover it (VERDICT.md #5: fuse or formally retire).

Three measurements (methodology = bench.py's chained-fori_loop, overhead-subtracted):
  1. full NovaGAN generator pass (the 877 baseline, re-measured);
  2. per-stage MRF cost (which upsample level dominates);
  3. the decisive microbench: conv1d at FIXED FLOPs while sweeping channel width —
     if wall time is flat in C the convs are MXU-lane-bound (C/128 utilization) and
     no fusion (which only removes HBM round trips / dispatch overhead) can fix the
     family; only an architecture at >=128 channels can. That architecture is
     NovaVocos (the flagship).
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

K = 8  # HiFi-GAN passes are ~60 ms; keep the chained call bounded


def timeit(fn, *args, k=K):
    return _timeit(fn, *args, k=k, repeats=3)


def main() -> None:
    enable_cache()

    from gonova_tts_tpu.config import ModelConfig
    from gonova_tts_tpu.models import layers, vocoder

    cfg = ModelConfig(vocoder_family="hifigan")
    B, T = 16, 320  # the bucket-64 x 5 frames/token production shape
    params = jax.jit(lambda k: vocoder.init(k, cfg))(jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.n_mels), jnp.float32)
    results = {}

    # 1. full generator
    ms = timeit(lambda m: vocoder.forward(params, m, cfg, dtype=jnp.bfloat16), mel)
    audio_sec = B * T * 256 / cfg.sample_rate
    results["full_pass_ms"] = round(ms, 2)
    results["audio_sec_per_sec"] = round(audio_sec / (ms / 1e3), 1)
    print(json.dumps(results), flush=True)

    # 1b. lane-folded generator (models/vocoder_folded.py) — same params, MXU layout
    from gonova_tts_tpu.models import vocoder_folded

    ms_f = timeit(lambda m: vocoder_folded.forward(params, m, cfg, dtype=jnp.bfloat16), mel)
    results["folded_pass_ms"] = round(ms_f, 2)
    results["folded_audio_sec_per_sec"] = round(audio_sec / (ms_f / 1e3), 1)
    results["folded_speedup"] = round(ms / ms_f, 2)
    print(json.dumps(results), flush=True)

    # 2. per-stage MRF cost (stage input shapes after each transposed conv)
    t_cur, ch = T, cfg.upsample_initial_channel
    for i, rate in enumerate(cfg.upsample_rates):
        t_cur, ch_out = t_cur * rate, ch // 2
        x = jax.random.normal(jax.random.PRNGKey(2 + i), (B, t_cur, ch_out), jnp.bfloat16)
        mrf = params["mrfs"][i]

        def mrf_fn(x, mrf=mrf):
            acc = None
            for block, (rk, rd) in zip(
                mrf, zip(cfg.resblock_kernels, cfg.resblock_dilations)
            ):
                y = vocoder._resblock_apply(block, x, rd, dtype=jnp.bfloat16)
                acc = y if acc is None else acc + y
            return acc / float(len(mrf))

        results[f"mrf_stage{i}_T{t_cur}_C{ch_out}_ms"] = round(timeit(mrf_fn, x), 2)
        ch = ch_out
        print(json.dumps(results), flush=True)

    # 3. lane-bound proof: fixed-FLOP conv sweep. Per config: conv k=7, C channels,
    # T chosen so T*C^2 is constant (FLOPs constant) — if time is flat in C, the MXU
    # is lane-bound at narrow C and fusion cannot help.
    for c, t in ((16, 65536), (32, 16384), (64, 4096), (128, 1024)):
        p = layers.conv1d_init(jax.random.PRNGKey(9), c, c, 7)
        x = jax.random.normal(jax.random.PRNGKey(10), (B, t, c), jnp.bfloat16)
        ms = timeit(lambda x, p=p: layers.conv1d(p, x, dtype=jnp.bfloat16), x, k=32)
        results[f"conv_fixedflop_C{c}_T{t}_ms"] = round(ms, 3)
        print(json.dumps(results), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
