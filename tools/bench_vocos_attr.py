"""Vocos stack gap attribution: where do 2.0 ms go when the FLOP floor is ~0.7 ms?

Times, at the production shape (B=16, T=320, C=512, F=1536, bf16):
  1. full vocos forward (embed + 8 ConvNeXt blocks + head + iSTFT);
  2. the 16 MLP matmuls alone (same shapes, chained);
  3. one ConvNeXt block's VPU segment alone (dwconv+LN+scale, no MLP) ×8;
  4. the head + iSTFT alone.
If (2) ≈ XLA's matmul ceiling and (1) ≈ (2)+(3)+(4), the gap is serial VPU segments
(MXU idles during dw/LN) — fixable only by cross-row software pipelining.
Methodology = bench.py chained-fori_loop with overhead subtraction.
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

K = 32


def timeit(fn, *args, k=K):
    return _timeit(fn, *args, k=k, repeats=3)


def main() -> None:
    enable_cache()

    from gonova_tts_tpu.config import ModelConfig
    from gonova_tts_tpu.models import vocos

    cfg = ModelConfig()
    B, T = 16, 320
    params = jax.jit(lambda k_: vocos.init(k_, cfg))(jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.n_mels), jnp.float32)
    results = {}

    ms = timeit(lambda m: vocos.forward(params, m, cfg, dtype=jnp.bfloat16), mel)
    results["full_ms"] = round(ms, 3)
    print(json.dumps(results), flush=True)

    # 2. MLP matmuls alone (8 blocks × [B*T,512]@[512,1536] → gelu → @[1536,512]).
    ws = [
        (blk["pw1"]["w"].astype(jnp.bfloat16), blk["pw2"]["w"].astype(jnp.bfloat16))
        for blk in params["blocks"]
    ]

    def mlps(x):
        h = x.reshape(B * T, cfg.vocos_dim).astype(jnp.bfloat16)
        for w1, w2 in ws:
            h = jax.nn.gelu(h @ w1) @ w2
        return h

    x0 = jax.random.normal(jax.random.PRNGKey(2), (B, T, cfg.vocos_dim), jnp.bfloat16)
    results["mlps_only_ms"] = round(timeit(mlps, x0), 3)
    print(json.dumps(results), flush=True)

    # 3. VPU segments alone: depthwise conv + LN + gamma-scale per block, no MLP.
    from gonova_tts_tpu.models import layers as _layers
    from gonova_tts_tpu.models import vocos as _v

    def vpu_real(x):
        h = x
        for blk in params["blocks"]:
            d = _v._depthwise_conv(blk["dw"], blk["dw_b"], h, jnp.bfloat16)
            n = _layers.layernorm(blk["ln"], d)
            h = h + n.astype(jnp.bfloat16) * blk["gamma"].astype(jnp.bfloat16)
        return h

    results["vpu_only_ms"] = round(timeit(vpu_real, x0), 3)
    print(json.dumps(results), flush=True)

    # 4. head + iSTFT alone.
    def head(x):
        from gonova_tts_tpu.models import layers

        h = layers.layernorm(params["ln_out"], x.astype(jnp.float32))
        hd = layers.dense(params["head"], h, jnp.bfloat16).astype(jnp.float32)
        n_bins = cfg.n_fft // 2 + 1
        log_mag, phase = hd[..., :n_bins], hd[..., n_bins:]
        mag = jnp.exp(jnp.clip(log_mag, -14.0, 6.0))
        return _v.istft_synthesis(mag * jnp.cos(phase), mag * jnp.sin(phase), cfg.n_fft, cfg.hop_length, precision=jax.lax.Precision.HIGH)

    results["head_istft_ms"] = round(timeit(head, x0), 3)
    print(json.dumps(results), flush=True)

    # 4b. cartesian head + iSTFT: rsqrt-normalized (x, y) direction instead of
    # cos/sin(phase) — the candidate fix for the VPU-bound phase conversion.
    cfg_c = ModelConfig(vocos_head="cartesian")
    params_c = jax.jit(lambda k_: vocos.init(k_, cfg_c))(jax.random.PRNGKey(0))

    def head_cart(x):
        from gonova_tts_tpu.models import layers

        h = layers.layernorm(params_c["ln_out"], x.astype(jnp.float32))
        hd = layers.dense(params_c["head"], h, jnp.bfloat16).astype(jnp.float32)
        n_bins = cfg.n_fft // 2 + 1
        mag = jnp.exp(jnp.clip(hd[..., :n_bins], -14.0, 6.0))
        xd, yd = hd[..., n_bins : 2 * n_bins], hd[..., 2 * n_bins :]
        inv = jax.lax.rsqrt(xd * xd + yd * yd + 1e-12)
        return _v.istft_synthesis(
            mag * xd * inv, mag * yd * inv, cfg.n_fft, cfg.hop_length,
            precision=jax.lax.Precision.HIGH,
        )

    results["head_istft_cartesian_ms"] = round(timeit(head_cart, x0), 3)

    # Full forward with the cartesian head (end-to-end A/B).
    ms = timeit(lambda m: vocos.forward(params_c, m, cfg_c, dtype=jnp.bfloat16), mel)
    results["full_cartesian_ms"] = round(ms, 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
