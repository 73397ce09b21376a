"""MFU for the headline bench workload (PERF.md headline-table row).

Computes whole-pipeline FLOPs/pass with XLA's own cost analysis on the EXACT
graphs bench.py times (same model init, same shapes, same dispatch split), then

    MFU = FLOPs_per_pass / wall_per_pass / peak_flops

where wall_per_pass is derived from a measured audio-s/s throughput
(audio_s_per_pass / throughput) and peak is the chip's bf16 peak.

Runs on ANY backend (FLOP counts are shape math, not measurements) — pass the
on-chip throughputs from bench.py's detail line:

  python tools/mfu.py --one-graph 14300 --two-stage 19750

Peak default: TPU v5e = 197 TFLOP/s bf16 (public spec). The result states the
perf claim in the standard unit alongside audio-s/s; low absolute MFU is
expected for this workload — the pipeline is latency-shaped (small batch,
short sequences, VPU-heavy iSTFT/overlap-add), not a GEMM farm.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one-graph", type=float, required=True,
                    help="measured one-graph audio-s/s (bench.py detail line)")
    ap.add_argument("--two-stage", type=float, default=0.0,
                    help="measured two-stage audio-s/s (0 = skip)")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip bf16 peak, TFLOP/s (v5e = 197)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend for the FLOP count (default: ambient)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gonova_tts_tpu.config import EngineConfig, ModelConfig
    from gonova_tts_tpu.models import acoustic, tts

    # EXACTLY the bench.py workload (batch 16, 64-token bucket, 5 frames/token).
    cfg = ModelConfig()
    ecfg = EngineConfig()
    dtype = jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16
    batch, bucket, frames_per_token = 16, 64, 5
    t_full = bucket * cfg.max_frames_per_token
    need = bucket * frames_per_token + ecfg.stream_context_frames
    fb = min((x for x in ecfg.vocode_frame_buckets if x >= need), default=t_full)
    fb = min(fb, t_full)

    params = jax.jit(lambda k: tts.init(k, cfg))(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(4, 48, (batch, bucket)), jnp.int32)
    mask = jnp.ones((batch, bucket), jnp.float32)
    speaker = jnp.asarray(rng.standard_normal((batch, cfg.speaker_dim)), jnp.float32)
    exagg = jnp.full((batch,), 0.5, jnp.float32)
    durations = jnp.full((batch, bucket), frames_per_token, jnp.int32)

    def one_pass(params, speaker):
        ac = acoustic.forward(params["acoustic"], tokens, mask, speaker, exagg,
                              cfg, durations=durations, dtype=dtype)
        return tts.vocode(params, ac["mel"], cfg, dtype=dtype)

    def encode_pass(params, speaker):
        e = acoustic.encode(params["acoustic"], tokens, mask, speaker, exagg,
                            cfg, durations=durations, dtype=dtype)
        return e["enc"], e["spk"]

    enc0, spk0 = jax.jit(encode_pass)(params, speaker)

    def decode_pass(params, enc, spkp):
        d = acoustic.decode(params["acoustic"], enc, spkp, durations, mask, fb,
                            cfg, dtype=dtype, local_attention_from=t_full)
        return tts.vocode(params, d["mel"], cfg, dtype=dtype)

    f_one = _flops(jax.jit(one_pass).lower(params, speaker).compile())
    f_enc = _flops(jax.jit(encode_pass).lower(params, speaker).compile())
    f_dec = _flops(jax.jit(decode_pass).lower(params, enc0, spk0).compile())

    audio_s = batch * bucket * frames_per_token * cfg.hop_length / cfg.sample_rate
    peak = args.peak_tflops * 1e12

    def row(name, flops, throughput):
        wall = audio_s / throughput
        return {
            "mode": name,
            "gflops_per_pass": round(flops / 1e9, 1),
            "wall_ms_per_pass": round(wall * 1e3, 3),
            "audio_s_per_s": throughput,
            "mfu_pct": round(100.0 * flops / wall / peak, 2),
        }

    out = {
        "workload": f"B={batch} L={bucket} fpt={frames_per_token} "
                    f"(T_one={t_full}, T_two={fb})",
        "peak_tflops_bf16": args.peak_tflops,
        "rows": [row("one_graph", f_one, args.one_graph)],
    }
    if args.two_stage > 0:
        out["rows"].append(row("two_stage", f_enc + f_dec, args.two_stage))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
