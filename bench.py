"""Benchmark: audio-sec/sec/chip for the flagship pipeline at batch 16.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline comparator: the reference's aggregate throughput on its headline hardware —
~60 audio-sec/sec on an RTX 4090 at 30 connections (BASELINE.md; reference
services/tts/README.md:891-894).  vs_baseline = value / 60.

Workload: 16 concurrent ~10-word utterances (BASELINE.json configs #1/#2), 64-token
bucket, fixed realistic durations (5 mel frames/token ≈ 53 ms/phoneme) so measured
compute matches a trained model's workload independent of this checkpoint's duration
predictor.  Full pipeline per pass: encoder → length regulate → decoder → mel →
NovaVocos vocoder (iSTFT head; the flagship/config-default family) → 24 kHz waveform,
bf16 on TPU.

Two dispatch modes are measured and the better one is reported (both are the real
production path — engine/engine.py):
  * one-graph: the whole pipeline in one XLA graph at the static worst case
    T = L*max_frames_per_token (512 frames for this workload's 320 real ones);
  * two-stage: token-domain half, then length-regulate+decoder+vocoder at the
    engine's frame bucket covering the workload (384 here) — the padding reclaim
    promoted in round 3.  Timed as two chained device loops; the one [B]-int32
    readback between the stages in live serving (~50 µs on production hosts, ~30 ms
    through this environment's tunnel — an environment artifact, see PERF.md) is
    excluded from the compute measurement and called out in PERF.md.

Measurement notes for this environment: the axon TPU backend's `block_until_ready`
does not synchronize and host readbacks carry ~30 ms of tunnel latency, so each
pipeline is iterated K times *inside* one jitted fori_loop (iterations
data-dependent via the carry, so nothing folds away) and a single scalar is read
back; the per-call dispatch+readback overhead is measured separately and subtracted.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_AUDIO_SEC_PER_SEC = 60.0  # reference RTX 4090 aggregate (README.md:891-894)
K_INNER = 32  # pipeline passes per timed device call


def _probe_backend(budget_s: float) -> str | None:
    """Initialize the ambient jax backend in a SUBPROCESS with bounded
    retry-with-backoff; return the platform name, or None if it never comes up.

    A dead TPU tunnel makes in-process backend init hang or raise UNAVAILABLE
    (round-3 driver artifact BENCH_r03.json was rc=1 with a 40-line traceback
    for exactly this). Probing in a subprocess bounds both failure modes so the
    caller can emit a parseable one-line diagnostic instead."""
    import subprocess

    deadline = time.monotonic() + budget_s
    delay = 5.0
    attempts = 0
    while attempts < 5:
        attempts += 1
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return None
        # The env var alone is NOT honored when a platform plugin pre-registers
        # itself (this environment's axon hook): replay it via jax.config so
        # JAX_PLATFORMS=cpu really probes the CPU backend.
        code = (
            "import os, jax; p = os.environ.get('JAX_PLATFORMS'); "
            "p and jax.config.update('jax_platforms', p); "
            "print(jax.default_backend())"
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=min(120.0, max(5.0, remaining)),
            )
            if proc.returncode == 0:
                return proc.stdout.strip().splitlines()[-1]
        except Exception:
            pass
        if time.monotonic() + delay >= deadline:
            return None
        time.sleep(delay)
        delay = min(delay * 2.0, 60.0)
    return None


def _fail_unavailable(detail: str) -> None:
    """Emit the parseable diagnostic the driver contract expects and exit fast."""
    print(
        json.dumps(
            {
                "error": "tpu_backend_unavailable",
                "metric": "audio_sec_per_sec_per_chip",
                "detail": detail,
            }
        )
    )
    sys.exit(1)


def main() -> None:
    budget = float(os.environ.get("BENCH_PROBE_BUDGET_S", "480"))
    platform = _probe_backend(budget)
    if platform is None:
        _fail_unavailable(
            f"jax backend failed to initialize within {budget:.0f}s probe budget "
            f"(JAX_PLATFORMS={os.environ.get('JAX_PLATFORMS', '')!r})"
        )

    import jax

    # Same env replay as the probe (see _probe_backend): without it the in-process
    # backend would ignore JAX_PLATFORMS and re-attempt the plugin the probe
    # deliberately bypassed.
    if os.environ.get("JAX_PLATFORMS"):
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    import jax.numpy as jnp
    import numpy as np
    # Persistent compilation cache: first-ever compile through the tunnel costs
    # minutes; subsequent bench runs reuse the binary.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from gonova_tts_tpu.config import EngineConfig, ModelConfig
    from gonova_tts_tpu.models import acoustic, tts

    cfg = ModelConfig()
    ecfg = EngineConfig()
    on_tpu = jax.default_backend() != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    batch, bucket = 16, 64
    frames_per_token = 5  # realistic speech pacing at hop 256 / 24 kHz
    sr = cfg.sample_rate
    hop = cfg.hop_length
    t_full = bucket * cfg.max_frames_per_token  # 512: one-graph static worst case
    # The engine's two-stage dispatch picks the smallest configured frame bucket
    # covering total_frames + stream context (engine/engine.py synthesize_batch).
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
        ac = acoustic.forward(
            params["acoustic"], tokens, mask, speaker, exagg, cfg,
            durations=durations, dtype=dtype,
        )
        wav = tts.vocode(params, ac["mel"], cfg, dtype=dtype)
        return wav

    def encode_pass(params, speaker):
        e = acoustic.encode(
            params["acoustic"], tokens, mask, speaker, exagg, cfg,
            durations=durations, dtype=dtype,
        )
        return e["enc"], e["spk"]

    enc0, spk0 = jax.jit(encode_pass)(params, speaker)

    def decode_pass(params, enc, spkp):
        d = acoustic.decode(
            params["acoustic"], enc, spkp, durations, mask, fb, cfg,
            dtype=dtype, local_attention_from=t_full,
        )
        return tts.vocode(params, d["mel"], cfg, dtype=dtype)

    k = K_INNER if on_tpu else 2

    def chained(fn, *args):
        """Median wall time of one fori_loop(k) device call running fn(*args),
        with the carry keeping every pass live; returns seconds per call."""

        @jax.jit
        def step(params, args):
            def body(_, carry):
                # carry cast to each arg's dtype: an f32 carry would promote bf16
                # args to f32 and time a heavier graph than production runs.
                out = fn(params, *jax.tree_util.tree_map(
                    lambda a: a + (carry * 1e-12).astype(a.dtype), args))
                leaf = out[0] if isinstance(out, tuple) else out
                return jnp.mean(jnp.abs(leaf.astype(jnp.float32)))

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        float(step(params, args))  # compile
        times = []
        for _ in range(5 if on_tpu else 2):
            t0 = time.perf_counter()
            float(step(params, args))
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    @jax.jit
    def noop(speaker):
        return jnp.sum(speaker) * 0.0 + 1.0

    float(noop(speaker))
    overhead = min(
        (lambda t0=time.perf_counter(): (float(noop(speaker)), time.perf_counter() - t0)[1])()
        for _ in range(5)
    )

    wall_one = max(1e-9, chained(one_pass, speaker) - overhead)
    wall_two = max(
        1e-9,
        (chained(encode_pass, speaker) - overhead)
        + (chained(decode_pass, enc0, spk0) - overhead),
    )

    audio_sec = k * batch * bucket * frames_per_token * hop / sr
    v_one = audio_sec / wall_one
    v_two = audio_sec / wall_two
    value, mode = max((v_one, "one_graph"), (v_two, "two_stage"))

    # Single-stream time-to-first-audio (BASELINE.md's second target: p50 TTFA
    # < 200 ms; reference first-chunk 472 ms, README.md:872). Measured through
    # the streamed serving shape exactly as engine._stream_sentence dispatches
    # it: one batch-1 acoustic pass, then the FIRST vocoder window
    # (stride + 2*ctx frames), then the host readback of the first chunk — the
    # leg this environment's tunnel taxes (~30 ms/round trip). Wall-clock
    # includes dispatch + compute + readback; p50 over 15 reps.
    tok1, mask1 = tokens[:1], mask[:1]
    spk1, ex1, dur1 = speaker[:1], exagg[:1], durations[:1]
    stride = ecfg.stream_chunk_frames
    ctx = min(ecfg.stream_context_frames, stride)
    w_first = stride + 2 * ctx

    @jax.jit
    def acoustic_first(params, spk1):
        ac = acoustic.forward(
            params["acoustic"], tok1, mask1, spk1, ex1, cfg,
            durations=dur1, dtype=dtype,
        )
        return jax.lax.dynamic_slice_in_dim(ac["mel"], 0, w_first, axis=1)

    @jax.jit
    def vocode_window(params, window):
        return tts.vocode(params, window, cfg, dtype=dtype)

    np.asarray(vocode_window(params, acoustic_first(params, spk1)))  # compile
    ttfas = []
    for _ in range(15 if on_tpu else 3):
        t0 = time.perf_counter()
        first_chunk = np.asarray(vocode_window(params, acoustic_first(params, spk1)))
        ttfas.append(time.perf_counter() - t0)
    del first_chunk
    ttfa_p50_ms = 1e3 * float(np.median(ttfas))
    ttfa_p90_ms = 1e3 * float(np.percentile(ttfas, 90))

    # Attribution detail on its own line; the FINAL line carries exactly the
    # driver-contract fields (pinned by tests/test_driver_contract.py).
    print(
        json.dumps(
            {"detail": {"mode": mode, "one_graph": round(v_one, 2),
                        "two_stage_compute": round(v_two, 2),
                        "ttfa_p50_ms": round(ttfa_p50_ms, 1),
                        "ttfa_p90_ms": round(ttfa_p90_ms, 1)}}
        )
    )
    print(
        json.dumps(
            {
                "metric": "audio_sec_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "audio-seconds generated per wall-second per chip (batch 16, full pipeline, bf16)",
                "vs_baseline": round(value / BASELINE_AUDIO_SEC_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
