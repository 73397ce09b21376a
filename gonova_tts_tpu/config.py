"""Configuration system.

The reference ships a config.yaml whose schema is never actually loaded by any module
(reference: services/tts/config.yaml:1-62; startup() hardcodes everything,
services/tts/server.py:402-408).  Here the same schema IS loaded and honored, extended
with `model`/`engine` sections for the in-repo TPU model stack.

Precedence: explicit kwargs > environment (TTS_PORT, TTS_INSTANCE_ID — the only env vars
the reference honors, server.py:487-488) > config.yaml > defaults.
"""

from __future__ import annotations

import os
from typing import List, Literal, Optional, Union

import yaml
from pydantic import BaseModel, ConfigDict, Field


class _SectionModel(BaseModel):
    """Every section validates on assignment (so env/kwarg overrides are coerced
    and type-checked, not stored verbatim)."""

    model_config = ConfigDict(validate_assignment=True)


class ModelConfig(_SectionModel):
    """Reference `model:` section (config.yaml:4-10) + TPU model hyperparameters."""

    model_path: Optional[str] = None  # checkpoint dir (orbax) or None for fresh init
    device: str = "tpu"
    device_index: int = 0
    chunk_size: int = 50  # accepted-but-unused in the reference too (synthesizer.py:226)
    sample_rate: int = 24000

    # --- acoustic model (FastPitch-class) ---
    n_mels: int = 80
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    fmin: float = 0.0
    fmax: float = 12000.0
    vocab_size: int = 256  # phoneme symbol table size (padded for MXU friendliness)
    d_model: int = 256
    n_heads: int = 4
    d_ff: int = 1024
    encoder_layers: int = 4
    decoder_layers: int = 4
    conv_kernel: int = 3
    speaker_dim: int = 256
    max_frames_per_token: int = 8
    # Decoder attention over mel frames: blocked local attention with this window
    # (each block attends to itself + both neighbors; span = 3*window). Full T×T
    # attention at the largest frame bucket materializes ~600 MB of logits per layer;
    # frame dependencies after length regulation are local. None = full attention.
    decoder_attention_window: Optional[int] = 64
    # Only use local attention for frame counts >= this (measured on v5e: local wins
    # at T=1536 — 5.2 vs 7.0 ms — but loses at T=320 where the neighbor-concat
    # overhead exceeds the O(T^2) savings).
    local_attention_min_frames: int = 1024

    # --- vocoder family selection ---
    # "vocos": iSTFT-head frame-rate vocoder (TPU flagship — all matmuls >=512 wide)
    # "hifigan": transposed-conv + MRF generator (HiFi-GAN parity family)
    vocoder_family: str = "vocos"
    vocos_dim: int = 512
    vocos_ff: int = 1536
    vocos_layers: int = 8
    # STFT-head parametrization (models/vocos.py):
    #   "cartesian": head emits (log-mag, x, y); complex via mag * (x,y)/|(x,y)|.
    #   "polar":     head emits (log-mag, phase); complex via mag*cos/sin(phase).
    # cos/sin over [B, T, 513] was the serving profile's named VPU-bound segment
    # (PERF.md vocos attribution); the cartesian head replaces both
    # transcendentals with one rsqrt + multiplies (measured 1.383 -> 1.243 ms
    # full vocos pass on v5e-1, trained to identical eval grades — TRAIN_EVAL.md).
    # Must match the head a checkpoint was trained with (param shapes differ);
    # the engine infers this from the restored head width, so the setting only
    # governs fresh inits/training. "polar" remains for back-compat checkpoints.
    vocos_head: Literal["polar", "cartesian"] = "cartesian"
    # Run the vocos ConvNeXt stack through the fused whole-stack Pallas kernel
    # (ops/vocos_stack_kernel.py — the only Pallas variant that meets XLA; the
    # per-block kernel measured slower and is not wired). Off by default — enable
    # per deployment after the kernel-vs-XLA parity check on the target chip.
    # Falls back to XLA automatically above the kernel's MAX_T frame budget.
    vocos_pallas: bool = False
    # iSTFT inverse-DFT matmul precision: "auto" | "default" | "high" | "highest".
    # On TPU an f32 matmul at DEFAULT precision runs one-pass-bf16 multiplies
    # (~2e-3 mean relative error, above the PCM16 LSB). "high" (XLA 3-pass) is
    # ~f24 (1.3e-5 mean, below the LSB) at −1% two-stage / −6% one-graph
    # throughput; "highest" (6-pass) is f32-true (1.3e-7) but costs ~12%
    # (PERF.md "iDFT precision" — all measured on chip). "auto" = "high" on TPU,
    # "default" on backends whose f32 matmul is already exact. Replaces rounds-
    # 2/3's hand-rolled split-bf16, which XLA's simplifier silently defeated
    # under jit (default accuracy at 3-pass cost — the worst of both).
    istft_precision: Literal["auto", "default", "high", "highest"] = "auto"
    # Run the acoustic encoder/decoder through the fused whole-stack Pallas kernel
    # (ops/transformer_stack_kernel.py): all layers in one pallas_call, activations
    # VMEM-resident, per-layer weights double-buffered. Inference-only (no VJP) —
    # training must keep this False; the engine flips it on its own ModelConfig copy
    # when serving on the TPU backend (EngineConfig.acoustic_pallas).
    acoustic_pallas: bool = False

    # Discriminator (MPD/MSD) channel-width multiplier for adversarial training:
    # 1.0 = HiFi-GAN paper capacity. Training-only (discriminators never enter
    # serving checkpoints); tests and tiny-corpus demos use fractions.
    disc_width: float = 1.0

    # --- vocoder (HiFi-GAN generator class) ---
    upsample_rates: List[int] = Field(default_factory=lambda: [8, 8, 2, 2])
    upsample_kernels: List[int] = Field(default_factory=lambda: [16, 16, 4, 4])
    upsample_initial_channel: int = 256
    resblock_kernels: List[int] = Field(default_factory=lambda: [3, 7, 11])
    resblock_dilations: List[List[int]] = Field(
        default_factory=lambda: [[1, 3, 5], [1, 3, 5], [1, 3, 5]]
    )
    # Lane-folded HiFi-GAN execution (models/vocoder_folded.py): reformulates the
    # narrow-channel MRF/upsample convs into 128-lane folded convs (numerically
    # identical; see PERF.md "HiFi-GAN family on-chip diagnosis"). Pure XLA and
    # differentiable, so it serves and trains. Falls back to the plain layout
    # per-stage when shapes don't divide.
    hifigan_folded: bool = True

    compute_dtype: str = "bfloat16"  # engine compute dtype on TPU; f32 on CPU tests


class VoiceCloningConfig(_SectionModel):
    """Reference `voice_cloning:` section (config.yaml:13-24)."""

    enabled: bool = True
    cache_dir: str = "./voices"
    max_cached_voices: int = 100
    default_voice_path: Optional[str] = "./voices/default.wav"
    min_duration: float = 3.0
    max_duration: float = 10.0
    min_snr: float = 5.0


class SynthesisConfig(_SectionModel):
    """Reference `synthesis:` section (config.yaml:27-30)."""

    default_exaggeration: float = 0.5
    default_cfg_weight: float = 3.0
    enable_streaming: bool = True


class ServerConfig(_SectionModel):
    """Reference `server:` section (config.yaml:33-37)."""

    host: str = "0.0.0.0"
    port: int = 8002
    max_connections: int = 50
    connection_timeout: float = 300.0


class QueueConfig(_SectionModel):
    """Reference `queues:` section (config.yaml:40-42)."""

    input_queue_size: int = 500
    output_queue_size: int = 2000
    # Admission put timeout (reference: 2.0 s, core/queue_manager.py:131-171).
    # Configurable so timing-sensitive tests can widen their margins (a contended
    # single-core host racing a 2.0 s constant against real sleeps is the flake
    # source VERDICT r3 #9 names); production default unchanged.
    put_timeout_s: float = 2.0


class RateLimitConfig(_SectionModel):
    """Reference `rate_limiting:` section (config.yaml:45-48)."""

    enabled: bool = True
    max_requests_per_minute: int = 100
    window_seconds: int = 60


class LoggingConfig(_SectionModel):
    """Reference `logging:` section (config.yaml:51-57)."""

    level: str = "INFO"
    format: str = "json"
    file: Optional[str] = None
    log_syntheses: bool = True
    log_voice_registrations: bool = True


class MonitoringConfig(_SectionModel):
    """Reference `monitoring:` section (config.yaml:60-62)."""

    enable_health_endpoint: bool = True
    enable_metrics_endpoint: bool = True


class EncodingConfig(_SectionModel):
    """Reference `encoding:` section (README.md:296-300 — promised there, never
    implemented; audio/encode.py implements it here via the system codecs)."""

    default_format: Literal["pcm", "wav", "mp3", "opus"] = "pcm"
    mp3_bitrate: int = 192  # kbps
    opus_bitrate: int = 64  # kbps


class EngineConfig(_SectionModel):
    """TPU engine extension: bucketing, batching, streaming (no reference analog —
    replaces the serialized single worker, reference server.py:110-186)."""

    token_buckets: List[int] = Field(default_factory=lambda: [32, 64, 128, 192])
    batch_buckets: List[int] = Field(default_factory=lambda: [1, 4, 8, 16])
    max_batch: int = 16
    batch_window_ms: float = 10.0  # admission window for dynamic batching
    stream_chunk_frames: int = 64  # mel frames emitted per streaming vocoder pass
    # Context frames each side of a streaming window. Streamed == one-shot needs
    # ctx >= vocos RF + 2 (RF = 3*(layers+1); the iSTFT overlap-add draws on
    # frames up to 2 before / 1 after each emitted sample — measured: error hits
    # the float-noise floor only from RF+2). Default = 29 for the 8-layer flagship.
    stream_context_frames: int = 29
    warmup_shapes: List[List[int]] = Field(
        default_factory=lambda: [[1, 32], [4, 32], [1, 64], [4, 64], [8, 64], [16, 64]]
    )  # (batch, token_bucket) pairs compiled at startup — cover the hot buckets:
    # a request mix hitting an unwarmed shape pays a full XLA compile mid-request
    # Device→host audio transfer dtype. "int16" halves the transfer (and is exact
    # 16-bit PCM, inaudible vs float32); host converts back via the native runtime.
    transfer_dtype: str = "int16"
    # Fused Pallas mel-feature kernel for the voice-embedding path (TPU only;
    # measured 4.7x faster than the XLA chain on v5e — PERF.md).
    mel_pallas: bool = True
    # Fused whole-stack Pallas kernel for the acoustic encoder/decoder (TPU only,
    # serving path; see ModelConfig.acoustic_pallas). The engine enables the model
    # flag on its own config copy when this is True and the backend is not CPU.
    # Default OFF: measured on v5e-1 the kernel wins the B=1 latency path (1.33x)
    # but loses batch-16 throughput by 21% — XLA reuses weights across the whole
    # batch while the batch-tiled kernel grid re-streams 16 MB of weights per tile
    # (PERF.md "Fused acoustic transformer stack"). Enable for latency-dominated
    # single-stream deployments.
    acoustic_pallas: bool = False
    # Data-parallel serving: number of local devices to drive from this engine
    # (1 = single chip; 0 = all local devices). Params replicate, batch shards.
    data_parallel: int = 1
    # Two-stage batch dispatch: run the token-domain half (encoder + predictors —
    # acoustic.encode), read back total_frames (one [B]-int32 round trip), then run
    # length-regulate + decoder + vocoder at the smallest configured frame bucket
    # covering the batch (+ stream_context_frames for streaming-grade exactness)
    # instead of the static worst case L*max_frames_per_token. Typical speech fills
    # ~5/8 of the worst case, so this skips ~35% of decoder AND vocoder compute
    # (PERF.md "Two-stage dispatch"). Whether it wins depends on the host's device
    # round-trip latency: sub-ms (production TPU hosts, CPU) the saved compute
    # dominates; ~30 ms (this build env's tunnel) the readback costs more than it
    # saves. Default "auto": the engine measures one [B]-int32 readback at load and
    # enables two-stage iff it is under two_stage_readback_threshold_ms. Set
    # true/false to force.
    two_stage_batch: Union[bool, Literal["auto"]] = "auto"
    # "auto" enables two-stage when the measured readback is below this (ms).
    # ~1 ms ≈ the compute the reclaim saves per batch at the headline workload.
    two_stage_readback_threshold_ms: float = 1.0
    # Bounded frame-bucket set for the two-stage decode: the dispatch picks the
    # smallest entry covering the batch, falling back to the worst case when none
    # does — so compile count is capped at |buckets|+1 per batch bucket. Warmup
    # precompiles these (for warmup_shapes' batch sizes) when two_stage_batch is on.
    vocode_frame_buckets: List[int] = Field(
        default_factory=lambda: [128, 192, 256, 320, 384, 448]
    )


class Config(_SectionModel):
    model: ModelConfig = Field(default_factory=ModelConfig)
    voice_cloning: VoiceCloningConfig = Field(default_factory=VoiceCloningConfig)
    synthesis: SynthesisConfig = Field(default_factory=SynthesisConfig)
    server: ServerConfig = Field(default_factory=ServerConfig)
    queues: QueueConfig = Field(default_factory=QueueConfig)
    rate_limiting: RateLimitConfig = Field(default_factory=RateLimitConfig)
    logging: LoggingConfig = Field(default_factory=LoggingConfig)
    monitoring: MonitoringConfig = Field(default_factory=MonitoringConfig)
    encoding: EncodingConfig = Field(default_factory=EncodingConfig)
    engine: EngineConfig = Field(default_factory=EngineConfig)


def load_config(path: Optional[str] = None, **overrides) -> Config:
    """Load config.yaml (if present) and apply env + keyword overrides."""
    data: dict = {}
    if path is None:
        candidate = os.path.join(os.getcwd(), "config.yaml")
        path = candidate if os.path.exists(candidate) else None
    elif not os.path.exists(path):
        # An EXPLICIT path must exist — silently serving defaults after a typo'd
        # --config is a misconfiguration trap (auto-discovery above may miss).
        raise FileNotFoundError(f"config file not found: {path}")
    if path is not None and os.path.exists(path):
        with open(path) as f:
            loaded = yaml.safe_load(f) or {}
        if not isinstance(loaded, dict):
            raise ValueError(f"config file {path} must contain a mapping")
        data = loaded

    cfg = Config.model_validate(data)

    # Env overrides honored by the reference (server.py:487-488).
    if "TTS_PORT" in os.environ:
        cfg.server.port = int(os.environ["TTS_PORT"])

    for dotted, value in overrides.items():
        section, _, key = dotted.partition(".")
        if not key:
            raise KeyError(f"override must be 'section.key', got {dotted!r}")
        if not hasattr(cfg, section):
            raise KeyError(f"unknown config section: {section!r}")
        target = getattr(cfg, section)
        if not hasattr(target, key):
            raise KeyError(f"unknown config key: {dotted}")
        setattr(target, key, value)  # validate_assignment coerces/rejects
    return cfg
