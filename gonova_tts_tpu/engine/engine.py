"""TTSEngine — the TPU-idiomatic replacement for the reference's serialized worker.

Where the reference funnels every request through one blocking `model.generate` call on
one GPU (services/tts/server.py:110-186, core/synthesizer.py:296-350), this engine:

  * compiles one XLA graph per (batch-bucket, token-bucket) shape pair — bounded compile
    cache, warm-compiled at startup (the reference's warmup analog, synthesizer.py:199-207);
  * synthesizes whole batches per MXU pass (dynamic batcher feeds it, see batcher.py);
  * streams long utterances by chunked vocoding: the acoustic pass emits the full mel
    fast, then fixed-size mel windows are vocoded and crossfaded so first audio ships
    before the utterance finishes (SURVEY.md §7 hard part #2);
  * conditions on cached speaker embeddings instead of reference-audio file paths
    (synthesizer.py:344-350), keeping the WAV-in public API.

All device code is shape-static; variable length lives in masks and host-side trimming.
"""

from __future__ import annotations

import os
import threading
import time
from contextlib import contextmanager
from typing import Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import mel_spectrogram, resample
from ..config import Config
from ..utils import native
from ..models import tts
from ..text import batch_to_bucket, pick_bucket, segment_text, text_to_ids
from ..utils import get_logger, read_wav
from ..utils.prof import timers

logger = get_logger("gonova.engine")


class TTSEngine:
    def __init__(self, config: Optional[Config] = None, seed: int = 0):
        self.config = config or Config()
        self.mcfg = self.config.model
        self.ecfg = self.config.engine
        if (
            self.ecfg.acoustic_pallas
            and not self.mcfg.acoustic_pallas
            and jax.default_backend() == "tpu"
        ):
            # Serving path on a TPU: fuse the acoustic transformer stacks. The
            # kernel is Mosaic-TPU-only (a GPU backend must keep XLA) and
            # inference-only — the trainer keeps the differentiable XLA path by
            # constructing its own ModelConfig, never through an engine.
            self.mcfg = self.mcfg.model_copy(update={"acoustic_pallas": True})
        self.seed = seed
        self.params = None
        self.is_loaded = False
        self.hop = self.mcfg.hop_length
        self.sample_rate = self.mcfg.sample_rate
        self.compute_dtype = (
            jnp.bfloat16 if self.mcfg.compute_dtype == "bfloat16" else jnp.float32
        )
        self._lock = threading.Lock()  # device work is serialized per engine
        self._stats_lock = threading.Lock()  # counters are updated off-device-lock
        self._busy_since: float = 0.0  # wall time the current device section began
        self.stats = {
            "syntheses": 0,
            "total_latency": 0.0,
            "first_chunk_latency": 0.0,
            "errors": 0,
            "batches": 0,
            "batched_requests": 0,
            "compiles": 0,
            # Padding accounting: real tokens vs (batch-bucket × token-bucket) slots
            # actually paid for on device. padding_efficiency = real / padded.
            "real_tokens": 0,
            "padded_tokens": 0,
            # Two-stage dispatch accounting: vocoder frames actually executed vs the
            # static worst case (L × max_frames_per_token) the one-graph path pays.
            "vocode_frames_executed": 0,
            "vocode_frames_worstcase": 0,
            # Oversize sentences cut to the largest token bucket (backstop path).
            "truncated_sentences": 0,
        }
        self._vocode_shapes_seen: set = set()
        self._auto_two_stage = False  # resolved at load when two_stage_batch="auto"

    @contextmanager
    def _device_section(self):
        """Device-lock holder that timestamps itself so health_check can tell
        'busy serving' (ms-scale, healthy) from 'wedged on the device' (a hung
        DMA/tunnel stall that would otherwise read as healthy forever)."""
        with self._lock:
            self._busy_since = time.time()
            try:
                yield
            finally:
                self._busy_since = 0.0

    # ------------------------------------------------------------ loading

    def load(self, warmup: bool = True) -> None:
        """Init or restore params, build jitted entry points, warm-compile hot shapes."""
        t0 = time.time()
        # Persistent compile cache: service restarts (and this environment's slow
        # tunnel compiles) reuse binaries instead of recompiling every shape bucket.
        from ..utils import enable_compile_cache

        enable_compile_cache()  # TTS_JAX_CACHE_DIR > cwd/.jax_cache
        if self.mcfg.model_path:
            from ..train.checkpoint import restore_params

            self.params = restore_params(self.mcfg.model_path)
            logger.info("params_restored", path=self.mcfg.model_path)
            # Checkpoints are bare param trees; the STFT-head flavor is encoded in
            # the head width (2*bins polar, 3*bins cartesian — models/vocos.py).
            # Infer it so a checkpoint always serves with the head it was trained
            # with, regardless of what the config file says.
            try:
                head_w = int(self.params["vocoder"]["head"]["w"].shape[-1])
                n_bins = self.mcfg.n_fft // 2 + 1
                inferred = {2 * n_bins: "polar", 3 * n_bins: "cartesian"}.get(head_w)
                if inferred is not None and inferred != self.mcfg.vocos_head:
                    logger.info(
                        "vocos_head_inferred", configured=self.mcfg.vocos_head,
                        inferred=inferred, head_width=head_w,
                    )
                    self.mcfg = self.mcfg.model_copy(update={"vocos_head": inferred})
            except (KeyError, TypeError, AttributeError):
                pass  # non-vocos family or foreign tree layout — config rules
            # Frontend stress mode is likewise a property of the checkpoint (the
            # stressed ids are appended symbols only a stress-trained model has
            # embeddings for). Replay the recorded mode instead of trusting the
            # process-global TTS_STRESS toggle — serving mismatched token ids is
            # silent quality loss, not an error (ADVICE r3).
            from ..text import frontend as _frontend
            from ..train.checkpoint import load_meta

            ck_stress = load_meta(self.mcfg.model_path).get("stress")
            if ck_stress is not None and bool(ck_stress) != _frontend.stress_enabled():
                logger.warning(
                    "stress_mode_overridden_by_checkpoint",
                    configured=_frontend.stress_enabled(),
                    checkpoint=bool(ck_stress),
                )
                _frontend.set_stress(bool(ck_stress))
        else:
            # One jitted (and persistently cached) init graph: eager init would issue
            # ~100 separate random-normal dispatches, each paying a device round trip
            # (minutes through this environment's tunnel).
            self.params = jax.jit(lambda k: tts.init(k, self.mcfg))(
                jax.random.PRNGKey(self.seed)
            )
            logger.info("params_initialized", seed=self.seed)

        mcfg, dtype = self.mcfg, self.compute_dtype
        as_i16 = self.ecfg.transfer_dtype == "int16"

        def pack(wav):
            # Device-side PCM16 conversion halves the device→host transfer; the host
            # unpacks via the native runtime (utils/native.py). Exact 16-bit PCM.
            if as_i16:
                return jnp.clip(wav * 32767.0, -32767.0, 32767.0).astype(jnp.int16)
            return wav

        def synth(params, tokens, mask, spk, exagg):
            out = tts.synthesize(params, tokens, mask, spk, exagg, mcfg, dtype=dtype)
            out["audio"] = pack(out["audio"])
            return out

        def acoustic(params, tokens, mask, spk, exagg):
            return tts.acoustic_mel(params, tokens, mask, spk, exagg, mcfg, dtype=dtype)

        def encode(params, tokens, mask, spk, exagg):
            return tts.encode_acoustic(params, tokens, mask, spk, exagg, mcfg, dtype=dtype)

        def decode_vocode(params, enc, spkp, dur, mask, max_frames, t_full):
            # t_full (the one-graph frame count) drives the local-attention choice
            # so the bucketed dispatch stays bit-exact vs the one-graph path.
            out = tts.decode_vocode(
                params, enc, spkp, dur, mask, max_frames, mcfg, dtype=dtype,
                local_attention_from=t_full,
            )
            out["audio"] = pack(out["audio"])
            return out

        def vocode(params, mel):
            return pack(tts.vocode(params, mel, mcfg, dtype=dtype))

        def embed(params, mel, mask):
            return tts.embed_speaker(params, mel, mask, dtype=dtype)

        self._unpack = (
            (lambda a: native.i16_to_f32(np.asarray(a))) if as_i16 else (lambda a: np.asarray(a))
        )

        self._synth = jax.jit(synth)
        self._acoustic = jax.jit(acoustic)
        self._encode = jax.jit(encode)
        self._decode_vocode = jax.jit(decode_vocode, static_argnums=(5, 6))
        self._vocode = jax.jit(vocode)
        self._embed = jax.jit(embed)
        self._probe = jax.jit(lambda x: x * 2.0 + 1.0)  # health-check op

        # Data-parallel multi-chip serving (engine/multi.py): replicate params,
        # shard the batch axis; XLA partitions every compiled graph.
        self._dp = None
        n_dp = self.ecfg.data_parallel
        if n_dp == 0:
            n_dp = len(jax.devices())
        if n_dp > 1:
            from .multi import DataParallel

            self._dp = DataParallel(n_dp)
            self.params = self._dp.place_params(self.params)
            logger.info("data_parallel_enabled", devices=self._dp.n)

        # Resolve two_stage_batch="auto" BEFORE warmup so warmup compiles the
        # dispatch mode serving will actually use. The criterion is the real
        # device→host readback latency of the [B]-int32 frame-count round trip the
        # two-stage path pays per batch: sub-threshold (production TPU hosts, CPU
        # backend) the padding reclaim wins; above it (e.g. this build env's
        # ~30 ms tunnel) one-graph wins (VERDICT r3 #5 — the headline
        # configuration is now the shipped configuration).
        self._auto_two_stage = False
        if self.ecfg.two_stage_batch == "auto":
            ms = self._measure_readback_ms()
            self._auto_two_stage = ms < self.ecfg.two_stage_readback_threshold_ms
            logger.info(
                "two_stage_auto_resolved",
                readback_ms=round(ms, 3),
                threshold_ms=self.ecfg.two_stage_readback_threshold_ms,
                enabled=self._auto_two_stage,
            )

        self.is_loaded = True
        if warmup:
            self.warmup()
        logger.info("engine_loaded", seconds=round(time.time() - t0, 2))

    @property
    def two_stage_enabled(self) -> bool:
        """The dispatch mode serving uses: explicit config bool, or the load-time
        auto resolution from the measured readback latency."""
        mode = self.ecfg.two_stage_batch
        if mode == "auto":
            return self._auto_two_stage
        return bool(mode)

    def _measure_readback_ms(self) -> float:
        """Median wall time (ms) of one [B]-int32 dispatch + device→host round
        trip — the blocking transfer the two-stage dispatch inserts between its
        stages. A FRESH device buffer per read: jax.Array caches its host copy, so
        re-reading one buffer would measure ~0 regardless of the link."""
        b = max(self.ecfg.batch_buckets or [16])
        fn = jax.jit(lambda s: jnp.arange(b, dtype=jnp.int32) + s)
        np.asarray(fn(jnp.int32(0)))  # compile + warm the transfer path
        times = []
        for i in range(1, 6):
            t0 = time.perf_counter()
            np.asarray(fn(jnp.int32(i)))
            times.append(time.perf_counter() - t0)
        return float(np.median(times) * 1e3)

    def warmup(self) -> None:
        """Pre-compile the configured hot (batch, token-bucket) shapes.

        In two_stage_batch mode the batch path runs the split graphs instead of
        _synth, so warmup compiles encode for each (batch, bucket) plus
        decode_vocode for every configured frame bucket that shape can dispatch —
        a bounded |warmup_shapes| x (|vocode_frame_buckets|+1) set; a mid-request
        compile is exactly what warmup exists to prevent."""
        for batch, bucket in self.ecfg.warmup_shapes:
            t0 = time.time()
            if self._dp is not None:
                # Serving rounds the batch to a DP multiple and commits inputs
                # with the 'data' sharding (synthesize_batch); jit specializes on
                # (shape, sharding), so warmup must match or every first real
                # request per shape pays a mid-request compile anyway.
                batch = self._dp.round_batch(batch)  # >= batch by construction
            tokens = jnp.zeros((batch, bucket), jnp.int32)
            mask = jnp.ones((batch, bucket), jnp.float32)
            spk = jnp.zeros((batch, self.mcfg.speaker_dim), jnp.float32)
            exagg = jnp.zeros((batch,), jnp.float32)
            if self._dp is not None:
                tokens, mask, spk, exagg = (
                    self._dp.place_batch(tokens),
                    self._dp.place_batch(mask),
                    self._dp.place_batch(spk),
                    self._dp.place_batch(exagg),
                )
            if self.two_stage_enabled:
                e = self._encode(self.params, tokens, mask, spk, exagg)
                # Force a host readback: on some backends (axon tunnel)
                # compilation is lazy and block_until_ready does not synchronize —
                # a readback is the only reliable "compile finished" barrier.
                np.asarray(e["total_frames"])
                self.stats["compiles"] += 1
                t_full = bucket * self.mcfg.max_frames_per_token
                fbs = [x for x in self.ecfg.vocode_frame_buckets if x < t_full]
                for fb in fbs + [t_full]:
                    out = self._decode_vocode(
                        self.params, e["enc"], e["spk"], e["durations"], mask, fb, t_full
                    )
                    np.asarray(out["total_samples"])
                    self._vocode_shapes_seen.add((batch, bucket, fb))
                    self.stats["compiles"] += 1
            else:
                out = self._synth(self.params, tokens, mask, spk, exagg)
                np.asarray(out["total_samples"])
                self.stats["compiles"] += 1
            logger.info(
                "warmup_compiled", batch=batch, bucket=bucket, seconds=round(time.time() - t0, 2)
            )
        # Streaming vocoder window shape — EXACTLY as _stream_sentence builds it:
        # same context clamp (ctx <= stride) and the serving mel dtype (the
        # acoustic stage emits compute_dtype; warming a float32 window under a
        # bfloat16 config would leave the real shape uncompiled).
        stride = self.ecfg.stream_chunk_frames
        ctx = min(self.ecfg.stream_context_frames, stride)
        # Streamed == one-shot needs ctx >= RF + 2: the iSTFT's 1.5*hop lead trim
        # means each emitted sample draws on frames up to 2 before / 1 after its
        # own frame beyond the ConvNeXt receptive field (models/vocos.py;
        # measured float-noise-floor agreement only from RF+2).
        rf_exact = 3 * (self.mcfg.vocos_layers + 1) + 2
        if ctx < rf_exact:
            # Say so instead of quietly voiding the exactness guarantee.
            logger.warning(
                "stream_context_below_exactness_bound",
                context=ctx,
                configured=self.ecfg.stream_context_frames,
                required=rf_exact,
            )
        w = stride + 2 * ctx
        mel = jnp.zeros((1, w, self.mcfg.n_mels), self.compute_dtype)
        np.asarray(self._vocode(self.params, mel))  # readback = compile barrier
        self.stats["compiles"] += 1

    # ------------------------------------------------------------ voice embedding

    def embed_voice(self, audio: np.ndarray, sr: int) -> np.ndarray:
        """Reference audio → speaker embedding [speaker_dim]."""
        if audio.ndim > 1:
            audio = audio.mean(axis=1)
        wav = np.asarray(
            resample(jnp.asarray(audio, jnp.float32), sr, self.sample_rate)
        )
        # Bound + pad to a static analysis length (10 s max per the validation rules,
        # voice_manager.py:219-222) so the embed graph compiles once.
        max_samples = int(10.0 * self.sample_rate)
        max_samples -= max_samples % self.hop
        n = min(len(wav), max_samples)
        buf = np.zeros((max_samples,), np.float32)
        buf[:n] = wav[:n]
        use_pallas = self.ecfg.mel_pallas and jax.default_backend() != "cpu"
        if use_pallas:
            from ..ops import mel_spectrogram_pallas as _mel_fn
        else:
            _mel_fn = mel_spectrogram
        mel = _mel_fn(
            jnp.asarray(buf)[None],
            sr=self.sample_rate,
            n_fft=self.mcfg.n_fft,
            hop_length=self.hop,
            win_length=self.mcfg.win_length,
            n_mels=self.mcfg.n_mels,
            fmin=self.mcfg.fmin,
            fmax=self.mcfg.fmax,
        )
        n_frames = mel.shape[1]
        valid = n // self.hop
        mask = (jnp.arange(n_frames)[None] < valid).astype(jnp.float32)
        with self._lock:
            emb = self._embed(self.params, mel, mask)
        return np.asarray(emb[0])

    def embed_voice_file(self, path: str) -> np.ndarray:
        audio, sr = read_wav(path)
        return self.embed_voice(np.asarray(audio, np.float32), sr)

    def default_speaker(self) -> np.ndarray:
        return np.zeros((self.mcfg.speaker_dim,), np.float32)

    # ------------------------------------------------------------ batch synthesis

    def synthesize_batch(
        self,
        texts: Sequence[str],
        speakers: Optional[Sequence[np.ndarray]] = None,
        exaggerations: Optional[Sequence[float]] = None,
        id_lists: Optional[Sequence[Sequence[int]]] = None,
    ) -> List[np.ndarray]:
        """Synthesize one chunk of text per request in a single device pass.

        Each text should already be a single sentence-sized chunk (the service segments
        upstream).  `id_lists` takes precomputed token ids (one list per text) so a
        caller that already ran the frontend (the batcher does, for bucketing) doesn't
        pay normalize+G2P twice.  Returns one float32 waveform per input.
        """
        if not self.is_loaded:
            raise RuntimeError("Engine not loaded. Call load() first")
        if not texts:
            return []
        t0 = time.time()
        b = len(texts)
        if id_lists is None:
            id_lists = [text_to_ids(t) for t in texts]
        else:
            assert len(id_lists) == b
        tokens_np, lengths, bucket = batch_to_bucket(id_lists, self.ecfg.token_buckets)
        truncated = sum(len(ids) > bucket for ids in id_lists)
        if truncated:
            # pick_bucket's largest-bucket backstop cuts oversize sentences; a
            # silent cut would drop the tail of the audio with no trace.
            with self._stats_lock:
                self.stats["truncated_sentences"] += truncated
            logger.warning(
                "token_sequence_truncated",
                count=truncated,
                bucket=bucket,
                longest=max(len(ids) for ids in id_lists),
            )
        batch_bucket = pick_bucket(b, self.ecfg.batch_buckets)
        if b > batch_bucket:
            # Misconfiguration backstop (max_batch above the largest batch
            # bucket): serve the odd shape (one extra compile) instead of
            # crashing the whole group with a broadcast error.
            logger.warning(
                "batch_exceeds_largest_bucket", batch=b, largest=batch_bucket
            )
            batch_bucket = b

        if self._dp is not None:
            batch_bucket = self._dp.round_batch(batch_bucket)  # >= input by construction
        tokens = np.zeros((batch_bucket, bucket), np.int32)
        tokens[:b] = tokens_np
        mask = (np.arange(bucket)[None, :] < np.concatenate([lengths, np.zeros(batch_bucket - b, np.int32)])[:, None]).astype(np.float32)
        spk = np.zeros((batch_bucket, self.mcfg.speaker_dim), np.float32)
        if speakers is not None:
            for i, s in enumerate(speakers):
                if s is not None:
                    spk[i] = s
        # Default exaggeration matches the streaming path / reference dataclass (0.5).
        exagg = np.full((batch_bucket,), 0.5, np.float32)
        if exaggerations is not None:
            exagg[:b] = np.asarray(exaggerations, np.float32)

        if self._dp is not None:
            tokens, mask, spk, exagg = (
                self._dp.place_batch(tokens),
                self._dp.place_batch(mask),
                self._dp.place_batch(spk),
                self._dp.place_batch(exagg),
            )
        with self._device_section(), timers.track("synth_batch_device"):
            if self.two_stage_enabled:
                # Stage 1: token-domain half (encoder + predictors) — no
                # frame-domain tensor exists yet; one [B]-int32 host round trip
                # for the frame counts.
                mask_j = jnp.asarray(mask)
                e = self._encode(
                    self.params,
                    jnp.asarray(tokens),
                    mask_j,
                    jnp.asarray(spk),
                    jnp.asarray(exagg),
                )
                total_frames = np.asarray(e["total_frames"])
                t_full = int(bucket * self.mcfg.max_frames_per_token)
                # Stage 2: length-regulate + decoder + vocoder at the smallest
                # CONFIGURED frame bucket covering the batch plus the streaming
                # context margin (>= vocoder receptive field + iSTFT overlap, so
                # the audio below each sequence's total_samples is exactly the
                # one-graph result — pinned by test_engine.py). The bounded bucket
                # list caps compile churn; no cover -> the worst case (== the
                # one-graph shape).
                need = int(total_frames.max()) + self.ecfg.stream_context_frames
                fb = min(
                    (x for x in self.ecfg.vocode_frame_buckets if x >= need),
                    default=t_full,
                )
                fb = min(fb, t_full)
                if (batch_bucket, bucket, fb) not in self._vocode_shapes_seen:
                    self._vocode_shapes_seen.add((batch_bucket, bucket, fb))
                    self.stats["compiles"] += 1
                out = self._decode_vocode(
                    self.params, e["enc"], e["spk"], e["durations"], mask_j, fb, t_full
                )
                audio = self._unpack(out["audio"])
                total = total_frames * self.hop
                # Padding accounting: decoder AND vocoder now both run at fb.
                with self._stats_lock:
                    self.stats["vocode_frames_executed"] += int(fb * batch_bucket)
                    self.stats["vocode_frames_worstcase"] += int(t_full * batch_bucket)
            else:
                out = self._synth(
                    self.params,
                    jnp.asarray(tokens),
                    jnp.asarray(mask),
                    jnp.asarray(spk),
                    jnp.asarray(exagg),
                )
                audio = self._unpack(out["audio"])
                total = np.asarray(out["total_samples"])

        results = [audio[i, : int(total[i])].astype(np.float32) for i in range(b)]
        dt = time.time() - t0
        with self._stats_lock:  # executor threads race the streaming producer here
            self.stats["batches"] += 1
            self.stats["batched_requests"] += b
            self.stats["syntheses"] += b
            self.stats["total_latency"] += dt
            self.stats["real_tokens"] += int(np.sum(lengths))
            self.stats["padded_tokens"] += int(batch_bucket * bucket)
        return results

    # ------------------------------------------------------------ streaming synthesis

    def synthesize_stream(
        self,
        text: str,
        speaker: Optional[np.ndarray] = None,
        exaggeration: float = 0.5,
    ) -> Iterator[np.ndarray]:
        """Generator: sentence chunks → acoustic pass → chunked vocoding.

        Yields float32 audio arrays; sentence boundaries and intra-sentence vocoder
        windows both produce yields, so first audio arrives after one acoustic pass plus
        one vocoder window rather than after the whole utterance.
        """
        if not self.is_loaded:
            raise RuntimeError("Engine not loaded. Call load() first")
        t0 = time.time()
        first = True
        sentences = segment_text(text)
        try:
            for sentence in sentences:
                for chunk in self._stream_sentence(sentence, speaker, exaggeration):
                    if first:
                        with self._stats_lock:
                            self.stats["first_chunk_latency"] += time.time() - t0
                        first = False
                    yield chunk
            with self._stats_lock:
                self.stats["syntheses"] += 1
                self.stats["total_latency"] += time.time() - t0
        except Exception:
            with self._stats_lock:
                self.stats["errors"] += 1
            raise

    def _stream_sentence(
        self, sentence: str, speaker: Optional[np.ndarray], exaggeration: float
    ) -> Iterator[np.ndarray]:
        ids = text_to_ids(sentence)
        bucket = pick_bucket(len(ids), self.ecfg.token_buckets)
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, : len(ids)] = ids[:bucket]
        mask = (np.arange(bucket)[None, :] < min(len(ids), bucket)).astype(np.float32)
        spk = np.zeros((1, self.mcfg.speaker_dim), np.float32)
        if speaker is not None:
            spk[0] = speaker
        exagg = np.asarray([exaggeration], np.float32)

        with self._device_section(), timers.track("acoustic_device"):
            ac = self._acoustic(
                self.params, jnp.asarray(tokens), jnp.asarray(mask), jnp.asarray(spk), jnp.asarray(exagg)
            )
            mel = ac["mel"]
            total_frames = int(ac["total_frames"][0])
        if total_frames <= 0:
            return

        stride = self.ecfg.stream_chunk_frames
        # Context must not exceed the stride (window starts stay >= 0 after window 0).
        ctx = min(self.ecfg.stream_context_frames, stride)
        w = stride + 2 * ctx  # static window shape
        hop = self.hop
        total_samples = total_frames * hop

        # Context-padded windows with exact composition: window 0 starts at frame 0
        # (no synthetic left context — the one-shot pass never evaluates frames < 0,
        # and head(zero-mel) != 0, so zero-padded virtual frames would leak bias into
        # the first samples); window k >= 1 slices REAL left context from the mel.
        # Each window emits `stride` frames of samples. When ctx covers the vocoder's
        # receptive field (NovaVocos: ±3*(layers+1) frames) the streamed audio equals
        # the one-shot pass exactly.
        n_windows = -(-total_frames // stride)
        # Right pad covers the last window + context overrun (zero-mel frames there
        # are evaluated identically by the one-shot pass, which also runs on the
        # zero-padded mel buffer).
        mel = jnp.pad(mel, ((0, 0), (0, stride + 2 * ctx), (0, 0)))
        emitted = 0
        for k in range(n_windows):
            start = 0 if k == 0 else k * stride - ctx
            lead = 0 if k == 0 else ctx
            window = jax.lax.dynamic_slice_in_dim(mel, start, w, axis=1)
            with self._device_section(), timers.track("vocode_window_device"):
                wav = self._unpack(self._vocode(self.params, window))[0]  # [w*hop]
            body = wav[lead * hop : (lead + stride) * hop]
            chunk = body[: max(0, total_samples - emitted)]
            if len(chunk):
                emitted += len(chunk)
                yield chunk.astype(np.float32)
            if emitted >= total_samples:
                break

    # ------------------------------------------------------------ health

    def health_check(self, deadline_s: float = 5.0, stall_after_s: float = 300.0) -> dict:
        """Device liveness probe: run a trivial jitted op end-to-end with a deadline.

        The reference has no health-driven failure detection (SURVEY.md §5.3 — its
        recovery story is systemd restart); this gives the service a signal to report
        `degraded` before requests start timing out.
        """
        if not self.is_loaded:
            return {"status": "unloaded"}
        # Actively serving (lock held) usually means the device is alive — don't
        # queue a probe behind real work and misreport load as ill health. But a
        # device section stuck far beyond any legitimate pass (a hung DMA /
        # tunnel stall — the most likely real TPU failure) must NOT read as
        # healthy forever: bound it. The bound is generous because a cold-shape
        # compile can legitimately take minutes on slow toolchains.
        if not self._lock.acquire(blocking=False):
            since = self._busy_since
            busy_for = (time.time() - since) if since else 0.0
            if busy_for > stall_after_s:
                return {
                    "status": "degraded",
                    "reason": "device section stalled",
                    "busy_for_s": round(busy_for, 1),
                }
            return {"status": "ok", "note": "busy serving"}
        t0 = time.time()
        try:
            probe = jnp.ones((8, 128), jnp.float32)
            val = float(jnp.sum(self._probe(probe)))
            latency = time.time() - t0
            if latency > deadline_s:
                return {"status": "degraded", "probe_latency_s": round(latency, 3)}
            if not np.isfinite(val):
                return {"status": "unhealthy", "reason": "non-finite device output"}
            return {"status": "ok", "probe_latency_s": round(latency, 3)}
        except Exception as e:  # noqa: BLE001
            return {"status": "unhealthy", "reason": str(e)}
        finally:
            self._lock.release()

    # ------------------------------------------------------------ stats / misc

    def get_stats(self) -> dict:
        stats = dict(self.stats)
        if stats["syntheses"] > 0:
            stats["avg_latency"] = stats["total_latency"] / stats["syntheses"]
            stats["avg_first_chunk"] = stats["first_chunk_latency"] / max(
                1, stats["syntheses"]
            )
        else:
            stats["avg_latency"] = 0.0
            stats["avg_first_chunk"] = 0.0
        stats["compiled_shapes"] = self.stats["compiles"]
        stats["padding_efficiency"] = (
            round(self.stats["real_tokens"] / self.stats["padded_tokens"], 4)
            if self.stats["padded_tokens"]
            else 1.0
        )
        stats["timers"] = timers.summary()
        # Observable dispatch mode (esp. under two_stage_batch="auto").
        stats["two_stage_dispatch"] = self.two_stage_enabled
        # Frontend tier usage: which G2P tier resolved each word lookup
        # (lexicon/morph hits are exact; neural/lts are model/rule guesses).
        from ..text import g2p as _g2p

        stats["g2p_tiers"] = _g2p.get_tier_counts()
        return stats

    def cleanup(self) -> None:
        self.params = None
        self.is_loaded = False
