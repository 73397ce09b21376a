"""Engine tests: bucketed batch synthesis, streaming vocoder seams, voice embedding,
dynamic batcher coalescing."""

import asyncio

import numpy as np
import pytest

from gonova_tts_tpu.config import Config, EngineConfig, ModelConfig
from gonova_tts_tpu.engine import DynamicBatcher, TTSEngine, VoiceEmbeddingCache


def tiny_config() -> Config:
    cfg = Config()
    cfg.model = ModelConfig(
        d_model=64,
        n_heads=2,
        d_ff=128,
        encoder_layers=1,
        decoder_layers=1,
        speaker_dim=32,
        upsample_initial_channel=32,
        vocos_dim=128,
        vocos_ff=256,
        vocos_layers=2,
        compute_dtype="float32",
    )
    cfg.engine = EngineConfig(
        token_buckets=[32, 64, 128, 192],
        batch_buckets=[1, 4, 8],
        max_batch=8,
        batch_window_ms=5.0,
        stream_chunk_frames=24,
        stream_context_frames=12,
        warmup_shapes=[[1, 32]],
    )
    return cfg


@pytest.fixture(scope="module")
def engine():
    eng = TTSEngine(tiny_config(), seed=0)
    eng.load(warmup=True)
    return eng


def test_load_and_warmup(engine):
    assert engine.is_loaded
    assert engine.stats["compiles"] >= 2  # warmup shape + stream window


def test_synthesize_batch_shapes(engine):
    texts = ["Hello world.", "A much longer sentence with many more words in it."]
    outs = engine.synthesize_batch(texts)
    assert len(outs) == 2
    for wav in outs:
        assert wav.dtype == np.float32
        assert wav.ndim == 1
        assert len(wav) % engine.hop == 0
        assert np.isfinite(wav).all()


def test_batch_matches_single(engine):
    """Batched synthesis must produce the same audio as single-request synthesis."""
    texts = ["Hello there.", "Testing batching now."]
    batched = engine.synthesize_batch(texts)
    singles = [engine.synthesize_batch([t])[0] for t in texts]
    for b, s in zip(batched, singles):
        assert len(b) == len(s)
        np.testing.assert_allclose(b, s, atol=2e-3)


def test_streaming_concat_length_matches_batch(engine):
    """Streamed chunks concatenated must equal the non-streamed length exactly."""
    text = "This is a moderately long sentence used to exercise the streaming vocoder path of the engine."
    chunks = list(engine.synthesize_stream(text))
    assert len(chunks) >= 1
    streamed = np.concatenate(chunks)
    whole = engine.synthesize_batch([text])[0]
    assert len(streamed) == len(whole)


def test_streaming_seams_match_whole(engine):
    """Context-padded windows: streamed audio must match the one-shot vocode closely
    everywhere, with error bounded by the context margin (receptive-field tail)."""
    text = "The quick brown fox jumps over the lazy dog near the river bank today."
    streamed = np.concatenate(list(engine.synthesize_stream(text)))
    whole = engine.synthesize_batch([text])[0]
    assert len(streamed) == len(whole)
    rel_err = np.linalg.norm(streamed - whole) / (np.linalg.norm(whole) + 1e-9)
    assert rel_err < 0.15, f"streamed/whole relative L2 error {rel_err:.3f}"


def test_streaming_exact_when_context_covers_rf(engine):
    """NovaVocos has a finite receptive field (embed k7 + L blocks × dw k7 → ±3(L+1)
    frames). With stream context ≥ RF, streamed audio must be numerically identical
    to the one-shot pass (int16-quantized transfer ⇒ within 1 LSB)."""
    text = "A sentence long enough to require several streaming vocoder windows to cover completely."
    old = engine.ecfg.stream_context_frames
    engine.ecfg.stream_context_frames = 12  # tiny model: RF = ±9
    try:
        streamed = np.concatenate(list(engine.synthesize_stream(text)))
    finally:
        engine.ecfg.stream_context_frames = old
    whole = engine.synthesize_batch([text])[0]
    np.testing.assert_allclose(streamed, whole, atol=2.5 / 32768)


def test_streaming_more_context_is_closer(engine):
    """Design sanity: doubling the context margin must reduce seam error."""
    text = "A sentence long enough to require several streaming vocoder windows to cover completely."
    whole = engine.synthesize_batch([text])[0]

    def stream_err(ctx):
        old = engine.ecfg.stream_context_frames
        engine.ecfg.stream_context_frames = ctx
        try:
            streamed = np.concatenate(list(engine.synthesize_stream(text)))
        finally:
            engine.ecfg.stream_context_frames = old
        return np.linalg.norm(streamed - whole) / (np.linalg.norm(whole) + 1e-9)

    assert stream_err(16) < stream_err(2)


def test_streaming_multi_sentence(engine):
    text = "First sentence here. Second sentence follows. Third one ends it."
    chunks = list(engine.synthesize_stream(text))
    assert len(chunks) >= 3  # at least one chunk per sentence


def test_streaming_empty(engine):
    assert list(engine.synthesize_stream("")) == []


def test_embed_voice(engine):
    rng = np.random.default_rng(0)
    audio = rng.standard_normal(48000).astype(np.float32) * 0.1
    emb = engine.embed_voice(audio, 48000)
    assert emb.shape == (engine.mcfg.speaker_dim,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-4)
    # Same audio at a different sample rate → near-identical embedding.
    audio24 = np.asarray(audio[::2])  # crude 24k version of the same signal
    emb2 = engine.embed_voice(audio24, 24000)
    assert emb2.shape == emb.shape


def test_speaker_changes_audio(engine):
    text = "Speaker conditioning check."
    spk = np.zeros((engine.mcfg.speaker_dim,), np.float32)
    spk[0] = 1.0
    a = engine.synthesize_batch([text], speakers=[None])[0]
    b = engine.synthesize_batch([text], speakers=[spk])[0]
    # Speaker conditioning may change predicted durations (length) or the waveform.
    n = min(len(a), len(b))
    assert len(a) != len(b) or not np.allclose(a[:n], b[:n], atol=1e-5)


def test_voice_cache_lru():
    cache = VoiceEmbeddingCache(max_entries=2)
    cache.put("a", np.zeros(4))
    cache.put("b", np.ones(4))
    assert cache.get("a") is not None
    cache.put("c", np.full(4, 2.0))  # evicts "b" (oldest untouched)
    assert cache.get("b") is None
    assert cache.get("a") is not None
    assert cache.stats["evictions"] == 1


def test_dynamic_batcher_coalesces(engine):
    async def run():
        batcher = DynamicBatcher(engine, max_batch=8, window_ms=50)
        await batcher.start()
        results = await asyncio.gather(
            *[batcher.submit(f"Sentence number {i}.") for i in range(6)]
        )
        await batcher.stop()
        return results, batcher.metrics

    results, metrics = asyncio.run(run())
    assert len(results) == 6
    assert all(isinstance(r, np.ndarray) and r.dtype == np.float32 for r in results)
    # 6 requests submitted together within a 50 ms window → far fewer batches than requests.
    assert metrics["batches"] < 6
    assert metrics["max_batch_seen"] >= 2


def test_dynamic_batcher_splits_far_apart_buckets(engine):
    """A 5-token and a 150-token sentence admitted in one window must NOT share one
    device pass padded to the large bucket: they dispatch as two bucket groups."""
    long_text = "many words " * 30  # > 64 tokens → 128 bucket

    async def run():
        # Wide admission window: on a loaded single-core host the long text's
        # first-call G2P can take >80 ms, landing the two submits in different
        # windows and flaking the split assertion.
        batcher = DynamicBatcher(engine, max_batch=8, window_ms=400)
        await batcher.start()
        before = dict(engine.stats)
        results = await asyncio.gather(
            batcher.submit("Hi."), batcher.submit(long_text.strip() + ".")
        )
        await batcher.stop()
        return results, batcher.metrics, before

    results, metrics, before = asyncio.run(run())
    assert all(isinstance(r, np.ndarray) for r in results)
    assert metrics["bucket_splits"] >= 1
    assert metrics["batches"] >= 2
    # Padding accounting: two separate passes at their own buckets, not 2× the big one.
    dp = engine.stats["padded_tokens"] - before["padded_tokens"]
    assert dp < 2 * 128  # one small-bucket pass + one 128-bucket pass


def test_padding_efficiency_reported(engine):
    engine.synthesize_batch(["A short one."])
    stats = engine.get_stats()
    assert 0.0 < stats["padding_efficiency"] <= 1.0


def test_dynamic_batcher_stop_flushes_pending(engine):
    """A mid-flight stop() must not strand submit() callers awaiting forever:
    admitted-but-unbatched items get their futures failed."""

    async def run():
        batcher = DynamicBatcher(engine, max_batch=4, window_ms=10_000)
        # Worker NOT started: submissions sit in the queue.
        task = asyncio.ensure_future(batcher.submit("Stranded sentence."))
        await asyncio.sleep(0.05)
        await batcher.stop()
        with pytest.raises(RuntimeError, match="batcher stopped"):
            await asyncio.wait_for(task, timeout=5.0)

    asyncio.run(run())


def test_dynamic_batcher_error_isolation(engine):
    async def run():
        batcher = DynamicBatcher(engine, max_batch=4, window_ms=10)
        await batcher.start()
        ok = await batcher.submit("A fine sentence.")
        await batcher.stop()
        return ok

    assert isinstance(asyncio.run(run()), np.ndarray)


def test_dynamic_batcher_stop_mid_device_pass(engine, monkeypatch):
    """stop() while a device pass is IN FLIGHT: the worker task is cancelled at the
    run_in_executor await (CancelledError, a BaseException, skips the per-group
    Exception handler) — the current batch's futures must still be failed, not
    stranded."""
    import time as _time

    real = engine.synthesize_batch

    def slow_batch(texts, *a, **kw):
        _time.sleep(0.6)
        return real(texts, *a, **kw)

    monkeypatch.setattr(engine, "synthesize_batch", slow_batch)

    async def run():
        batcher = DynamicBatcher(engine, max_batch=4, window_ms=5)
        await batcher.start()
        task = asyncio.ensure_future(batcher.submit("Mid flight sentence."))
        await asyncio.sleep(0.2)  # window closed, executor pass in flight
        await batcher.stop()
        with pytest.raises(RuntimeError, match="batcher stopped"):
            await asyncio.wait_for(task, timeout=5.0)

    asyncio.run(run())


def test_dynamic_batcher_stop_during_admission_window(engine):
    """stop() while the worker is filling the admission window must not dispatch a
    device pass after cancellation — admitted futures fail fast instead."""

    async def run():
        batcher = DynamicBatcher(engine, max_batch=4, window_ms=10_000)
        await batcher.start()
        task = asyncio.ensure_future(batcher.submit("Window sentence."))
        await asyncio.sleep(0.2)  # worker holds the item, waiting out the window
        before = engine.stats["batches"]
        t0 = asyncio.get_event_loop().time()
        await batcher.stop()
        assert asyncio.get_event_loop().time() - t0 < 2.0  # no device pass ran
        assert engine.stats["batches"] == before
        with pytest.raises(RuntimeError, match="batcher stopped"):
            await asyncio.wait_for(task, timeout=5.0)

    asyncio.run(run())


LSB16 = 1.0 / 32767.0  # one int16 PCM step — the engine transfer quantum


def test_two_stage_batch_matches_one_graph(engine):
    """two_stage_batch=True (token-domain encode → frame-bucketed decode+vocode)
    must reproduce the one-graph batch path to within one int16 LSB for every
    returned sample. (Not bit-equal: the two modes are different XLA programs, and
    fusion may differ in final-ULP f32 rounding; 1 LSB is the same tolerance the
    streaming-exactness invariant pins.)"""
    texts = ["Hello there world.", "A second and much longer sentence for the batch."]
    orig = engine.ecfg.two_stage_batch
    try:
        engine.ecfg.two_stage_batch = False  # pin one-graph for the reference
        ref = engine.synthesize_batch(texts)
        engine.ecfg.two_stage_batch = True
        out = engine.synthesize_batch(texts)
    finally:
        engine.ecfg.two_stage_batch = orig
    assert engine.stats["vocode_frames_executed"] > 0
    assert (
        engine.stats["vocode_frames_executed"] < engine.stats["vocode_frames_worstcase"]
    )
    for a, b in zip(ref, out):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1.01 * LSB16, rtol=0)


def test_two_stage_local_attention_parity():
    """When the one-graph shape is past the local-attention threshold but the
    frame bucket is below it, the two-stage decode must still pick LOCAL attention
    (the one-graph choice) — block-local attention is absolute-position-blocked,
    so matching the choice keeps the dispatch bit-exact (acoustic.decode
    local_attention_from)."""
    cfg = tiny_config()
    cfg.model = cfg.model.model_copy(
        update={"local_attention_min_frames": 256, "decoder_attention_window": 32}
    )
    cfg.engine = cfg.engine.model_copy(update={"warmup_shapes": [], "token_buckets": [64]})
    eng = TTSEngine(cfg, seed=0)
    eng.load(warmup=False)
    text = "The quick brown fox jumps over the lazy dog near the river bank."
    eng.ecfg.two_stage_batch = False  # pin one-graph for the reference
    ref = eng.synthesize_batch([text])  # t_full = 512 >= 256 -> local attention
    eng.ecfg.two_stage_batch = True
    out = eng.synthesize_batch([text])  # fb < 256, must still choose local
    assert eng.stats["vocode_frames_executed"] < eng.stats["vocode_frames_worstcase"]
    # Same 1-LSB tolerance as above; a WRONG attention choice (full vs local)
    # produces errors orders of magnitude larger than a PCM16 step.
    np.testing.assert_allclose(ref[0], out[0], atol=1.01 * LSB16, rtol=0)


def test_two_stage_auto_resolution(engine):
    """two_stage_batch="auto" (the default) must resolve from the measured
    readback latency at load: sub-threshold on the CPU backend → enabled; an
    explicit bool always wins over the auto resolution (VERDICT r3 #5)."""
    assert engine.ecfg.two_stage_batch == "auto"  # shipped default
    assert engine._auto_two_stage is True  # CPU readback is far under 1 ms
    assert engine.two_stage_enabled is True
    assert engine.get_stats()["two_stage_dispatch"] is True
    orig = engine.ecfg.two_stage_batch
    try:
        engine.ecfg.two_stage_batch = False
        assert engine.two_stage_enabled is False
        engine.ecfg.two_stage_batch = True
        assert engine.two_stage_enabled is True
    finally:
        engine.ecfg.two_stage_batch = orig
    # The measurement itself is sane (a real round trip, not a cached host copy).
    ms = engine._measure_readback_ms()
    assert 0.0 < ms < 1000.0


def test_two_stage_auto_threshold_disables():
    """An unreachable threshold must resolve auto → one-graph dispatch."""
    cfg = tiny_config()
    cfg.engine = cfg.engine.model_copy(
        update={"two_stage_readback_threshold_ms": 0.0, "warmup_shapes": []}
    )
    eng = TTSEngine(cfg, seed=0)
    eng.load(warmup=False)
    assert eng.two_stage_enabled is False


def test_config_two_stage_accepts_auto_and_bools():
    assert EngineConfig().two_stage_batch == "auto"
    assert EngineConfig(two_stage_batch=True).two_stage_batch is True
    assert EngineConfig(two_stage_batch=False).two_stage_batch is False
    assert EngineConfig(two_stage_batch="auto").two_stage_batch == "auto"
    with pytest.raises(Exception):
        EngineConfig(two_stage_batch="sometimes")


def test_health_check(engine):
    h = engine.health_check()
    assert h["status"] == "ok"
    assert h["probe_latency_s"] < 5.0
    # Unloaded engine reports unloaded.
    from gonova_tts_tpu.engine import TTSEngine
    import tests  # noqa: F401
    e2 = TTSEngine(engine.config)
    assert e2.health_check()["status"] == "unloaded"


def test_synthesize_batch_empty_list(engine):
    assert engine.synthesize_batch([]) == []


def test_health_check_detects_stalled_device_section(engine):
    """A device section holding the lock far beyond any legitimate pass must
    report degraded, not 'ok busy serving' forever (regression: a wedged device
    was permanently reported healthy)."""
    import time as _time

    assert engine._lock.acquire(blocking=False)
    try:
        engine._busy_since = _time.time() - 400.0
        h = engine.health_check(stall_after_s=300.0)
        assert h["status"] == "degraded"
        assert h["busy_for_s"] > 300
        # A fresh section is healthy-busy, not degraded.
        engine._busy_since = _time.time()
        assert engine.health_check(stall_after_s=300.0)["status"] == "ok"
    finally:
        engine._busy_since = 0.0
        engine._lock.release()


def test_batch_larger_than_biggest_bucket_served(engine):
    """max_batch above the largest batch bucket must serve (odd-shape compile),
    not crash with a broadcast error (regression)."""
    texts = [f"Sentence number {i}." for i in range(9)]  # buckets top out at 8
    outs = engine.synthesize_batch(texts)
    assert len(outs) == 9
    assert all(np.isfinite(w).all() and len(w) > 0 for w in outs)


def test_overlong_sentence_truncation_is_counted(engine):
    """Token sequences beyond the largest bucket are cut (backstop); the cut must
    be visible in stats instead of silently dropping audio tail."""
    before = engine.stats["truncated_sentences"]
    # One id list longer than the largest bucket (192) via the id_lists seam.
    ids = [5] * 250
    outs = engine.synthesize_batch(["x"], id_lists=[ids])
    assert len(outs) == 1
    assert engine.stats["truncated_sentences"] == before + 1


def test_batcher_worker_survives_assembly_error(engine):
    """An exception OUTSIDE the per-group dispatch guard (e.g. bucket lookup on a
    broken config) must fail the batch's futures and keep the worker alive —
    not kill the task and hang every later submit() (regression)."""

    async def run():
        b = DynamicBatcher(engine, window_ms=1.0)
        await b.start()
        good = engine.ecfg.token_buckets
        engine.ecfg.token_buckets = []  # pick_bucket -> IndexError in assembly
        try:
            with pytest.raises(Exception):
                await asyncio.wait_for(b.submit("Boom."), 10)
        finally:
            engine.ecfg.token_buckets = good
        # Worker must still be alive and serving.
        out = await asyncio.wait_for(b.submit("Still alive."), 60)
        assert np.isfinite(out).all() and len(out) > 0
        await b.stop()
        return True

    assert asyncio.new_event_loop().run_until_complete(run())
