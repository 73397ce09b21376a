"""Unit tests for service-layer components: rate limiter, voice validation/sanitize,
queue manager semantics (reference parity per SURVEY.md §2.3/§4)."""

import asyncio
import base64

import numpy as np
import pytest

from gonova_tts_tpu.service import (
    RateLimiter,
    TTSQueueManager,
    VoiceManager,
    sanitize_voice_id,
    validate_reference_audio,
)
from gonova_tts_tpu.utils import write_wav


# ---------------------------------------------------------------- rate limiter


def test_rate_limiter_allows_under_limit():
    rl = RateLimiter(max_requests=3, window=60)
    assert all(rl.check("a") for _ in range(3))
    assert not rl.check("a")
    assert rl.check("b")  # independent per client


def test_rate_limiter_window_expiry(monkeypatch):
    import time as _time

    rl = RateLimiter(max_requests=2, window=10)
    now = [1000.0]
    monkeypatch.setattr(_time, "time", lambda: now[0])
    assert rl.check("x") and rl.check("x") and not rl.check("x")
    now[0] += 11.0
    assert rl.check("x")  # old entries expired


def test_rate_limiter_prune():
    rl = RateLimiter(max_requests=2, window=0.0)
    rl.check("gone")
    rl.prune()
    assert "gone" not in rl._requests


# ---------------------------------------------------------------- voice id / validation


def test_sanitize_voice_id():
    assert sanitize_voice_id("../../etc/passwd") == "etcpasswd"
    assert sanitize_voice_id("my_voice-1") == "my_voice-1"
    assert len(sanitize_voice_id("a" * 200)) == 64
    with pytest.raises(ValueError):
        sanitize_voice_id("!!!")


def _tone(secs=5.0, sr=24000, amp=0.5, noise=0.02):
    rng = np.random.default_rng(0)
    t = np.arange(int(secs * sr)) / sr
    return (amp * np.sin(2 * np.pi * 220 * t) + noise * rng.standard_normal(len(t))).astype(
        np.float32
    )


def test_validate_good_audio():
    assert validate_reference_audio(_tone(), 24000)["valid"]


@pytest.mark.parametrize(
    "audio,sr,reason_part",
    [
        (_tone(secs=1.0), 24000, "Too short"),
        (_tone(secs=12.0), 24000, "Too long"),
        (_tone(amp=0.05, noise=0.001), 24000, "too quiet"),
        (np.clip(_tone(amp=3.0), -1, 1), 24000, "clipped"),
    ],
)
def test_validate_rejections(audio, sr, reason_part):
    verdict = validate_reference_audio(audio, sr)
    assert not verdict["valid"]
    assert reason_part.lower() in verdict["reason"].lower()


def test_validate_poor_snr():
    # Constant-ish amplitude noise: p90/p10 close to 1 → rejected as noisy.
    rng = np.random.default_rng(0)
    audio = (0.4 * np.sign(rng.standard_normal(24000 * 5))).astype(np.float32)
    audio += 0.01 * rng.standard_normal(len(audio)).astype(np.float32)
    verdict = validate_reference_audio(audio, 24000)
    assert not verdict["valid"]
    assert "noisy" in verdict["reason"].lower()


# ---------------------------------------------------------------- voice manager


def test_voice_manager_register_and_lookup(tmp_path):
    async def run():
        vm = VoiceManager(cache_dir=str(tmp_path / "voices"))
        wav_bytes = write_wav(None, _tone(), 24000)
        b64 = base64.b64encode(wav_bytes).decode()
        path = await vm.register_voice("alice", b64, description="test voice")
        assert path.endswith("alice.wav")
        assert await vm.get_voice("alice") == path
        voices = vm.list_voices()
        assert [v["voice_id"] for v in voices] == ["alice"]
        assert voices[0]["description"] == "test voice"
        # Disk-only lookup (fresh manager on same dir).
        vm2 = VoiceManager(cache_dir=str(tmp_path / "voices"))
        assert (await vm2.get_voice("alice")).endswith("alice.wav")
        assert await vm2.get_voice("missing") is None
        stats = vm2.get_stats()
        assert stats["total_voices"] == 1
        return True

    assert asyncio.run(run())


def test_voice_manager_cache_key_is_sanitized(tmp_path):
    """Two raw ids sanitizing to the same file must share one cache entry, and
    list_voices must report is_cached correctly after an aliased lookup."""

    async def run():
        vm = VoiceManager(cache_dir=str(tmp_path / "voices"))
        b64 = base64.b64encode(write_wav(None, _tone(), 24000)).decode()
        await vm.register_voice("alice", b64)
        vm2 = VoiceManager(cache_dir=str(tmp_path / "voices"))
        # 'al/ice' sanitizes to 'alice' → same entry, keyed by the safe id.
        p1 = await vm2.get_voice("al/ice")
        p2 = await vm2.get_voice("alice")
        assert p1 == p2
        assert list(vm2.voice_cache) == ["alice"]
        assert vm2.list_voices()[0]["is_cached"] is True
        return True

    assert asyncio.run(run())


def test_voice_manager_rejects_bad_payloads(tmp_path):
    async def run():
        vm = VoiceManager(cache_dir=str(tmp_path / "voices"))
        with pytest.raises(ValueError):
            await vm.register_voice("bob", "not-base64!!!")
        with pytest.raises(ValueError):
            await vm.register_voice("bob", base64.b64encode(b"garbage").decode())
        short = base64.b64encode(write_wav(None, _tone(secs=0.5), 24000)).decode()
        with pytest.raises(ValueError):
            await vm.register_voice("bob", short)
        with pytest.raises(ValueError):
            await vm.register_voice("###", base64.b64encode(write_wav(None, _tone(), 24000)).decode())
        assert vm.list_voices() == []
        return True

    assert asyncio.run(run())


def test_voice_manager_path_traversal_blocked(tmp_path):
    async def run():
        vm = VoiceManager(cache_dir=str(tmp_path / "voices"))
        b64 = base64.b64encode(write_wav(None, _tone(), 24000)).decode()
        path = await vm.register_voice("../../evil", b64)
        # Stored inside the voices dir, dots stripped.
        assert str(tmp_path / "voices") in path
        assert ".." not in path
        return True

    assert asyncio.run(run())


# ---------------------------------------------------------------- queue manager


def test_queue_manager_roundtrip_and_metrics():
    async def run():
        qm = TTSQueueManager(input_queue_size=2, output_queue_size=4)
        assert await qm.enqueue_request("c1", "hello")
        req = await qm.get_next_request(timeout=0.1)
        assert req.text == "hello" and req.voice_id == "default"
        assert req.chunk_size == 50 and req.exaggeration == 0.5 and req.streaming
        await qm.mark_request_done()

        out_q = qm.register_connection("c1")
        assert await qm.enqueue_audio_chunk("c1", b"xx", 0)
        assert await qm.enqueue_audio_chunk("c1", b"", 1, is_final=True)
        first = out_q.get_nowait()
        assert first.audio_data == b"xx" and not first.is_final
        final = out_q.get_nowait()
        assert final.is_final and final.chunk_id == 1 and final.sample_rate == 24000

        m = qm.get_metrics()
        for key in (
            "requests_received",
            "requests_processed",
            "requests_dropped",
            "chunks_sent",
            "active_connections",
            "input_queue_size",
            "output_queues_count",
            "total_output_queue_items",
        ):
            assert key in m
        assert m["requests_received"] == 1 and m["requests_processed"] == 1
        assert m["chunks_sent"] == 2
        return True

    assert asyncio.run(run())


def test_queue_manager_input_drop_on_full():
    async def run():
        qm = TTSQueueManager(input_queue_size=1)
        assert await qm.enqueue_request("c1", "one")
        ok = await qm.enqueue_request("c1", "two", timeout=0.05)
        assert not ok
        assert qm.metrics["requests_dropped"] == 1
        return True

    assert asyncio.run(run())


def test_queue_manager_output_drop_on_full():
    async def run():
        qm = TTSQueueManager(output_queue_size=1)
        qm.register_connection("c1")
        assert await qm.enqueue_audio_chunk("c1", b"a", 0)
        ok = await qm.enqueue_audio_chunk("c1", b"b", 1)
        assert not ok  # queue full, 0.1 s retry elapses, dropped
        # Unknown connection: dropped silently.
        assert not await qm.enqueue_audio_chunk("ghost", b"x", 0)
        return True

    assert asyncio.run(run())


def test_queue_manager_unregister_drains():
    async def run():
        qm = TTSQueueManager()
        q = qm.register_connection("c1")
        await qm.enqueue_audio_chunk("c1", b"a", 0)
        qm.unregister_connection("c1")
        assert q.empty()
        assert qm.get_metrics()["active_connections"] == 0
        qm.unregister_connection("c1")  # idempotent
        return True

    assert asyncio.run(run())


def test_queue_manager_wait_until_empty():
    async def run():
        qm = TTSQueueManager()
        assert await qm.wait_until_empty(timeout=0.6)
        await qm.enqueue_request("c1", "x")
        assert not await qm.wait_until_empty(timeout=0.6)
        return True

    assert asyncio.run(run())


def test_queue_manager_final_chunk_not_dropped_under_brief_backpressure():
    """Control frames (is_final / negative chunk ids) must survive a full output
    queue that drains within the 5 s control bound — dropping synthesis_complete
    strands the client."""

    async def run():
        qm = TTSQueueManager(output_queue_size=1)
        q = qm.register_connection("c1")
        assert await qm.enqueue_audio_chunk("c1", b"a", 0)

        async def drain_soon():
            await asyncio.sleep(0.5)  # past the 0.1 s audio-drop bound
            q.get_nowait()

        drainer = asyncio.ensure_future(drain_soon())
        ok = await qm.enqueue_audio_chunk("c1", b"", 1, is_final=True)
        await drainer
        assert ok  # the final marker waited out the backpressure instead of dropping
        return True

    assert asyncio.run(run())


def test_queue_manager_wait_until_empty_counts_in_flight():
    """A request pulled by a worker but not yet marked done is in NEITHER queue —
    the drain check must not report empty (shutdown would cancel mid-synthesis)."""

    async def run():
        qm = TTSQueueManager()
        await qm.enqueue_request("c1", "x")
        req = await qm.get_next_request()
        assert req is not None
        assert not await qm.wait_until_empty(timeout=0.6)  # in flight
        await qm.mark_request_done()
        assert await qm.wait_until_empty(timeout=0.6)
        return True

    assert asyncio.run(run())


def test_voice_manager_eviction_bounds_cache_and_metadata(tmp_path):
    """Regression: eviction ranked ALL metadata (including already-evicted ids), so
    after the first cycle it evicted nothing and metadata grew without bound."""
    vm = VoiceManager(cache_dir=str(tmp_path), max_cached=4)

    async def run():
        sr = 24000
        t = np.arange(int(4.0 * sr)) / sr
        rng = np.random.default_rng(0)
        audio = (0.4 * np.sin(2 * np.pi * 220 * t) + 0.02 * rng.standard_normal(len(t))).astype(
            np.float32
        )
        b64 = base64.b64encode(write_wav(None, audio, sr)).decode()
        for i in range(12):
            assert await vm.register_voice(f"v{i:02d}", b64)
        # Repeated eviction cycles must keep BOTH structures bounded.
        assert len(vm.voice_cache) <= vm.max_cached
        assert len(vm.voice_metadata) <= vm.max_cached
        # The newest registrations survive.
        assert "v11" in vm.voice_cache
        return True

    assert asyncio.run(run())


def test_voice_manager_generation_and_atomic_rewrite(tmp_path):
    """Re-registration bumps the generation (stale-embedding guard) and replaces
    the WAV atomically (no .tmp left behind, file always parseable)."""
    async def run():
        vm = VoiceManager(cache_dir=str(tmp_path / "voices"))
        b64 = base64.b64encode(write_wav(None, _tone(), 24000)).decode()
        assert vm.generation_of("bob") == 0
        await vm.register_voice("bob", b64)
        g1 = vm.generation_of("bob")
        await vm.register_voice("bob", b64)
        assert vm.generation_of("bob") == g1 + 1
        leftovers = list((tmp_path / "voices").glob("*.tmp"))
        assert leftovers == []
        return True

    assert asyncio.run(run())


def test_voice_manager_disk_lookups_respect_cache_bound(tmp_path):
    """Regression: disk-found voices were inserted into voice_cache without ever
    triggering cleanup (unbounded growth) and with created_at=0 (always evicted
    first regardless of recency)."""
    async def run():
        vdir = tmp_path / "voices"
        vdir.mkdir()
        wav_bytes = write_wav(None, _tone(), 24000)
        for i in range(8):
            (vdir / f"v{i}.wav").write_bytes(wav_bytes)
        vm = VoiceManager(cache_dir=str(vdir), max_cached=4)
        for i in range(8):
            assert await vm.get_voice(f"v{i}") is not None
        assert len(vm.voice_cache) <= 4
        # Evicted-but-on-disk voices still resolve (disk fallback).
        assert await vm.get_voice("v0") is not None
        # Disk-loaded entries carry a real created_at (not the always-evict 0).
        for vid in vm.voice_cache:
            assert vm.voice_metadata[vid]["created_at"] > 0
        return True

    assert asyncio.run(run())


def test_queue_requeue_full_counts_as_drop():
    """Regression: the requeue-failure path (a genuine request drop) left
    received > processed + dropped forever."""
    async def run():
        qm = TTSQueueManager(input_queue_size=1)
        qm.register_connection("c")
        assert await qm.enqueue_request(connection_id="c", text="a")
        req = await qm.get_next_request()
        # Fill the queue so the requeue must fail.
        assert await qm.enqueue_request(connection_id="c", text="b")
        assert not await qm.requeue(req)
        m = qm.metrics
        # b is still queued (received, not yet processed); a was dropped.
        assert m["requests_dropped"] == 1
        assert m["requests_received"] == m["requests_processed"] + m["requests_dropped"] + qm.input_queue.qsize()
        return True

    assert asyncio.run(run())


def test_cli_demo_corpus_conflicts_with_manifest(tmp_path, capsys):
    from gonova_tts_tpu import cli

    rc = cli.main(["train", "--manifest", "m.txt", "--demo-corpus", str(tmp_path)])
    assert rc == 1
    assert "mutually exclusive" in capsys.readouterr().err
