"""Protocol integration tests: the full service driven through a real aiohttp server —
WS message types, binary float32 framing, final-marker ordering, voice registration,
REST extension, cancel, health/metrics (golden-transcript style per SURVEY.md §4)."""

import asyncio
import base64
import json

import numpy as np
import pytest
from aiohttp import WSMsgType
from aiohttp.test_utils import TestClient, TestServer

from gonova_tts_tpu.config import Config, EngineConfig, ModelConfig
from gonova_tts_tpu.utils import read_wav, write_wav


def service_config(tmp_path) -> Config:
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
        batch_buckets=[1, 4],
        max_batch=4,
        batch_window_ms=5.0,
        stream_chunk_frames=24,
        stream_context_frames=8,
        warmup_shapes=[[1, 32]],
    )
    cfg.voice_cloning.cache_dir = str(tmp_path / "voices")
    cfg.voice_cloning.default_voice_path = None
    cfg.logging.level = "WARNING"
    return cfg


def _tone_wav_b64(secs=5.0, sr=24000):
    rng = np.random.default_rng(0)
    t = np.arange(int(secs * sr)) / sr
    audio = (0.5 * np.sin(2 * np.pi * 220 * t) + 0.02 * rng.standard_normal(len(t))).astype(
        np.float32
    )
    return base64.b64encode(write_wav(None, audio, sr)).decode()


async def _collect_synthesis(ws):
    """Read frames until synthesis_complete; return (audio_chunks, final_msg)."""
    chunks = []
    while True:
        msg = await asyncio.wait_for(ws.receive(), timeout=120)
        if msg.type == WSMsgType.BINARY:
            chunks.append(np.frombuffer(msg.data, dtype=np.float32))
        elif msg.type == WSMsgType.TEXT:
            data = json.loads(msg.data)
            if data.get("type") == "synthesis_complete":
                return chunks, data
        else:
            raise AssertionError(f"unexpected WS message: {msg.type}")


@pytest.fixture(scope="module")
def client_ctx(tmp_path_factory):
    """One loaded service/app shared by every test in this module (load is the
    expensive part); each test gets a fresh TestClient."""
    from gonova_tts_tpu.service import server as srv

    tmp_path = tmp_path_factory.mktemp("svc")
    loop = asyncio.new_event_loop()
    app = srv.create_app(service_config(tmp_path))
    client = TestClient(TestServer(app), loop=loop)
    loop.run_until_complete(client.start_server())
    yield loop, client, srv
    loop.run_until_complete(client.close())
    loop.close()


def test_health_reports_loaded(client_ctx):
    loop, client, srv = client_ctx

    async def run():
        resp = await client.get("/health")
        assert resp.status == 200
        body = await resp.json()
        assert body["status"] == "healthy"
        assert "queue_metrics" in body and "synthesizer_stats" in body
        assert "voice_stats" in body and "tpu" in body
        return True

    assert loop.run_until_complete(run())


def test_metrics_endpoint(client_ctx):
    loop, client, srv = client_ctx

    async def run():
        resp = await client.get("/metrics")
        assert resp.status == 200
        body = await resp.json()
        assert "requests_received" in body and "chunks_sent" in body
        return True

    assert loop.run_until_complete(run())


def test_ws_synthesize_binary_then_complete(client_ctx):
    loop, client, srv = client_ctx

    async def run():
        ws = await client.ws_connect("/v1/stream/tts")
        await ws.send_json({"type": "synthesize", "text": "Hello world. Second sentence."})
        chunks, final = await _collect_synthesis(ws)
        await ws.close()
        assert len(chunks) == 2  # one binary frame per sentence
        assert final["chunk_id"] == 2
        for c in chunks:
            assert c.dtype == np.float32 and len(c) > 0
            assert np.isfinite(c).all()
        return True

    assert loop.run_until_complete(run())


def test_ws_synthesize_encoded_formats(client_ctx):
    """Per-request `format` (encoding: section, reference README.md:296-300):
    mp3/opus binary frames carry the encoded stream; unknown format errors at
    admission (before any synthesis)."""
    from gonova_tts_tpu.audio import encode as enc

    loop, client, srv = client_ctx

    async def collect_bytes(ws):
        blobs, final = [], None
        while final is None:
            msg = await asyncio.wait_for(ws.receive(), timeout=120)
            if msg.type == WSMsgType.BINARY:
                blobs.append(msg.data)
            elif msg.type == WSMsgType.TEXT:
                data = json.loads(msg.data)
                if data.get("type") in ("synthesis_complete", "error"):
                    final = data
        return b"".join(blobs), final

    async def run():
        ws = await client.ws_connect("/v1/stream/tts")
        if "mp3" in enc.available_formats():
            await ws.send_json(
                {"type": "synthesize", "text": "Encoded one. Encoded two.", "format": "mp3"}
            )
            blob, final = await collect_bytes(ws)
            assert final["type"] == "synthesis_complete"
            assert blob[0] == 0xFF and (blob[1] & 0xE0) == 0xE0  # MPEG sync
        if "opus" in enc.available_formats():
            await ws.send_json(
                {"type": "synthesize", "text": "Opus check.", "format": "opus"}
            )
            blob, final = await collect_bytes(ws)
            assert final["type"] == "synthesis_complete"
            assert blob[:4] == b"OggS" and b"OpusHead" in blob[:64]
        await ws.send_json({"type": "synthesize", "text": "Nope.", "format": "flac"})
        msg = json.loads((await asyncio.wait_for(ws.receive(), timeout=30)).data)
        assert msg["type"] == "error" and "Unsupported format" in msg["message"]
        # The connection remains usable with the default (pcm) after the rejection.
        await ws.send_json({"type": "synthesize", "text": "Still alive."})
        chunks, final = await _collect_synthesis(ws)
        assert len(chunks) == 1 and final["chunk_id"] == 1
        await ws.close()
        return True

    assert loop.run_until_complete(run())


def test_rest_synthesize_mp3_opus(client_ctx):
    from gonova_tts_tpu.audio import encode as enc

    loop, client, srv = client_ctx

    async def run():
        if "mp3" in enc.available_formats():
            resp = await client.post(
                "/v1/synthesize", json={"text": "Rest MP3.", "format": "mp3"}
            )
            assert resp.status == 200 and resp.content_type == "audio/mpeg"
            body = await resp.read()
            assert body[0] == 0xFF and (body[1] & 0xE0) == 0xE0
        if "opus" in enc.available_formats():
            resp = await client.post(
                "/v1/synthesize", json={"text": "Rest Opus.", "format": "opus"}
            )
            assert resp.status == 200 and resp.content_type == "audio/ogg"
            body = await resp.read()
            assert body[:4] == b"OggS"
        resp = await client.post(
            "/v1/synthesize", json={"text": "Bad.", "format": "flac"}
        )
        assert resp.status == 400
        assert "supported" in await resp.json()
        return True

    assert loop.run_until_complete(run())


def test_format_admission_is_sample_rate_aware(client_ctx):
    """ADVICE r3 (medium): with a model sample rate opus can't encode (22050 Hz),
    admission must reject BEFORE synthesizing — REST 400, WS admission error —
    instead of running the full synthesis and 500ing at encoder construction."""
    loop, client, srv = client_ctx
    svc = client.server.app["service"]
    orig_sr = svc.config.model.sample_rate

    async def run():
        svc.config.model.sample_rate = 22050
        try:
            resp = await client.post(
                "/v1/synthesize", json={"text": "Rate gated.", "format": "opus"}
            )
            assert resp.status == 400
            body = await resp.json()
            assert "opus" not in body["supported"]

            ws = await client.ws_connect("/v1/stream/tts")
            await ws.send_json(
                {"type": "synthesize", "text": "Rate gated.", "format": "opus"}
            )
            msg = json.loads((await asyncio.wait_for(ws.receive(), timeout=30)).data)
            assert msg["type"] == "error" and "Unsupported format" in msg["message"]
            await ws.close()
        finally:
            svc.config.model.sample_rate = orig_sr
        return True

    assert loop.run_until_complete(run())


def test_ws_register_then_synthesize_with_voice(client_ctx):
    loop, client, srv = client_ctx

    async def run():
        ws = await client.ws_connect("/v1/stream/tts")
        await ws.send_json(
            {
                "type": "register_voice",
                "voice_id": "tester",
                "reference_audio": _tone_wav_b64(),
                "description": "unit voice",
            }
        )
        msg = json.loads((await asyncio.wait_for(ws.receive(), 120)).data)
        assert msg == {"type": "voice_registered", "voice_id": "tester"}

        await ws.send_json({"type": "list_voices"})
        msg = json.loads((await asyncio.wait_for(ws.receive(), 30)).data)
        assert msg["type"] == "voice_list"
        assert any(v["voice_id"] == "tester" for v in msg["voices"])

        await ws.send_json({"type": "synthesize", "text": "Voice test.", "voice_id": "tester"})
        chunks, final = await _collect_synthesis(ws)
        assert len(chunks) == 1 and final["chunk_id"] == 1
        await ws.close()
        return True

    assert loop.run_until_complete(run())


def test_ws_register_invalid_voice_errors(client_ctx):
    loop, client, srv = client_ctx

    async def run():
        ws = await client.ws_connect("/v1/stream/tts")
        await ws.send_json(
            {
                "type": "register_voice",
                "voice_id": "bad",
                "reference_audio": base64.b64encode(b"not a wav").decode(),
            }
        )
        msg = json.loads((await asyncio.wait_for(ws.receive(), 30)).data)
        assert msg["type"] == "error"
        assert "failed" in msg["message"].lower()
        await ws.close()
        return True

    assert loop.run_until_complete(run())


def test_ws_unknown_voice_falls_back_to_default(client_ctx):
    loop, client, srv = client_ctx

    async def run():
        ws = await client.ws_connect("/v1/stream/tts")
        await ws.send_json(
            {"type": "synthesize", "text": "Fallback check.", "voice_id": "no-such-voice"}
        )
        chunks, final = await _collect_synthesis(ws)
        assert len(chunks) == 1  # synthesized with default voice, no error frame
        await ws.close()
        return True

    assert loop.run_until_complete(run())


def test_ws_unknown_message_type_ignored(client_ctx):
    loop, client, srv = client_ctx

    async def run():
        ws = await client.ws_connect("/v1/stream/tts")
        await ws.send_json({"type": "bogus"})
        await ws.send_json({"type": "synthesize", "text": "Still alive."})
        chunks, _ = await _collect_synthesis(ws)
        assert len(chunks) == 1
        await ws.close()
        return True

    assert loop.run_until_complete(run())


def test_ws_cancel(client_ctx):
    loop, client, srv = client_ctx

    async def run():
        ws = await client.ws_connect("/v1/stream/tts")
        await ws.send_json({"type": "cancel"})
        msg = json.loads((await asyncio.wait_for(ws.receive(), 30)).data)
        assert msg == {"type": "cancelled"}
        # Synthesis after cancel still works (new generation).
        await ws.send_json({"type": "synthesize", "text": "After cancel."})
        chunks, _ = await _collect_synthesis(ws)
        assert len(chunks) == 1
        await ws.close()
        return True

    assert loop.run_until_complete(run())


def test_rest_synthesize_returns_wav(client_ctx):
    loop, client, srv = client_ctx

    async def run():
        resp = await client.post(
            "/v1/synthesize",
            json={"text": "Rest endpoint test. Two sentences here.", "format": "wav"},
        )
        assert resp.status == 200
        assert resp.content_type == "audio/wav"
        body = await resp.read()
        audio, sr = read_wav(body)
        assert sr == 24000
        assert len(audio) > 0 and np.isfinite(audio).all()
        return True

    assert loop.run_until_complete(run())


def test_rest_default_format_honors_config(client_ctx):
    """A REST request without `format` must use encoding.default_format, the same
    knob the WS path honors (regression: REST hardcoded wav, so the two entry
    points disagreed about what an unspecified format means)."""
    loop, client, srv = client_ctx

    async def run():
        svc = client.app["service"]
        assert svc.config.encoding.default_format == "pcm"  # the shipped default
        resp = await client.post("/v1/synthesize", json={"text": "Default format."})
        assert resp.status == 200
        assert resp.content_type == "application/octet-stream"  # pcm, not wav
        audio = np.frombuffer(await resp.read(), dtype=np.float32)
        assert len(audio) > 0 and np.isfinite(audio).all()

        svc.config.encoding.default_format = "wav"
        try:
            resp = await client.post("/v1/synthesize", json={"text": "Now wav."})
            assert resp.status == 200
            assert resp.content_type == "audio/wav"
        finally:
            svc.config.encoding.default_format = "pcm"
        return True

    assert loop.run_until_complete(run())


def test_rest_synthesize_pcm_and_errors(client_ctx):
    loop, client, srv = client_ctx

    async def run():
        resp = await client.post("/v1/synthesize", json={"text": "PCM.", "format": "pcm"})
        assert resp.status == 200
        assert resp.headers["X-Sample-Rate"] == "24000"
        audio = np.frombuffer(await resp.read(), dtype=np.float32)
        assert len(audio) > 0

        resp = await client.post("/v1/synthesize", json={"text": "   "})
        assert resp.status == 400
        resp = await client.post("/v1/synthesize", data=b"not json")
        assert resp.status == 400
        return True

    assert loop.run_until_complete(run())


def test_concurrent_connections_batched(client_ctx):
    """Multiple simultaneous WS synthesize requests all complete (and the batcher
    coalesces at least some of them)."""
    loop, client, srv = client_ctx

    async def one(i):
        ws = await client.ws_connect("/v1/stream/tts")
        await ws.send_json({"type": "synthesize", "text": f"Concurrent request {i}."})
        chunks, final = await _collect_synthesis(ws)
        await ws.close()
        return len(chunks)

    async def run():
        before = srv.service.batcher.metrics["batches"]
        results = await asyncio.gather(*[one(i) for i in range(5)])
        after = srv.service.batcher.metrics["batches"]
        assert all(r == 1 for r in results)
        # 5 requests, <5 new batches → coalescing happened.
        assert after - before < 5
        return True

    assert loop.run_until_complete(run())


def test_rate_limit_rejects_with_1008(client_ctx):
    loop, client, srv = client_ctx

    async def run():
        # Exhaust the limiter for the test client's IP, then connect.
        ip_hits = srv.service.rate_limiter
        for _ in range(ip_hits.max_requests + 1):
            ip_hits.check("127.0.0.1")
        ws = await client.ws_connect("/v1/stream/tts")
        msg = await asyncio.wait_for(ws.receive(), 30)
        assert msg.type == WSMsgType.CLOSE
        assert msg.data == 1008
        await ws.close()
        srv.service.rate_limiter._requests.clear()
        return True

    assert loop.run_until_complete(run())


def test_max_connections_rejected(client_ctx):
    loop, client, srv = client_ctx

    async def run():
        srv.service.max_connections = 0
        try:
            ws = await client.ws_connect("/v1/stream/tts")
            msg = await asyncio.wait_for(ws.receive(), 30)
            assert msg.type == WSMsgType.CLOSE and msg.data == 1008
            await ws.close()
        finally:
            srv.service.max_connections = 50
        return True

    assert loop.run_until_complete(run())


def test_metrics_prometheus_format(client_ctx):
    loop, client, srv = client_ctx

    async def run():
        resp = await client.get("/metrics", params={"format": "prometheus"})
        assert resp.status == 200
        text = await resp.text()
        assert "# TYPE gonova_tts_requests_received counter" in text
        assert "gonova_tts_active_connections" in text
        return True

    assert loop.run_until_complete(run())


def test_health_includes_device_health(client_ctx):
    loop, client, srv = client_ctx

    async def run():
        resp = await client.get("/health")
        body = await resp.json()
        assert "device_health" in body
        return True

    assert loop.run_until_complete(run())


def test_metadata_optin_synthesis_started(client_ctx):
    """With "metadata": true, a synthesis_started frame precedes audio (README-promised
    extension; absent by default for byte-parity)."""
    loop, client, srv = client_ctx

    async def run():
        ws = await client.ws_connect("/v1/stream/tts")
        await ws.send_json({"type": "synthesize", "text": "Announce me.", "metadata": True})
        first = json.loads((await asyncio.wait_for(ws.receive(), 120)).data)
        assert first == {"type": "synthesis_started"}
        chunks, final = await _collect_synthesis(ws)
        assert len(chunks) == 1
        # Default: no announcement frame.
        await ws.send_json({"type": "synthesize", "text": "Silent start."})
        msg = await asyncio.wait_for(ws.receive(), 120)
        assert msg.type == WSMsgType.BINARY
        chunks2, _ = await _collect_synthesis(ws)
        await ws.close()
        return True

    assert loop.run_until_complete(run())


def test_register_voice_missing_fields_answers(client_ctx):
    """Regression: register_voice without reference_audio sent NO response,
    stranding the client awaiting voice_registered."""
    loop, client, srv = client_ctx

    async def run():
        ws = await client.ws_connect("/v1/stream/tts")
        await ws.send_json({"type": "register_voice", "voice_id": "nobody"})
        msg = json.loads((await asyncio.wait_for(ws.receive(), 30)).data)
        assert msg["type"] == "error" and "required" in msg["message"]
        await ws.close()
        return True

    assert loop.run_until_complete(run())


def test_malformed_json_gets_error_frame(client_ctx):
    """Regression: invalid JSON was swallowed with only a server log; the client
    hung awaiting a response."""
    loop, client, srv = client_ctx

    async def run():
        ws = await client.ws_connect("/v1/stream/tts")
        await ws.send_str("{not json")
        msg = json.loads((await asyncio.wait_for(ws.receive(), 30)).data)
        assert msg["type"] == "error"
        # The connection stays usable afterwards.
        await ws.send_json({"type": "list_voices"})
        msg2 = json.loads((await asyncio.wait_for(ws.receive(), 30)).data)
        assert msg2["type"] == "voice_list"
        await ws.close()
        return True

    assert loop.run_until_complete(run())


def test_rest_rejected_during_drain(client_ctx):
    """Regression: REST synthesize admitted work mid-drain that the queue
    accounting could not see and batcher.stop() then killed with a 500."""
    loop, client, srv = client_ctx

    async def run():
        svc = client.app["service"]
        svc.is_draining = True
        try:
            resp = await client.post("/v1/synthesize", json={"text": "Nope."})
            assert resp.status == 503
        finally:
            svc.is_draining = False
        return True

    assert loop.run_until_complete(run())
