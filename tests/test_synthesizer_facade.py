"""Direct unit tests for the StreamingSynthesizer facade (the reference class surface:
services/tts/core/synthesizer.py:102-429)."""

import asyncio

import numpy as np
import pytest

from gonova_tts_tpu.config import Config, EngineConfig, ModelConfig
from gonova_tts_tpu.service import StreamingSynthesizer
from gonova_tts_tpu.utils import write_wav


def tiny_config() -> Config:
    cfg = Config()
    cfg.model = ModelConfig(
        d_model=64, n_heads=2, d_ff=128, encoder_layers=1, decoder_layers=1,
        speaker_dim=32, vocos_dim=128, vocos_ff=256, vocos_layers=2,
        compute_dtype="float32",
    )
    cfg.engine = EngineConfig(warmup_shapes=[[1, 32]], stream_chunk_frames=24,
                              stream_context_frames=12)
    return cfg


@pytest.fixture(scope="module")
def synth():
    s = StreamingSynthesizer(tiny_config())
    asyncio.run(s.load())
    return s


def test_surface_matches_reference(synth):
    # The attribute/method surface callers of the reference class rely on.
    assert synth.is_loaded
    assert synth.sample_rate == 24000
    assert hasattr(synth, "chunk_size")  # accepted-but-unused, like the reference
    stats = synth.get_stats()
    for key in ("syntheses", "total_latency", "first_chunk_latency", "errors",
                "avg_latency", "avg_first_chunk"):
        assert key in stats


def test_not_loaded_raises():
    s = StreamingSynthesizer(tiny_config())

    async def run():
        async for _ in s.synthesize_streaming("hi"):
            pass

    with pytest.raises(RuntimeError, match="not loaded"):
        asyncio.run(run())


def test_streaming_yields_chunks(synth):
    async def run():
        chunks = []
        async for c in synth.synthesize_streaming("Hello facade. Another sentence."):
            chunks.append(c)
        return chunks

    chunks = asyncio.run(run())
    assert len(chunks) >= 2
    for c in chunks:
        assert isinstance(c, np.ndarray) and c.dtype == np.float32


def test_empty_text_yields_nothing(synth):
    async def run():
        return [c async for c in synth.synthesize_streaming("   ")]

    assert asyncio.run(run()) == []


def test_voice_embedding_accepts_path_and_array(synth, tmp_path):
    rng = np.random.default_rng(0)
    tone = (0.4 * np.sin(2 * np.pi * 220 * np.arange(24000 * 4) / 24000)).astype(np.float32)
    path = str(tmp_path / "v.wav")
    write_wav(path, tone, 24000)

    async def run():
        by_path = [c async for c in synth.synthesize_streaming("Path voice.", voice_embedding=path)]
        emb = await synth.extract_voice_embedding(tone, 24000)
        by_emb = [c async for c in synth.synthesize_streaming("Array voice.", voice_embedding=emb)]
        return by_path, by_emb, emb

    by_path, by_emb, emb = asyncio.run(run())
    assert len(by_path) >= 1 and len(by_emb) >= 1
    assert emb.shape == (32,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-4)


def test_cleanup_unloads(synth):
    s = StreamingSynthesizer(tiny_config())
    asyncio.run(s.load())
    asyncio.run(s.cleanup())
    assert not s.is_loaded


def test_streaming_early_close_does_not_hang(synth):
    """Regression: aborting the async generator mid-stream used to deadlock — the
    producer thread blocked forever in a cross-thread put on a full queue while
    the generator's finally awaited it."""

    async def run():
        text = " ".join(f"Sentence number {i} here." for i in range(12))
        gen = synth.synthesize_streaming(text)
        first = None
        async for chunk in gen:
            first = chunk
            break  # abandon the stream immediately
        await asyncio.wait_for(gen.aclose(), timeout=10.0)
        return first

    first = asyncio.run(asyncio.wait_for(run(), timeout=30.0))
    assert first is not None and first.dtype == np.float32
