"""Data-parallel serving tests on the 8-virtual-device CPU mesh: params replicate,
batch shards, outputs match single-device synthesis."""

import numpy as np
import pytest

from gonova_tts_tpu.config import Config, EngineConfig, ModelConfig
from gonova_tts_tpu.engine import TTSEngine
from gonova_tts_tpu.engine.multi import DataParallel


def dp_config(n: int) -> Config:
    cfg = Config()
    cfg.model = ModelConfig(
        d_model=64, n_heads=2, d_ff=128, encoder_layers=1, decoder_layers=1,
        speaker_dim=32, upsample_initial_channel=32, vocos_dim=128, vocos_ff=256,
        vocos_layers=2, compute_dtype="float32",
    )
    cfg.engine = EngineConfig(
        token_buckets=[32, 64, 128],
        batch_buckets=[1, 4, 8],
        warmup_shapes=[],
        data_parallel=n,
        stream_chunk_frames=24,
        stream_context_frames=12,
    )
    return cfg


def test_data_parallel_helper():
    dp = DataParallel(4)
    assert dp.n == 4
    assert dp.round_batch(1) == 4
    assert dp.round_batch(4) == 4
    assert dp.round_batch(5) == 8
    with pytest.raises(ValueError):
        DataParallel(99)


def test_dp_engine_matches_single_device():
    texts = [f"Parallel request number {i}." for i in range(8)]

    single = TTSEngine(dp_config(1), seed=0)
    single.load(warmup=False)
    ref = single.synthesize_batch(texts)

    multi = TTSEngine(dp_config(8), seed=0)
    multi.load(warmup=False)
    out = multi.synthesize_batch(texts)

    assert len(out) == len(ref) == 8
    for a, b in zip(out, ref):
        assert len(a) == len(b)
        np.testing.assert_allclose(a, b, atol=3e-3)


def test_dp_engine_rounds_small_batches():
    multi = TTSEngine(dp_config(4), seed=0)
    multi.load(warmup=False)
    out = multi.synthesize_batch(["One lonely request."])  # padded to 4 internally
    assert len(out) == 1
    assert np.isfinite(out[0]).all()


def test_dp_streaming_still_works():
    multi = TTSEngine(dp_config(4), seed=0)
    multi.load(warmup=False)
    chunks = list(multi.synthesize_stream("Streaming on a mesh. Second sentence."))
    assert len(chunks) >= 2
    assert all(np.isfinite(c).all() for c in chunks)
