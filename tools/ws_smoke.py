"""On-hardware WS smoke of a trained checkpoint (TRAIN_EVAL.md §Serving evidence).

Boots the full service in-process (aiohttp TestServer — the same app object
`gonova-tts serve` binds to a port), restores the trained EMA params via
``model.model_path``, registers a corpus reference voice over the WS protocol,
synthesizes held-in sentences, and reports timing + signal sanity as one JSON
object. This is the "served audio from the checkpoint through the real WS path"
evidence VERDICT.md round-1 item #2 asked for.

Usage (on the TPU):
  python tools/ws_smoke.py --checkpoint /root/ckpts/demo2 --corpus /root/corpus \
      [--out /tmp/ws_smoke.wav]
"""

from __future__ import annotations

import argparse
import asyncio
import base64
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


async def run(args) -> dict:
    import numpy as np
    from aiohttp import WSMsgType
    from aiohttp.test_utils import TestClient, TestServer

    from gonova_tts_tpu.config import Config
    from gonova_tts_tpu.service import server as srv
    from gonova_tts_tpu.train.synth_corpus import DEFAULT_SENTENCES

    cfg = Config()
    cfg.model.model_path = args.checkpoint
    cfg.voice_cloning.cache_dir = args.voices_dir
    cfg.voice_cloning.default_voice_path = None
    cfg.logging.level = "WARNING"

    t0 = time.perf_counter()
    app = srv.create_app(cfg)
    client = TestClient(TestServer(app))
    await client.start_server()
    load_s = time.perf_counter() - t0

    report: dict = {"checkpoint": args.checkpoint, "load_s": round(load_s, 1)}
    try:
        resp = await client.get("/health")
        health = await resp.json()
        report["health"] = health["status"]
        report["backend"] = health.get("tpu", {}).get("backend")

        ws = await client.ws_connect("/v1/stream/tts")
        ref = os.path.join(args.corpus, "ref_spk_mid.wav")
        with open(ref, "rb") as f:
            await ws.send_json(
                {
                    "type": "register_voice",
                    "voice_id": "smoke_mid",
                    "reference_audio": base64.b64encode(f.read()).decode(),
                }
            )
        msg = json.loads((await asyncio.wait_for(ws.receive(), 600)).data)
        assert msg == {"type": "voice_registered", "voice_id": "smoke_mid"}, msg

        text = " ".join(DEFAULT_SENTENCES[: args.sentences])

        async def one_request():
            t0 = time.perf_counter()
            await ws.send_json(
                {"type": "synthesize", "text": text, "voice_id": "smoke_mid"}
            )
            chunks, ttfa = [], None
            while True:
                msg = await asyncio.wait_for(ws.receive(), timeout=600)
                if msg.type == WSMsgType.BINARY:
                    if ttfa is None:
                        ttfa = time.perf_counter() - t0
                    chunks.append(np.frombuffer(msg.data, dtype=np.float32))
                elif msg.type == WSMsgType.TEXT:
                    data = json.loads(msg.data)
                    if data.get("type") == "synthesis_complete":
                        final = data
                        break
                    if data.get("type") == "error":
                        # Surface the server's error instead of masking it behind
                        # a zero-chunk np.concatenate crash below.
                        raise AssertionError(
                            f"server error frame: {data.get('message')}"
                        )
                else:
                    raise AssertionError(f"unexpected WS message: {msg.type}")
            return chunks, ttfa, final, time.perf_counter() - t0

        chunks, ttfa, final, total = await one_request()
        # Steady-state pass (--repeat): the first request on a freshly registered
        # voice pays one-time work (speaker-embedding extraction at the reference
        # length); repeats measure the warmed serving path.
        for _ in range(max(0, args.repeat)):
            chunks, ttfa2, final, total2 = await one_request()
            report["ttfa_steady_ms"] = round(ttfa2 * 1000, 1)
            report["wall_steady_s"] = round(total2, 2)
        await ws.close()

        if not chunks:
            raise AssertionError(
                f"no audio chunks received (final frame: {final})"
            )
        audio = np.concatenate(chunks)
        secs = len(audio) / args.sr
        report.update(
            {
                "sentences": args.sentences,
                "chunks": len(chunks),
                "final_chunk_id": final["chunk_id"],
                "ttfa_ms": round(ttfa * 1000, 1),
                "wall_s": round(total, 2),
                "audio_s": round(secs, 2),
                "realtime_x": round(secs / total, 1),
                "rms": round(float(np.sqrt(np.mean(audio**2))), 4),
                "peak": round(float(np.abs(audio).max()), 4),
                "finite": bool(np.isfinite(audio).all()),
            }
        )
        if args.out:
            from gonova_tts_tpu.utils import write_wav

            write_wav(args.out, audio, args.sr)
            report["wav"] = args.out
    finally:
        await client.close()
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="/root/ckpts/demo2")
    ap.add_argument("--corpus", default="/root/corpus")
    ap.add_argument("--sentences", type=int, default=3)
    ap.add_argument("--voices-dir", default="/tmp/ws_smoke_voices")
    ap.add_argument("--out", default=None)
    ap.add_argument("--sr", type=int, default=24000,
                    help="served model sample rate (audio_s/realtime_x math + output WAV)")
    ap.add_argument("--repeat", type=int, default=0,
                    help="re-send the same request N times and report the last "
                         "pass as ttfa_steady_ms/wall_steady_s (first-request "
                         "one-time costs excluded)")
    args = ap.parse_args()
    print(json.dumps(asyncio.run(run(args))))


if __name__ == "__main__":
    main()
