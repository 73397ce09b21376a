"""Command-line interface: serve / synth / bench / voices / info.

The reference is launched as `python server.py` with env vars (services/tts/
server.py:484-502); this CLI keeps that (`serve` honors TTS_PORT) and adds the offline
tools the reference README describes but never shipped.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def cmd_serve(args: argparse.Namespace) -> int:
    from .service.server import create_app, web
    from .config import load_config

    config = load_config(args.config)
    if getattr(args, "model_path", None):
        config.model.model_path = args.model_path
    if args.port is not None:
        config.server.port = args.port  # TTS_PORT already applied by load_config
    app = create_app(config)
    web.run_app(app, host=config.server.host, port=config.server.port)
    return 0


def cmd_synth(args: argparse.Namespace) -> int:
    from .audio import stitch
    from .config import load_config
    from .engine import TTSEngine
    from .utils import write_wav

    config = load_config(args.config)
    if getattr(args, "model_path", None):
        config.model.model_path = args.model_path
    engine = TTSEngine(config)
    engine.load(warmup=False)
    speaker = None
    if args.voice_wav:
        speaker = engine.embed_voice_file(args.voice_wav)
    t0 = time.time()
    chunks = list(
        engine.synthesize_stream(args.text, speaker=speaker, exaggeration=args.exaggeration)
    )
    wall = time.time() - t0
    audio = stitch(chunks)
    write_wav(args.output, audio, engine.sample_rate)
    secs = len(audio) / engine.sample_rate
    print(
        f"wrote {args.output}: {secs:.2f}s audio in {wall:.2f}s "
        f"({secs / max(wall, 1e-9):.2f}x realtime)",
        file=sys.stderr,
    )
    return 0


def cmd_bench(args: argparse.Namespace) -> int:
    import runpy
    import os

    # bench.py ships at the repo root, not inside the wheel: resolve the repo
    # checkout (package parent) first, then the current directory, so
    # `gonova-tts bench` degrades with a clear message on pip installs.
    candidates = [
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
        os.path.join(os.getcwd(), "bench.py"),
    ]
    path = next((c for c in candidates if os.path.exists(c)), None)
    if path is None:
        print(
            "bench.py not found (it lives at the repo root, not in the installed "
            "package); run from a checkout or pass its directory as cwd",
            file=sys.stderr,
        )
        return 1
    saved_argv = sys.argv
    sys.argv = ["bench.py"]
    try:
        runpy.run_path(path, run_name="__main__")
    finally:
        sys.argv = saved_argv
    return 0


def cmd_train(args: argparse.Namespace) -> int:
    from .config import load_config
    from .train.loop import train

    manifest = args.manifest
    resident = args.resident
    if args.demo_corpus and args.manifest:
        # Silently training on the generated corpus while the user passed their
        # own data would be a nasty surprise; make the conflict explicit.
        print("--demo-corpus and --manifest are mutually exclusive", file=sys.stderr)
        return 1
    if args.demo_corpus:
        # One-command training demo: generate the deterministic formant corpus
        # (train/synth_corpus.py) if absent and train device-resident on it.
        # Grade the result with tools/eval_checkpoint.py (see TRAIN_EVAL.md).
        import os

        from .train.synth_corpus import generate_corpus

        # Variable per-token durations + a 2-sentence/speaker held-out split:
        # training sees manifest_train.txt only (no duration column → the MAS
        # aligner learns the text↔frame map); eval_checkpoint --heldout 2
        # --variable grades generalization and duration accuracy.
        manifest = os.path.join(args.demo_corpus, "manifest_train.txt")
        if not os.path.exists(manifest):
            generate_corpus(args.demo_corpus, variable=True, holdout=2)
        resident = True
    out = train(
        config=load_config(args.config),
        manifest=manifest,
        steps=args.steps,
        batch_size=args.batch_size,
        lr=args.lr,
        warmup=args.warmup,
        checkpoint_dir=args.checkpoint_dir,
        n_data=args.n_data,
        n_model=args.n_model,
        resident=resident,
        chunk=args.chunk,
        history_path=args.history,
        learn_alignment=args.learn_alignment,
        gan=args.gan,
    )
    print(json.dumps(out))
    return 0


def cmd_voices(args: argparse.Namespace) -> int:
    from .config import load_config
    from .service.voice_manager import VoiceManager

    config = load_config(args.config)
    vm = VoiceManager(cache_dir=config.voice_cloning.cache_dir)
    print(json.dumps(vm.list_voices(), indent=2))
    return 0


def cmd_info(args: argparse.Namespace) -> int:
    import jax

    from . import __version__
    from .models import registry

    info = {
        "version": __version__,
        "jax_backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
        "model_families": {
            name: {"kind": f.kind, "description": f.description}
            for name, f in registry.available().items()
        },
    }
    print(json.dumps(info, indent=2))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="gonova-tts", description="TPU-native streaming TTS")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("serve", help="run the WS/REST service")
    p.add_argument("--config", default=None)
    p.add_argument("--port", type=int, default=None)
    p.add_argument("--model-path", default=None, dest="model_path",
                   help="checkpoint: orbax dir, training root, or compact .npz")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("synth", help="offline synthesis to a WAV file")
    p.add_argument("text")
    p.add_argument("-o", "--output", default="out.wav")
    p.add_argument("--voice-wav", default=None, help="reference WAV for voice cloning")
    p.add_argument("--exaggeration", type=float, default=0.5)
    p.add_argument("--config", default=None)
    p.add_argument("--model-path", default=None, dest="model_path",
                   help="checkpoint: orbax dir, training root, or compact .npz")
    p.set_defaults(fn=cmd_synth)

    p = sub.add_parser("bench", help="run the headline benchmark")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("train", help="train the pipeline (see train/loop.py)")
    p.add_argument("--manifest", default=None)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--warmup", type=int, default=1000)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--n-data", type=int, default=None)
    p.add_argument("--n-model", type=int, default=1)
    p.add_argument("--config", default=None)
    p.add_argument("--resident", action="store_true",
                   help="device-resident corpus + fori_loop chunks (small corpora)")
    p.add_argument("--chunk", type=int, default=200)
    p.add_argument("--history", default=None, help="append per-interval metrics JSONL")
    p.add_argument("--learn-alignment", dest="learn_alignment", action="store_true",
                   default=None, help="force MAS alignment learning on")
    p.add_argument("--no-learn-alignment", dest="learn_alignment", action="store_false",
                   help="force the uniform-duration bootstrap (default: auto)")
    p.add_argument("--gan", action="store_true",
                   help="adversarial fine-tune of the vocoder (HiFi-GAN objective)")
    p.add_argument("--demo-corpus", default=None, metavar="DIR",
                   help="generate the deterministic formant corpus here (if absent) "
                        "and train device-resident on it — the TRAIN_EVAL.md recipe")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("voices", help="list registered voices")
    p.add_argument("--config", default=None)
    p.set_defaults(fn=cmd_voices)

    p = sub.add_parser("info", help="framework/device info")
    p.set_defaults(fn=cmd_info)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
