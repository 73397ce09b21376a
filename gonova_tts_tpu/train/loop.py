"""Training loop driver: dataset → (sharded) train step → checkpoints + metric logs.

Entry point: `gonova-tts train` (cli.py) or `python -m gonova_tts_tpu.train.loop`.
Single-chip by default; pass mesh axes to shard (dp × tp) — the step function comes
from train/step.py either way.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from ..config import Config, load_config
from ..models import tts
from ..parallel import make_mesh
from ..utils import get_logger
from . import step as tstep
from .checkpoint import save_params

logger = get_logger("gonova.train")


def _serve_params(tree):
    """Strip the aligner subtree before checkpointing: it exists to extract
    durations during training; serving never evaluates it."""
    if isinstance(tree, dict):
        return {k: v for k, v in tree.items() if k != "aligner"}
    return tree


def make_speaker_fn(params, mcfg):
    """(audio[T] f32 @ model rate, sr) → speaker embedding, using the (frozen)
    speaker encoder — the same static-10s-buffer + masked-mean convention as
    engine.embed_voice, so train-time conditioning matches serve-time cloning."""
    import jax.numpy as jnp

    from ..audio.mel import mel_spectrogram
    from ..audio.resample import resample_np

    max_samples = int(10.0 * mcfg.sample_rate)
    max_samples -= max_samples % mcfg.hop_length

    @jax.jit
    def _embed(buf, valid):
        mel = mel_spectrogram(
            buf[None], sr=mcfg.sample_rate, n_fft=mcfg.n_fft,
            hop_length=mcfg.hop_length, win_length=mcfg.win_length,
            n_mels=mcfg.n_mels, fmin=mcfg.fmin, fmax=mcfg.fmax,
        )
        mask = (jnp.arange(mel.shape[1])[None] < valid).astype(jnp.float32)
        return tts.embed_speaker(params, mel, mask)[0]

    def speaker_fn(wav: np.ndarray, sr: int) -> np.ndarray:
        if sr != mcfg.sample_rate:
            wav = resample_np(np.asarray(wav, np.float32), sr, mcfg.sample_rate)
        n = min(len(wav), max_samples)
        buf = np.zeros((max_samples,), np.float32)
        buf[:n] = wav[:n]
        return np.asarray(_embed(buf, n // mcfg.hop_length))

    return speaker_fn


def train(
    config: Optional[Config] = None,
    manifest: Optional[str] = None,
    steps: int = 1000,
    batch_size: int = 8,
    lr: float = 2e-4,
    warmup: int = 1000,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 500,
    n_data: Optional[int] = None,
    n_model: int = 1,
    seed: int = 0,
    ema_decay: float = 0.999,
    speaker_conditioning: bool = True,
    resident: bool = False,
    chunk: int = 50,
    history_path: Optional[str] = None,
    learn_alignment: Optional[bool] = None,
    gan: bool = False,
    gan_steps: Optional[int] = None,
    gan_lr: float = 2e-4,
) -> dict:
    """Run `steps` optimization steps; returns final metrics.

    `resident=True` stacks the whole (small) dataset on device and runs `chunk`
    steps per jitted fori_loop call (see step.make_resident_train_chunk) — the
    right mode for overfit runs and this environment's tunneled TPU.
    `history_path` appends one JSON line of mean metrics per logging interval.
    `learn_alignment` None = auto: when the manifest supplies no duration targets,
    alignment is LEARNED in-graph (MAS aligner, models/aligner.py) rather than
    bootstrapped with a uniform spread — raw (text, audio) pairs suffice, like the
    reference's external model.
    `gan=True` appends an adversarial vocoder fine-tune (HiFi-GAN objective:
    MPD+MSD discriminators, LSGAN + feature-matching + λ_mel) for `gan_steps`
    (default: `steps`) after the joint phase; only the vocoder subtree trains, and
    its EMA replaces the vocoder in the saved checkpoint."""
    config = config or load_config()
    mcfg = config.model
    # Multi-host bring-up FIRST (before anything touches the backend): a no-op
    # unless TTS_COORDINATOR/TTS_NUM_PROCESSES/TTS_PROCESS_ID are set (the env
    # contract in parallel/mesh.py). With multiple processes the mesh below is
    # built DCN×ICI so the 'model' axis never crosses a host boundary.
    from ..parallel import init_distributed

    distributed = init_distributed()
    # Persistent compile cache — tunnel compiles cost minutes, reruns seconds.
    import os as _os

    from ..utils import enable_compile_cache

    _repo_root = _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    enable_compile_cache(_os.path.join(_repo_root, ".jax_cache"))
    if resident:
        if (n_data or 0) > 1 or n_model > 1 or distributed:
            # Never silently drop requested parallelism: the resident chunk runner
            # is single-device by construction (sharded training is the non-resident
            # path via make_sharded_train_step).
            raise ValueError(
                "resident mode is single-device; drop --resident to train with "
                f"n_data={n_data}/n_model={n_model} sharding"
            )
        if steps % chunk != 0:
            # The chunk runner executes whole compiled chunks; round the budget up
            # front so the step accounting (logs, LR schedule, checkpoint names)
            # matches what actually runs.
            rounded = ((steps + chunk - 1) // chunk) * chunk
            logger.info("steps_rounded_to_chunk", requested=steps, actual=rounded)
            steps = rounded
    manifest_entries = None
    if manifest:
        from .data import load_manifest

        manifest_entries = load_manifest(manifest)  # parsed ONCE, reused below
    if learn_alignment is None:
        learn_alignment = manifest_entries is not None and not any(
            "durations" in e for e in manifest_entries
        )
    elif learn_alignment and not manifest:
        # Honoring the flag would crash at trace time on a missing
        # batch["pitch_frames"] — synthetic batches carry duration targets and
        # no audio-derived alignment features.
        raise ValueError(
            "--learn-alignment requires --manifest: alignment is learned from "
            "(text, audio) pairs; synthetic batches have no audio features"
        )
    # One jitted init graph (eager init = one device round trip per tensor).
    params = jax.jit(lambda k: tts.init(k, mcfg, with_aligner=learn_alignment))(
        jax.random.PRNGKey(seed)
    )
    # Cosine decay over the actual run length: short overfit runs otherwise sit at
    # peak LR for their whole duration and plateau on optimizer noise.
    optimizer = tstep.make_optimizer(lr=lr, warmup=warmup, decay_steps=max(steps, warmup + 1))
    state = tstep.init_state(params, optimizer)

    if manifest:
        from .data import ManifestDataset
        # Resident mode stacks all batches into one [N, ...] array, so every batch
        # must share one bucket shape: collapse the ladder to the smallest rung
        # that fits the corpus' longest sentence.
        if resident:
            from ..text import pick_bucket, text_to_ids

            longest = max(
                len(text_to_ids(e["text"])) for e in manifest_entries
            )
            buckets = (pick_bucket(longest, config.engine.token_buckets),)
        else:
            buckets = tuple(config.engine.token_buckets)
        dataset = ManifestDataset(
            manifest, mcfg, batch_size=batch_size,
            token_buckets=buckets, seed=seed,
            ref_mel=speaker_conditioning,
            learn_alignment=learn_alignment,
            entries=manifest_entries,
        )
        logger.info("alignment_mode", learned=learn_alignment)

        def batches():
            epoch = 0
            while True:
                yield from dataset.epoch(epoch)
                epoch += 1
    else:
        synthetic = tstep.synthetic_batch(mcfg, batch=batch_size, tokens=32, seed=seed)

        def batches():
            while True:
                yield synthetic

    history = None
    if history_path:
        import os as _os

        _os.makedirs(_os.path.dirname(_os.path.abspath(history_path)), exist_ok=True)
        history = open(history_path, "a")

    def log_point(step_no, metrics, t0):
        vals = {k: round(float(v), 5) for k, v in metrics.items()}
        logger.info(
            "train_step", step=step_no, total=vals["total"], mel=vals["ac_mel"],
            stft=vals["stft"], steps_per_sec=round(step_no / (time.time() - t0), 2),
        )
        if history:
            import json

            history.write(json.dumps({"step": step_no, **vals}) + "\n")
            history.flush()

    if resident:
        if not manifest:
            raise ValueError("resident mode needs a manifest corpus")
        # Device-resident corpus: one epoch's batches, fixed grouping, cycled.
        # Data prep (per-utterance mel/F0) runs pinned to the host CPU device:
        # utterance lengths vary, and on the tunneled TPU every new shape would be
        # a minutes-long compile.
        import contextlib

        prep_ctx = contextlib.nullcontext()
        if jax.default_backend() != "cpu":
            try:
                cpu_dev = jax.devices("cpu")[0]
                prep_ctx = jax.default_device(cpu_dev)
            except RuntimeError:
                pass
        with prep_ctx:
            epoch_batches = [
                {k: np.asarray(v) for k, v in b.items()} for b in dataset.epoch(0)
            ]
        logger.info(
            "resident_corpus",
            batches=len(epoch_batches),
            bucket=int(epoch_batches[0]["tokens"].shape[1]),
        )
        run_chunk, corpus = tstep.make_resident_train_chunk(
            mcfg, optimizer, epoch_batches, chunk=chunk, ema_decay=ema_decay,
            learn_alignment=learn_alignment,
        )
        # Zero-seeded debiased EMA: a params-seeded shadow would leave decay^t of
        # the RANDOM INIT in every checkpoint (~37% after 1000 steps at 0.999).
        ema = tstep.ema_init_zeros(state.params)
        t0 = time.time()
        done = 0
        metrics = {}
        while done < steps:
            state, ema, metrics = run_chunk(state, ema, done, corpus)
            done += chunk
            log_point(done, {k: v for k, v in metrics.items()}, t0)
            if checkpoint_dir and done % checkpoint_every < chunk and done < steps:
                snap = tstep.ema_debias(ema, ema_decay, done)
                path = save_params(checkpoint_dir, _serve_params(jax.device_get(snap)), step=done)
                logger.info("checkpoint_saved", path=path, kind="ema")
    else:
        use_mesh = (n_data or 0) > 1 or n_model > 1 or distributed
        example = next(iter(batches()))
        if use_mesh:
            if distributed and jax.process_count() > 1:
                from ..parallel import make_hybrid_mesh

                mesh = make_hybrid_mesh(n_model=n_model)
            else:
                mesh = make_mesh(n_data=n_data, n_model=n_model)
            step_fn, state = tstep.make_sharded_train_step(
                mcfg, optimizer, mesh, state, example,
                learn_alignment=learn_alignment,
            )
            logger.info("train_sharded", mesh=str(mesh.devices.shape))
        else:
            step_fn = tstep.make_train_step(
                mcfg, optimizer, learn_alignment=learn_alignment
            )

        ema = tstep.ema_init_zeros(jax.device_get(state.params))
        ema_step = jax.jit(lambda e, p: tstep.ema_update(e, p, ema_decay))

        metrics = {}
        t0 = time.time()
        for i, batch in enumerate(batches()):
            if i >= steps:
                break
            state, metrics = step_fn(state, batch)
            ema = ema_step(ema, state.params)
            if (i + 1) % 50 == 0 or i == 0:
                log_point(i + 1, metrics, t0)
            if checkpoint_dir and (i + 1) % checkpoint_every == 0:
                snap = tstep.ema_debias(ema, ema_decay, i + 1)
                path = save_params(checkpoint_dir, _serve_params(jax.device_get(snap)), step=i + 1)
                logger.info("checkpoint_saved", path=path, kind="ema")

    # From here on `ema` is read (baseline save, GAN merge, final save): convert
    # the zero-seeded shadow to its bias-corrected form exactly once.
    ema = tstep.ema_debias(ema, ema_decay, steps)

    if gan:
        if not manifest:
            raise ValueError("adversarial training needs a manifest corpus")
        from ..models import vocoder as voc_mod

        n_gan = gan_steps or steps
        if resident and n_gan % chunk != 0:
            n_gan = ((n_gan + chunk - 1) // chunk) * chunk
        g_opt = tstep.make_optimizer(
            lr=gan_lr, warmup=min(200, max(n_gan // 10, 1)), decay_steps=max(n_gan, 2)
        )
        d_opt = tstep.make_optimizer(
            lr=gan_lr, warmup=min(200, max(n_gan // 10, 1)), decay_steps=max(n_gan, 2)
        )
        # Generator = the TRAINED vocoder subtree only: the acoustic/speaker weights
        # get no adversarial gradient, and handing them to adamw anyway would decay
        # them toward zero for the whole phase.
        gen_params = {"vocoder": jax.device_get(state.params)["vocoder"]}
        disc_params = {
            "mpd": voc_mod.mpd_init(jax.random.PRNGKey(seed + 101), width=mcfg.disc_width),
            "msd": voc_mod.msd_init(jax.random.PRNGKey(seed + 102), width=mcfg.disc_width),
        }
        gen_state = tstep.init_state(gen_params, g_opt)
        disc_state = tstep.init_state(disc_params, d_opt)
        if checkpoint_dir:
            # The joint-phase EMA is the L1-only baseline the GAN result is graded
            # against; persist it before the vocoder diverges.
            path = save_params(checkpoint_dir, _serve_params(jax.device_get(ema)), step=steps)
            logger.info("checkpoint_saved", path=path, kind="ema_pre_gan")
        logger.info("gan_phase_start", steps=n_gan, lr=gan_lr)

        def log_gan(step_no, gm, t0):
            vals = {k: round(float(v), 5) for k, v in gm.items()}
            logger.info("gan_step", step=step_no, **vals)
            if history:
                import json

                history.write(json.dumps({"phase": "gan", "step": step_no, **vals}) + "\n")
                history.flush()

        t0 = time.time()
        gm = {}
        if resident:
            run_gan, gan_corpus = tstep.make_resident_gan_chunk(
                mcfg, g_opt, d_opt, epoch_batches, chunk=chunk, ema_decay=ema_decay
            )
            ema_voc = tstep.ema_init_zeros(gen_state.params)
            done = 0
            while done < n_gan:
                gen_state, disc_state, ema_voc, gm = run_gan(
                    gen_state, disc_state, ema_voc, done, gan_corpus
                )
                done += chunk
                log_gan(done, gm, t0)
            n_gan_updates = done
        else:
            if use_mesh:
                # Same never-silently-drop-parallelism rule as the joint phase:
                # the adversarial fine-tune shards over the mesh too.
                d_step, g_step, gen_state, disc_state = tstep.make_sharded_gan_steps(
                    mcfg, g_opt, d_opt, mesh, gen_state, disc_state
                )
                logger.info("gan_sharded", mesh=str(mesh.devices.shape))
            else:
                d_step, g_step = tstep.make_gan_steps(mcfg, g_opt, d_opt)
            ema_voc = tstep.ema_init_zeros(gen_state.params)
            ema_step_g = jax.jit(lambda e, p: tstep.ema_update(e, p, ema_decay))
            for i, batch in enumerate(batches()):
                if i >= n_gan:
                    break
                disc_state, d_loss = d_step(
                    disc_state, gen_state.params, batch["mel"], batch["audio"]
                )
                gen_state, g_metrics = g_step(
                    gen_state, disc_state.params, batch["mel"], batch["audio"],
                    batch["frame_mask"],
                )
                ema_voc = ema_step_g(ema_voc, gen_state.params)
                gm = {"d": d_loss, **g_metrics}
                if (i + 1) % 50 == 0 or i == 0:
                    log_gan(i + 1, gm, t0)
                n_gan_updates = i + 1
        # The adversarially-trained vocoder EMA (debiased) replaces the L1-phase
        # vocoder in the serving weights.
        ema = dict(ema)
        ema["vocoder"] = jax.device_get(
            tstep.ema_debias(ema_voc, ema_decay, n_gan_updates)
        )["vocoder"]
        metrics = {
            **{k: float(v) for k, v in metrics.items()},
            **{f"gan_{k}": float(v) for k, v in gm.items()},
        }

    if history:
        history.close()
    if checkpoint_dir:
        final_step = steps + (n_gan if gan else 0)
        path = save_params(
            checkpoint_dir, _serve_params(jax.device_get(ema)), step=final_step
        )
        logger.info("checkpoint_saved", path=path, kind="ema")
    return {k: float(v) for k, v in metrics.items()}




def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description="train the gonova TTS pipeline")
    ap.add_argument("--manifest", default=None, help="wav|text manifest (default: synthetic batch)")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--warmup", type=int, default=1000)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=500)
    ap.add_argument("--n-data", type=int, default=None)
    ap.add_argument("--n-model", type=int, default=1)
    ap.add_argument("--config", default=None)
    ap.add_argument("--resident", action="store_true",
                    help="device-resident corpus + fori_loop chunks (small corpora)")
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--no-speaker-conditioning", action="store_true")
    ap.add_argument("--history", default=None, help="append per-interval metrics JSONL here")
    ap.add_argument("--learn-alignment", dest="learn_alignment", action="store_true",
                    default=None, help="force MAS alignment learning on")
    ap.add_argument("--no-learn-alignment", dest="learn_alignment", action="store_false",
                    help="force the uniform-duration bootstrap (default: auto — learn "
                         "alignment when the manifest has no duration column)")
    ap.add_argument("--gan", action="store_true",
                    help="adversarial vocoder fine-tune after the joint phase")
    ap.add_argument("--gan-steps", type=int, default=None)
    ap.add_argument("--gan-lr", type=float, default=2e-4)
    args = ap.parse_args()
    config = load_config(args.config)
    out = train(
        config=config,
        manifest=args.manifest,
        steps=args.steps,
        batch_size=args.batch_size,
        lr=args.lr,
        warmup=args.warmup,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        n_data=args.n_data,
        n_model=args.n_model,
        resident=args.resident,
        chunk=args.chunk,
        speaker_conditioning=not args.no_speaker_conditioning,
        history_path=args.history,
        learn_alignment=args.learn_alignment,
        gan=args.gan,
        gan_steps=args.gan_steps,
        gan_lr=args.gan_lr,
    )
    print(out)


if __name__ == "__main__":
    main()
