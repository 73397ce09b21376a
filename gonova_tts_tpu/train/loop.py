"""Training loop driver: dataset → (sharded) train step → checkpoints + metric logs.

Entry point: `gonova-tts train` (cli.py) or `python -m gonova_tts_tpu.train.loop`.
Single-chip by default; pass mesh axes to shard (dp × tp) — the step function comes
from train/step.py either way.
"""

from __future__ import annotations

import time
from typing import Optional

import jax

from ..config import Config, load_config
from ..models import tts
from ..parallel import make_mesh
from ..utils import get_logger
from . import step as tstep
from .checkpoint import save_params

logger = get_logger("gonova.train")


def train(
    config: Optional[Config] = None,
    manifest: Optional[str] = None,
    steps: int = 1000,
    batch_size: int = 8,
    lr: float = 2e-4,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 500,
    n_data: Optional[int] = None,
    n_model: int = 1,
    seed: int = 0,
    ema_decay: float = 0.999,
) -> dict:
    """Run `steps` optimization steps; returns final metrics."""
    config = config or load_config()
    mcfg = config.model
    # One jitted init graph (eager init = one device round trip per tensor).
    params = jax.jit(lambda k: tts.init(k, mcfg))(jax.random.PRNGKey(seed))
    optimizer = tstep.make_optimizer(lr=lr)
    state = tstep.init_state(params, optimizer)

    if manifest:
        from .data import ManifestDataset

        dataset = ManifestDataset(
            manifest, mcfg, batch_size=batch_size,
            token_buckets=tuple(config.engine.token_buckets), seed=seed,
        )

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

    use_mesh = (n_data or 0) > 1 or n_model > 1
    example = next(iter(batches()))
    if use_mesh:
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        step_fn, state = tstep.make_sharded_train_step(
            mcfg, optimizer, mesh, state, example
        )
        logger.info("train_sharded", mesh=str(mesh.devices.shape))
    else:
        step_fn = tstep.make_train_step(mcfg, optimizer)

    ema = tstep.ema_init(jax.device_get(state.params))
    ema_step = jax.jit(lambda e, p: tstep.ema_update(e, p, ema_decay))

    metrics = {}
    t0 = time.time()
    for i, batch in enumerate(batches()):
        if i >= steps:
            break
        state, metrics = step_fn(state, batch)
        ema = ema_step(ema, state.params)
        if (i + 1) % 50 == 0 or i == 0:
            logger.info(
                "train_step",
                step=i + 1,
                total=round(float(metrics["total"]), 4),
                mel=round(float(metrics["ac_mel"]), 4),
                stft=round(float(metrics["stft"]), 4),
                steps_per_sec=round((i + 1) / (time.time() - t0), 2),
            )
        if checkpoint_dir and (i + 1) % checkpoint_every == 0:
            path = save_params(checkpoint_dir, jax.device_get(ema), step=i + 1)
            logger.info("checkpoint_saved", path=path, kind="ema")

    if checkpoint_dir:
        path = save_params(checkpoint_dir, jax.device_get(ema), step=steps)
        logger.info("checkpoint_saved", path=path, kind="ema")
    return {k: float(v) for k, v in metrics.items()}


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description="train the gonova TTS pipeline")
    ap.add_argument("--manifest", default=None, help="wav|text manifest (default: synthetic batch)")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--n-data", type=int, default=None)
    ap.add_argument("--n-model", type=int, default=1)
    ap.add_argument("--config", default=None)
    args = ap.parse_args()
    config = load_config(args.config)
    out = train(
        config=config,
        manifest=args.manifest,
        steps=args.steps,
        batch_size=args.batch_size,
        lr=args.lr,
        checkpoint_dir=args.checkpoint_dir,
        n_data=args.n_data,
        n_model=args.n_model,
    )
    print(out)


if __name__ == "__main__":
    main()
