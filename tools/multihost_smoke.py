"""Two-process multi-host integration smoke (DCN emulated over localhost).

The reference scales across hosts only as independent processes behind an external
LB (reference server.py:485-494). The TPU-native multi-host path —
`parallel.init_distributed` (jax.distributed coordinator) + `make_hybrid_mesh`
('model' pinned inside one host, hosts stacked on 'data') — is exercised here for
real: two OS processes, each exposing 4 virtual CPU devices, form one 8-device
system and run the FULL dp×tp sharded training step; cross-host 'data' collectives
ride the Gloo transport standing in for DCN.

One command spawns both ranks and checks they agree:
  python tools/multihost_smoke.py            # orchestrator
  python tools/multihost_smoke.py --rank N --port P   # one worker (internal)

Prints one JSON line from the orchestrator; exit 0 iff both ranks finish with the
same finite loss.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(rank: int, port: int, devices_per_host: int, n_model: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices_per_host}"
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gonova_tts_tpu.parallel import mesh as M

    assert M.init_distributed(f"localhost:{port}", num_processes=2, process_id=rank)
    mesh = M.make_hybrid_mesh(n_model=n_model)
    # Invariant under test: 'model' never crosses a host boundary.
    for row in mesh.devices:
        for j in range(0, len(row), n_model):
            procs = {d.process_index for d in row[j : j + n_model]}
            assert len(procs) == 1, f"model group spans hosts: {procs}"

    from gonova_tts_tpu.config import ModelConfig
    from gonova_tts_tpu.models import tts
    from gonova_tts_tpu.train import step as tstep

    cfg = ModelConfig(
        d_model=64,
        n_heads=2,
        d_ff=128,
        encoder_layers=1,
        decoder_layers=1,
        speaker_dim=32,
        upsample_initial_channel=32,
        vocab_size=64,
    )
    params = tts.init(jax.random.PRNGKey(0), cfg)
    opt = tstep.make_optimizer(lr=1e-3, warmup=1)
    state = tstep.init_state(params, opt)
    batch = tstep.synthetic_batch(cfg, batch=2 * devices_per_host, tokens=16)
    step_fn, placed = tstep.make_sharded_train_step(cfg, opt, mesh, state, batch)
    for _ in range(2):  # two steps: optimizer state round-trips the mesh too
        placed, metrics = step_fn(placed, batch)
    total = float(metrics["total"])
    assert np.isfinite(total)
    print(
        f"MHOK rank={rank} mesh={mesh.devices.shape} "
        f"hosts={len({d.process_index for d in mesh.devices.ravel()})} loss={total:.6f}",
        flush=True,
    )


def orchestrate(port: int, devices_per_host: int, n_model: int, timeout: int) -> int:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--port",
        str(port),
        "--devices-per-host",
        str(devices_per_host),
        "--n-model",
        str(n_model),
    ]
    procs = [
        subprocess.Popen(
            cmd + ["--rank", str(r)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for r in (0, 1)
    ]
    try:
        outs = [p.communicate(timeout=timeout)[0] for p in procs]
    except subprocess.TimeoutExpired:
        # A hung rank (stale coordinator port, lost peer) must not leak workers or
        # surface as an opaque TimeoutExpired in callers — kill both, report JSON.
        for p in procs:
            if p.poll() is None:
                p.kill()
        outs = [p.communicate()[0] for p in procs]
        for r, out in enumerate(outs):
            print(f"--- rank {r} output (killed after {timeout}s) ---", file=sys.stderr)
            print(out[-2000:], file=sys.stderr)
        print(json.dumps({"ok": False, "error": f"timeout after {timeout}s"}))
        return 1
    losses = []
    for r, out in enumerate(outs):
        m = re.search(r"MHOK rank=%d mesh=\((\d+), (\d+)\) hosts=(\d+) loss=([\d.eE+-]+)" % r, out)
        if procs[r].returncode != 0 or m is None:
            print(out[-2000:], file=sys.stderr)
            print(json.dumps({"ok": False, "failed_rank": r, "rc": procs[r].returncode}))
            return 1
        losses.append((int(m.group(1)), int(m.group(2)), int(m.group(3)), float(m.group(4))))
    agree = losses[0] == losses[1]
    d, t, hosts, loss = losses[0]
    print(
        json.dumps(
            {
                "ok": agree,
                "mesh": [d, t],
                "hosts": hosts,
                "global_devices": d * t,
                "loss": loss,
                "ranks_agree": agree,
            }
        )
    )
    return 0 if agree else 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    ap.add_argument("--port", type=int, default=29517)
    ap.add_argument("--devices-per-host", type=int, default=4)
    ap.add_argument("--n-model", type=int, default=2)
    # Below the pytest wrapper's 420 s so a hang is reported here (JSON + tails),
    # not as the caller's opaque TimeoutExpired.
    ap.add_argument("--timeout", type=int, default=360)
    args = ap.parse_args()
    if args.rank is not None:
        worker(args.rank, args.port, args.devices_per_host, args.n_model)
        return
    sys.exit(orchestrate(args.port, args.devices_per_host, args.n_model, args.timeout))


if __name__ == "__main__":
    main()
