"""Device mesh + sharding rules.

The reference has no distributed code at all — scale-out is process-per-GPU behind an
external LB (SURVEY.md §2.4, reference server.py:485-494).  The TPU-native equivalent:
a `jax.sharding.Mesh` over ('data', 'model') with named shardings; XLA inserts the
collectives over ICI.  Serving uses data-parallel replicas (model axis 1); training
shards batch over 'data' and the wide hidden/channel dims over 'model' (tensor
parallelism).  Pattern-based rules keyed on parameter paths keep the pytree layout the
single source of truth.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils import get_logger

logger = get_logger("gonova.parallel")

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 2-D ('data', 'model') mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        if n % n_model != 0:
            raise ValueError(f"{n} devices not divisible by model axis {n_model}")
        n_data = n // n_model
    if n_data * n_model > n:
        raise ValueError(f"mesh {n_data}x{n_model} exceeds {n} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host bring-up: `jax.distributed.initialize` from explicit args or env.

    The reference's cross-host pattern is env-var-selected independent processes
    behind an external LB (reference server.py:485-494); the TPU-native equivalent
    for jobs that must act as ONE system (multi-host training, >1-host serving
    meshes) is the JAX coordinator.  Environment contract (all optional — absent ⇒
    single-host no-op, the v5e-1 serving default):

      TTS_COORDINATOR      host:port of process 0 (or JAX's own env autodetection)
      TTS_NUM_PROCESSES    total host processes
      TTS_PROCESS_ID       this host's rank

    Returns True iff distributed mode was initialized. Call before any other jax
    API touches the backend (same rule as jax.distributed itself).
    """
    import os

    coordinator_address = coordinator_address or os.environ.get("TTS_COORDINATOR")
    if coordinator_address is None:
        return False
    try:  # idempotent: the train loop auto-initializes, tools may have already
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return True
    except Exception:  # noqa: BLE001 — private-module layout drift
        pass
    if num_processes is None and "TTS_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["TTS_NUM_PROCESSES"])
    if process_id is None and "TTS_PROCESS_ID" in os.environ:
        process_id = int(os.environ["TTS_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_hybrid_mesh(
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """DCN × ICI mesh for multi-host jobs: ('data', 'model') where 'model' never
    crosses a host boundary.

    Layout follows the scaling-book recipe: tensor-parallel ('model') collectives
    are latency-bound, so they ride ICI inside one slice; data-parallel gradient
    reductions are bandwidth-tolerant, so 'data' spans hosts over DCN (outer) and
    fills the intra-slice remainder (inner).  Single-host (every device in one
    process) degrades to `make_mesh` exactly.
    """
    devices = list(devices if devices is not None else jax.devices())
    procs = sorted({d.process_index for d in devices})
    n_hosts = len(procs)
    if n_hosts == 1:
        return make_mesh(n_model=n_model, devices=devices)
    per_host = len(devices) // n_hosts
    if per_host * n_hosts != len(devices):
        raise ValueError(f"{len(devices)} devices uneven across {n_hosts} hosts")
    if per_host % n_model != 0:
        raise ValueError(
            f"model axis {n_model} does not divide the {per_host} per-host devices —"
            " 'model' must stay inside one host's ICI domain"
        )
    try:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(per_host // n_model, n_model),
            dcn_mesh_shape=(n_hosts, 1),  # hosts stack on 'data'; 'model' is ICI-only
            devices=devices,
        )
    except ValueError:
        # Backends without slice topology (e.g. the multi-process CPU emulation the
        # integration test runs on) reject the hybrid builder; the host-major grid
        # below keeps the same invariant — 'model' inside one process, hosts
        # stacked on 'data' — without ICI-aware reordering within a slice.
        rows = []
        for p in procs:
            host_devs = sorted(
                (d for d in devices if d.process_index == p), key=lambda d: d.id
            )
            rows.append(np.asarray(host_devs).reshape(per_host // n_model, n_model))
        grid = np.concatenate(rows, axis=0)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


# Parameter sharding rules: (path regex, PartitionSpec). First match wins.
# Paths are '/'-joined dict keys + list indices, e.g.
# "acoustic/encoder/blocks/0/ff1/w" or "vocoder/ups/2/w".
_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    # Embedding table: shard the model dim.
    (r".*embed/table$", P(None, MODEL_AXIS)),
    # Attention projections: q/k/v shard heads (out dim); o shards the in dim.
    (r".*attn/(q|k|v)/w$", P(None, MODEL_AXIS)),
    (r".*attn/o/w$", P(MODEL_AXIS, None)),
    (r".*attn/(q|k|v)/b$", P(MODEL_AXIS)),
    # Conv FFN: expand shards out-channels, contract shards in-channels.
    (r".*ff1/w$", P(None, None, MODEL_AXIS)),
    (r".*ff1/b$", P(MODEL_AXIS)),
    (r".*ff2/w$", P(None, MODEL_AXIS, None)),
    # Vocoder convs: shard out-channels on wide layers (in-channels stay replicated:
    # upsample stages halve channels, keeping the contraction local).
    (r"vocoder/conv_pre/w$", P(None, None, MODEL_AXIS)),
    (r"vocoder/conv_pre/b$", P(MODEL_AXIS)),
    # NovaVocos (iSTFT vocoder): pointwise MLPs shard like FFNs; the head and iDFT
    # stay replicated (bins dim is odd, 513).
    (r"vocoder/embed/w$", P(None, None, MODEL_AXIS)),
    (r"vocoder/embed/b$", P(MODEL_AXIS)),
    (r"vocoder/blocks/\d+/pw1/w$", P(None, MODEL_AXIS)),
    (r"vocoder/blocks/\d+/pw1/b$", P(MODEL_AXIS)),
    (r"vocoder/blocks/\d+/pw2/w$", P(MODEL_AXIS, None)),
    # Discriminators (training only): conv stacks shard out-channels like the
    # vocoder rules; conv_post (1 out-channel) falls through to replicated.
    (r"(mpd|msd)/subs/\d+/convs/\d+/w$", P(None, None, MODEL_AXIS)),
    (r"(mpd|msd)/subs/\d+/convs/\d+/b$", P(MODEL_AXIS)),
    # Everything else (norms, biases, small projections, MRF stacks): replicated.
    (r".*", P()),
)


def param_spec(path: str) -> P:
    for pattern, spec in _PARAM_RULES:
        if re.match(pattern, path):
            return spec
    return P()


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree matching `params` via the pattern rules.

    Dims that don't divide evenly by the mesh axis fall back to replicated for that
    leaf (correctness over cleverness; the production dims are all 128-multiples)."""

    def leaf_sharding(key_path, leaf):
        spec = param_spec(_path_str(key_path))
        # Validate divisibility; degrade to replicated if violated — but SAY SO:
        # a dim mismatch across the whole tree silently drops the requested
        # tensor parallelism (N× param+optimizer memory, zero tp collectives)
        # and is otherwise only detectable by profiling.
        axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            if dim >= leaf.ndim or leaf.shape[dim] % axis_sizes[axis] != 0:
                logger.warning(
                    "param_sharding_degraded_to_replicated",
                    param=_path_str(key_path),
                    shape=list(leaf.shape),
                    wanted=str(spec),
                    axis_size=axis_sizes[axis],
                )
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a params pytree onto the mesh per the rules."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
