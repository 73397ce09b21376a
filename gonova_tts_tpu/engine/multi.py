"""Data-parallel multi-chip serving: one engine, N devices, batch sharded over 'data'.

The reference scales out as process-per-GPU behind an external load balancer
(SURVEY.md §2.4; reference server.py:485-494).  On TPU the idiomatic intra-host
equivalent is one process driving all local chips through a ('data',) mesh: params
replicated, the batch dimension sharded, XLA partitioning the whole synthesis graph —
no per-replica processes, no external LB for the intra-host tier.  (The reference's
env-var LB pattern still applies across hosts.)

Usage: set `engine.data_parallel > 1` (or "all") in config; `TTSEngine.load` places
params/inputs via this module.  Batch buckets are rounded up to multiples of the mesh
size so every device gets equal work.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class DataParallel:
    def __init__(self, n_devices: Optional[int] = None):
        devices = jax.devices()
        n = n_devices or len(devices)
        if n > len(devices):
            raise ValueError(f"requested {n} devices, have {len(devices)}")
        self.n = n
        self.mesh = Mesh(np.asarray(devices[:n]), ("data",))
        self.replicated = NamedSharding(self.mesh, P())

    def batch_sharding(self, ndim: int) -> NamedSharding:
        return NamedSharding(self.mesh, P("data", *([None] * (ndim - 1))))

    def place_params(self, params: Any) -> Any:
        """Replicate the parameter pytree on every device of the mesh."""
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, self.replicated), params)

    def place_batch(self, arr: np.ndarray):
        """Shard a batch-leading array over the data axis."""
        return jax.device_put(arr, self.batch_sharding(np.ndim(arr)))

    def round_batch(self, b: int) -> int:
        """Smallest multiple of the mesh size >= b."""
        return -(-b // self.n) * self.n
