"""Device meshes and shardings.

The reference's only distribution strategy is Lightning DDP (replicated
model, per-rank data shards, NCCL gradient all-reduce — scripts/train.py:78,
SURVEY.md S2.3). The TPU-native equivalent is SPMD data parallelism over a
1-D mesh: the batch dimension is sharded over the 'data' axis, parameters
are replicated, and XLA inserts the gradient all-reduce over ICI when the
jitted train step takes sharded batches. Multi-slice scaling is the same
mesh spanning slices (DCN handled by the runtime).

Streaming multi-sequence pod inference (BASELINE.json config 5) uses the
same scheme: one sequence window per device along 'data'.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def data_mesh_for_batch(batch_size: int, axis: str = "data") -> Mesh:
    """Largest data mesh that evenly divides the batch (DDP semantics:
    per-device microbatch = batch / world; the reference requires the same,
    Lightning splits batch across ranks)."""
    n = len(jax.devices())
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(n, axis)


def shard_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    """Place a host batch dict with leading batch dim onto the mesh,
    sharded along the data axis."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
