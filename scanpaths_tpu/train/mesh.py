"""Device mesh and sharding helpers (data-parallel over ICI).

The reference's parallelism surface is single-process
``nn.DataParallel`` over 2 GPUs (reference AiR/train.py:169-170); the
TPU-native equivalent is a 1-D ``jax.sharding.Mesh`` with the batch
sharded over the ``data`` axis and parameters replicated — XLA inserts
the gradient all-reduce (psum over ICI) automatically from the sharding
annotations.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0) -> Mesh:
    devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place the numeric leaves of a host batch onto the mesh, sharded
    along the batch axis (ragged host-side fields are passed through)."""
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    n_dev = mesh.devices.size
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1:
            # partial batches (validation tails) fall back to replication
            out[k] = jax.device_put(
                v, sh if v.shape[0] % n_dev == 0 else rep)
        else:
            out[k] = v
    return out
