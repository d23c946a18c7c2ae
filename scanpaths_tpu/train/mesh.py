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


def shard_batch(mesh: Mesh, batch: dict, global_batch: int | None = None,
                process_count: int | None = None) -> dict:
    """Place the numeric leaves of a host batch onto the mesh, sharded
    along the batch axis (ragged host-side fields are passed through).

    Single-process (the common case): plain ``device_put``.  Multi-host
    (``jax.process_count() > 1``): each leaf is this host's contiguous
    per-host slice of the global batch (produced by ``data.Loader``
    with its default process args) and the global array is assembled
    with ``jax.make_array_from_process_local_data`` — data rides each
    host's PCIe to its own chips, nothing crosses DCN.  ``global_batch``
    tells the multi-host path the intended global leading dim; a leaf
    whose leading dim is NOT global_batch/process_count (validation
    tails, loaded in full on every host) is replicated instead.
    ``process_count`` is overridable for single-process testing."""
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    n_dev = mesh.devices.size
    if process_count is None:
        # same no-client-means-single-process resolution as data.Loader
        # (avoids jax.process_count() as a backend-init trigger)
        try:
            from jax._src.distributed import global_state
            pc = jax.process_count() if global_state.client is not None \
                else 1
        except Exception:
            pc = 1
    else:
        pc = process_count
    out = {}
    for k, v in batch.items():
        if not (isinstance(v, np.ndarray) and v.ndim >= 1):
            out[k] = v
        elif pc > 1 or process_count is not None:
            # (an explicit process_count opts single-process tests into
            # exercising this assembly path)
            per_host = ((global_batch or v.shape[0] * pc) // pc)
            if v.shape[0] == per_host and (per_host * pc) % n_dev == 0:
                out[k] = jax.make_array_from_process_local_data(sh, v)
            else:
                # full-on-every-host leaf (partial validation tail)
                out[k] = jax.make_array_from_process_local_data(rep, v)
        else:
            # partial batches (validation tails) fall back to replication
            out[k] = jax.device_put(
                v, sh if v.shape[0] % n_dev == 0 else rep)
    return out
