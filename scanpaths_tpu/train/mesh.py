"""Device mesh and sharding helpers (data + tensor parallel over ICI).

The reference's parallelism surface is single-process
``nn.DataParallel`` over 2 GPUs (reference AiR/train.py:169-170); the
TPU-native equivalent is a ``jax.sharding.Mesh`` with the batch sharded
over the ``data`` axis — XLA inserts the gradient all-reduce (psum over
ICI) automatically from the sharding annotations.

``--model_parallel T`` adds a second ``model`` axis and shards the
network's weights row-parallel: every conv/dense KERNEL is partitioned
along its contraction (input-channel) dimension, so parameters and
Adam moments scale 1/T in memory on the sharded leaves.  How the
sharded weights are USED differs by path, and deliberately so:

* **Inference forwards** (the eval sweep, decode, serving) compute
  directly on the sharded kernels: each shard contracts its channel
  slice and XLA inserts one ``psum`` over ``model`` per sharded op.
  Activations stay replicated on ``model`` (sharded only on ``data``),
  so the recurrent decode scan's collective pattern is trivially
  correct — no gather of the ConvLSTM state is ever needed, and the
  4-gate concatenated output dimension (components.py:238 splits it
  contiguously) never has to align with a shard boundary.  This path
  is equivalence-proven against the replicated program (1e-5 over
  every output head, tests/test_mesh.py).

* **Training steps** instead all-gather the parameters at step entry
  (``steps.supervised_step(params_gather=...)``, the ZeRO-3/FSDP
  pattern) and run the forward+backward as the replicated program;
  gradients reduce over ``data``, and the optimizer update writes the
  new params/moments back sharded (one gather + one slice per step —
  ~tens of MB over ICI for this model).  The gather is NOT a cop-out:
  differentiating *through the decode scan* with contraction-sharded
  broadcast kernels is miscompiled by BOTH current XLA partitioners
  on a 2-D mesh.  The checked-in reproducer ``tools/tp_repro.py``
  makes this falsifiable — measured on jax 0.9.0 (CPU backend,
  compile cache disabled): Shardy returns deterministically wrong
  losses inside value_and_grad (loss_duration off by 0.083 at tiny
  geometry); GSPMD with the fused head returns the exact loss but the
  ConvLSTM gate kernel's gradient comes back exactly ~2x and xgates'
  ~4x partial, while a plain scan+sharded-conv toy program compiles
  correctly under both.  Run tp_repro after a jax upgrade: exit 0
  means the bug is fixed upstream and this design can be revisited.
  The gather-at-entry step sidesteps the partitioner corner entirely
  because its internal program IS the replicated one — verified
  correct under BOTH partitioners; tests/test_mesh.py pins step-level
  equivalence.

  **True row-parallel training exists too** (train/tp_step.py): a
  ``shard_map`` supervised step with hand-written collectives
  (Megatron-style tp_enter/tp_exit boundaries, components.py) shards
  the two heavy decode kernels (~81% of model FLOPs) along their
  contraction dim and never lets a partitioner see the scan —
  step-equivalent to the replicated program
  (tests/test_tp_shardmap.py) and exercised by the multi-chip dryrun.
  It stays opt-in until profiled on real multi-chip hardware.

Pipeline/expert axes are deliberately absent: the model has no expert
layers, and its depth (a 16-step recurrent scan over a 4-stage trunk)
is far too shallow for pipeline bubbles to amortize — dp x tp is the
full useful parallelism surface of this architecture.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0, model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    if model_parallel > 1:
        if len(devices) % model_parallel:
            raise ValueError(
                f"model_parallel={model_parallel} must divide the device "
                f"count ({len(devices)})")
        shape = (len(devices) // model_parallel, model_parallel)
        try:
            # topology-aware ordering: the minor (model) axis lands on
            # ICI-adjacent chips, so the per-step weight gather and the
            # row-parallel psums ride nearest-neighbor links
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_device_mesh(shape, devices=devices)
        except Exception:
            # non-contiguous topologies / virtual CPU devices: any
            # assignment is correct, adjacency just isn't guaranteed
            arr = np.asarray(devices).reshape(shape)
        return Mesh(arr, ("data", "model"))
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _row_parallel_spec(path, leaf, tp: int) -> P:
    """Row-parallel PartitionSpec for one state leaf: kernels shard
    along their contraction (input-channel) dimension when the ``model``
    axis divides it; everything else (biases, BN scale/shift/stats,
    optimizer scalars) replicates.  Matching is by the leaf's key path,
    so Adam moments (whose subtrees mirror the param tree, mu/nu/
    ...kernel) inherit their parameter's spec automatically."""
    names = [getattr(k, "key", getattr(k, "name", None)) for k in path]
    if not names or names[-1] != "kernel":
        return P()
    shape = leaf.shape
    if leaf.ndim >= 3:
        # conv kernel [*spatial, in, out] (incl. the COCO head bank's
        # leading [heads] dim): contraction dim is -2
        dim = leaf.ndim - 2
    elif leaf.ndim == 2:
        # dense kernel [in, out]
        dim = 0
    else:
        return P()
    if shape[dim] % tp or shape[dim] < tp:
        return P()  # e.g. the stem conv's in=3, attention convs' in=1
    if shape[-1] < 8:
        # scalar-output kernels (the 1-channel prediction-head taps,
        # attention score layers) carry negligible FLOPs and their
        # partial-sum psum would cost more than the sharded compute
        # saves — replicate them
        return P()
    spec = [None] * leaf.ndim
    spec[dim] = "model"
    return P(*spec)


def state_sharding(mesh: Mesh, tree):
    """Per-leaf NamedShardings for a TrainState (or any params-shaped
    pytree): row-parallel over the ``model`` axis when the mesh has
    one, fully replicated otherwise."""
    if "model" not in mesh.axis_names:
        rep = replicated(mesh)
        return jax.tree_util.tree_map(lambda _: rep, tree)
    tp = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, _row_parallel_spec(p, x, tp)),
        tree)


def gather_spec(mesh: Mesh, params):
    """``params_gather`` argument for the train steps: a params-shaped
    pytree of replicated NamedShardings when the mesh has a ``model``
    axis (all-gather the sharded weights at step entry, ZeRO-3 style),
    else None (params are already replicated; no constraint needed)."""
    if "model" not in mesh.axis_names:
        return None
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda _: rep, params)


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
    n_dev = mesh.shape["data"]  # batch divisibility is per data axis
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
