"""Manual-collective row-parallel training: ``shard_map`` supervised
and SCST steps with explicit psums, bypassing the XLA partitioners
entirely.

Why this exists: both GSPMD and Shardy miscompile ``value_and_grad``
of the decode scan when the ConvLSTM gate kernels are contraction-
sharded on a 2-D mesh (reproducer: tools/tp_repro.py — wrong losses
and ~2x/~4x gate-kernel gradients).  The default ``--model_parallel``
training path therefore all-gathers params at step entry (ZeRO-3,
train/mesh.py).  This module proves TRUE tensor-parallel training is
possible anyway: the collectives are written by hand inside
``shard_map``, so no partitioner ever sees the scan.

Sharding layout (Megatron-style row parallelism):

* the two heavy decode kernels — the h-gate conv
  (``lstm/gates_h/kernel`` [3, 3, C, 4C], ~76% of model FLOPs at T=16)
  and the hoisted x-gate conv (``xgates/gates_x/kernel``, ~5%) — are
  sliced along their contraction dimension over the ``model`` axis;
* everything else (backbone, attentions, heads) stays replicated and
  is reduced over ``data`` only — the same data-parallel semantics as
  the pjit path.

Inside the step each sliced conv computes its partial contraction and
reduces with one psum over ``model``; gradient correctness comes from
the f/g boundary pair ``components.tp_enter`` / ``tp_exit`` (identity-
fwd/psum-bwd and psum-fwd/identity-bwd respectively), which keeps
every tensor OUTSIDE the TP block replicated with replicated
cotangents — so replicated parameters receive full, identical
gradients on every model-axis device with no per-leaf bookkeeping.
BatchNorm statistics are computed over the GLOBAL batch via flax's
``axis_name`` (matching the pjit path's GSPMD behaviour), and the loss
normalizations (mask sums) are psum'd over ``data`` so the value
equals the full-batch loss exactly.

The optimizer update runs OUTSIDE the shard_map under plain jit: it is
elementwise plus one global-norm reduction — nothing scan-coupled, so
the partitioners handle it correctly (and the sharded slices' norm
contributions combine exactly like the replicated program's, because
each device owns a disjoint slice).

The SCST step (:func:`make_tp_rl_step`) runs the whole in-graph
rollout -> ScanMatch-reward -> REINFORCE pipeline (steps.rl_loss)
inside the same shard_map: every reward kernel is per-sample, so the
batch axis shards cleanly; only the model fwd/bwd needs the f/g
boundaries.  Each data shard folds its ``axis_index("data")`` into the
sampling key (model-axis devices share the key, so their replicated
activations draw IDENTICAL rollouts); the per-sample estimator
(per-sample rollout baseline, summed loss) makes the sharded program
gradient-equivalent to running ``steps.rl_loss`` per batch chunk and
summing — which is exactly what tests/test_tp_shardmap.py pins.
Scalar metrics are psum'd (the loss) or shard-averaged (the rest;
exact for unmasked means over equal shards, and the same per-batch
flavor the reference logs).

Equivalence vs the replicated ``steps.supervised_step`` is pinned by
tests/test_tp_shardmap.py, and the multi-chip dryrun executes both
steps on a (data x model) mesh (__graft_entry__.py).  Reachable from
the CLI via ``--model_parallel T --tp_impl shardmap`` (train/
trainer.py); the gather-at-entry path remains the ``--model_parallel``
default until the shard_map path is profiled on real multi-chip
hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exports shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from . import losses
from .steps import TrainState, _model_inputs

TP_SHARDED = (("lstm", "gates_h", "kernel"), ("xgates", "gates_x", "kernel"))


def _leaf_names(path) -> tuple:
    return tuple(getattr(k, "key", getattr(k, "name", None)) for k in path)


def _tp_spec(path, leaf, tp: int) -> P:
    """PartitionSpec for one state leaf: the two heavy decode kernels
    slice along dim 2 (their contraction dim); everything else
    replicates.  Adam moments inherit by key path (mu/nu subtrees
    mirror the param tree)."""
    names = _leaf_names(path)
    for pat in TP_SHARDED:
        if names[-len(pat):] == pat:
            if getattr(leaf, "ndim", 0) == 4 and leaf.shape[2] % tp == 0:
                return P(None, None, "model", None)
    return P()


def tp_state_specs(mesh: Mesh, state) -> TrainState:
    tp = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _tp_spec(p, x, tp), state)


def tp_state_sharding(mesh: Mesh, state):
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, _tp_spec(p, x, mesh.shape["model"])),
        state)


def _check_tp_model(model, mesh: Mesh):
    assert model.tp_axis == "model" and model.bn_axis == "data" \
        and model.tp_shards == mesh.shape["model"], (
        model.tp_axis, model.bn_axis, model.tp_shards)


def _apply_update(optimizer, state: TrainState, grads, new_bs):
    """The optimizer update shared by both shard_map steps — runs
    OUTSIDE the shard_map under plain jit (elementwise + one global-
    norm reduction; nothing scan-coupled, so the partitioners handle
    it, and the sharded slices' norm contributions combine exactly
    like the replicated program's since each device owns a disjoint
    slice)."""
    updates, new_opt = optimizer.update(grads, state.opt_state,
                                        state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    return TrainState(params=new_params, batch_stats=new_bs,
                      opt_state=new_opt, step=state.step + 1)


def make_tp_supervised_step(model, optimizer, mesh: Mesh, state: TrainState,
                            lambda_1: float, batch_keys=None):
    """Build the jitted shard_map row-parallel supervised step.

    ``model`` must be constructed with ``tp_axis="model"`` and
    ``bn_axis="data"``.  ``state`` is a template for spec derivation;
    ``batch_keys`` optionally pins the batch dict keys (all leaves
    shard on the batch axis; None accepts any batch dict via a
    tree-prefix spec).  Returns ``step(state, batch) -> (state,
    metrics)`` with in/out shardings pinned to the TP layout."""
    _check_tp_model(model, mesh)
    state_specs = tp_state_specs(mesh, state)
    state_sh = tp_state_sharding(mesh, state)
    batch_specs = P("data") if batch_keys is None \
        else {k: P("data") for k in batch_keys}
    grads_specs = state_specs.params

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(state_specs.params, state_specs.batch_stats, batch_specs),
        out_specs=(grads_specs, state_specs.batch_stats, P()),
        check_vma=False)
    def local_grads(params, batch_stats, batch):
        def loss_fn(params):
            kw = _model_inputs(model.task, batch)
            if model.task == "air":
                kw["performances"] = batch["performances"]
            out, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["images"], train=True, mutable=["batch_stats"], **kw)
            logits = out["actions"] if model.task != "air" \
                else out["all_actions_prob"]
            # global-batch loss: the local normalized losses recombine
            # through psum'd numerators/denominators so the value (and
            # therefore the gradient) equals the full-batch program's
            la_l = losses.cross_entropy_loss(
                logits, batch["scanpaths"], batch["action_masks"])
            ld_l = losses.mlp_log_normal_distribution(
                out["log_normal_mu"], out["log_normal_sigma2"],
                batch["durations"], batch["duration_masks"])
            den_a = batch["action_masks"].sum()
            den_d = batch["duration_masks"].sum()
            la = jax.lax.psum(la_l * den_a, "data") \
                / jax.lax.psum(den_a, "data")
            ld = jax.lax.psum(ld_l * den_d, "data") \
                / jax.lax.psum(den_d, "data")
            return la + lambda_1 * ld, (la, ld, updates["batch_stats"])

        (loss, (la, ld, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        # sum the batch shards' gradient contributions; along the model
        # axis grads are already final (replicated leaves identical by
        # the f/g boundaries, sharded leaves disjoint slices)
        grads = jax.lax.psum(grads, "data")
        return grads, new_bs, {"loss": loss, "loss_actions": la,
                               "loss_duration": ld}

    def step(state: TrainState, batch: dict):
        grads, new_bs, metrics = local_grads(state.params,
                                             state.batch_stats, batch)
        return _apply_update(optimizer, state, grads, new_bs), metrics

    batch_sh = None if batch_keys is None \
        else {k: NamedSharding(mesh, P("data")) for k in batch_keys}
    return jax.jit(step, donate_argnums=(0,),
                   in_shardings=(state_sh, batch_sh),
                   out_shardings=(state_sh, None)), state_sh


def make_tp_rl_step(model, optimizer, mesh: Mesh, state: TrainState, cfg):
    """Build the jitted shard_map row-parallel SCST step.

    The complete in-graph SCST pipeline (``steps.rl_loss``: rollout
    sampling, ScanMatch/MultiMatch/SED/STDE reward grids, per-sample
    baselines, REINFORCE sums) runs per data shard — every reward
    kernel is per-sample, so only the model fwd/bwd inside needs the
    f/g collective boundaries.  Each data shard folds its axis index
    into the sampling key; devices along ``model`` share the key, so
    their replicated activations draw identical rollouts and the
    hand-psum'd gradients stay consistent.  Gradient-equivalent to
    running ``rl_loss`` on each batch chunk with the folded key and
    summing (the pinned reference program in
    tests/test_tp_shardmap.py); the per-sample estimator makes that
    chunked program itself estimator-identical to the replicated one —
    only the PRNG stream differs.

    Returns ``step(state, batch, key) -> (state, metrics)``."""
    from . import steps as steps_mod

    _check_tp_model(model, mesh)
    state_specs = tp_state_specs(mesh, state)
    state_sh = tp_state_sharding(mesh, state)
    n_data = mesh.shape["data"]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(state_specs.params, state_specs.batch_stats,
                  P("data"), P()),
        out_specs=(state_specs.params, P()),
        check_vma=False)
    def local_grads(params, batch_stats, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index("data"))

        def loss_fn(params):
            return steps_mod.rl_loss(model, params, batch_stats, batch,
                                     key, cfg)

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        grads = jax.lax.psum(grads, "data")
        # the loss is a SUM over samples -> psum; the other scalars are
        # per-batch means -> shard-average (shards are equal-sized)
        metrics = {
            k: jax.lax.psum(v, "data") / (1 if k == "rl_loss" else n_data)
            for k, v in metrics.items()}
        return grads, metrics

    def step(state: TrainState, batch: dict, key):
        grads, metrics = local_grads(state.params, state.batch_stats,
                                     batch, key)
        return _apply_update(optimizer, state, grads,
                             state.batch_stats), metrics

    return jax.jit(step, donate_argnums=(0,),
                   in_shardings=(state_sh, None, None),
                   out_shardings=(state_sh, None))
