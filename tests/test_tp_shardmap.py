"""The manual row-parallel shard_map training step (train/tp_step.py)
must be step-equivalent to the replicated ``steps.supervised_step`` —
proving true tensor-parallel TRAINING is possible despite the
partitioner miscompile that tools/tp_repro.py reproduces (the shard_map
path writes its collectives by hand, so no partitioner ever sees the
decode scan)."""

import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scanpaths_tpu.models.scanpath_model import create_model
from scanpaths_tpu.train import steps
from scanpaths_tpu.train.mesh import make_mesh
from scanpaths_tpu.train.schedule import make_optimizer
from scanpaths_tpu.train.tp_step import make_tp_supervised_step

KW = dict(seq_len=3, map_h=10, map_w=12, embed=16,
          backbone_layers=(1, 1, 1, 1))
N, H, W = 8, 80, 96
A = 10 * 12 + 1


def _args():
    return types.SimpleNamespace(lr=1e-3, clip=12.5, weight_decay=5e-4,
                                 warmup_epoch=1, start_rl_epoch=5, epoch=10,
                                 rl_lr_initial_decay=0.5)


def _batch(rng):
    return {
        "images": rng.normal(size=(N, H, W, 3)).astype(np.float32),
        "scanpaths": np.eye(A, dtype=np.float32)[
            rng.integers(0, A, (N, 3))],
        "durations": rng.uniform(0.1, 0.6, (N, 3)).astype(np.float32),
        "action_masks": np.ones((N, 3), np.float32),
        "duration_masks": np.ones((N, 3), np.float32),
    }


@pytest.mark.slow
def test_tp_shardmap_step_matches_replicated():
    rng = np.random.default_rng(0)
    batch = _batch(rng)

    plain = create_model("osie", **KW)
    variables = plain.init(jax.random.PRNGKey(0),
                           jnp.asarray(batch["images"]), train=False)
    optimizer = make_optimizer(_args(), steps_sup=100, steps_rl=100)
    state0 = steps.TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]), step=jnp.int32(0))

    # ---- replicated reference: two steps on the full batch ----
    ref_step = jax.jit(lambda s, b: steps.supervised_step(
        plain, optimizer, s, b, lambda_1=1.0))
    ref_state, ref_m1 = ref_step(state0, batch)
    ref_state, ref_m2 = ref_step(ref_state, batch)

    # ---- shard_map row-parallel: 2 data x 2 model ----
    mesh = make_mesh(4, model_parallel=2)
    tp_model = create_model("osie", tp_axis="model", bn_axis="data",
                            tp_shards=2, **KW)
    tp_step, state_sh = make_tp_supervised_step(
        tp_model, optimizer, mesh, state0, lambda_1=1.0,
        batch_keys=tuple(batch))
    tp_state = jax.device_put(state0, state_sh)
    tp_state, tp_m1 = tp_step(tp_state, batch)
    tp_state, tp_m2 = tp_step(tp_state, batch)

    # losses equal on both steps (the second one exercises the updated
    # params, so a gradient error would compound and show here)
    for ref_m, tp_m in ((ref_m1, tp_m1), (ref_m2, tp_m2)):
        for k in ("loss", "loss_actions", "loss_duration"):
            a, b = float(ref_m[k]), float(tp_m[k])
            assert abs(a - b) <= 2e-5 * max(abs(a), 1.0), (k, a, b)

    # updated parameters equal leaf-for-leaf (sharded leaves reassemble
    # via device_get of the addressable shards -> jnp array)
    ref_flat = jax.tree_util.tree_leaves_with_path(ref_state.params)
    tp_flat = jax.tree_util.tree_leaves_with_path(
        jax.device_get(tp_state.params))
    worst = 0.0
    for (kp, vr), (kt, vt) in zip(ref_flat, tp_flat):
        assert kp == kt
        vr, vt = np.asarray(vr), np.asarray(vt)
        assert vr.shape == vt.shape, (kp, vr.shape, vt.shape)
        d = float(np.abs(vr - vt).max())
        m = float(np.abs(vr).max())
        worst = max(worst, d / max(m, 1e-6))
        # absolute floor 5e-5: Adam normalizes a gradient to ~lr
        # regardless of its magnitude, so the cancellation-prone
        # near-zero BN-bias grads (see tests/test_remat.py docstring)
        # can flip the update direction between float associations —
        # bounded by a few x lr x schedule (~2e-5 measured).  A REAL
        # gradient error on any loaded leaf diverges by ~lr=1e-3 per
        # step, 20x this floor; the step-2 losses above compound any
        # such error too.
        assert d <= 5e-5 + 1e-4 * m, (jax.tree_util.keystr(kp), d, m)
    # batch stats too (global-batch BN via axis_name must match GSPMD)
    for (kp, vr), (_, vt) in zip(
            jax.tree_util.tree_leaves_with_path(ref_state.batch_stats),
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(tp_state.batch_stats))):
        d = float(np.abs(np.asarray(vr) - np.asarray(vt)).max())
        m = float(np.abs(np.asarray(vr)).max())
        assert d <= 1e-5 + 1e-4 * m, (jax.tree_util.keystr(kp), d, m)


def test_tp_specs_shard_only_decode_kernels():
    from jax.sharding import PartitionSpec as P

    from scanpaths_tpu.train.tp_step import tp_state_specs

    plain = create_model("osie", **KW)
    images = jnp.zeros((2, H, W, 3), jnp.float32)
    variables = plain.init(jax.random.PRNGKey(0), images, train=False)
    optimizer = make_optimizer(_args(), steps_sup=10, steps_rl=10)
    state = steps.TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]), step=jnp.int32(0))
    mesh = make_mesh(4, model_parallel=2)
    specs = tp_state_specs(mesh, state)
    sharded = [
        jax.tree_util.keystr(p)
        for p, s in jax.tree_util.tree_leaves_with_path(specs)
        if s != P()]
    # params + the two Adam moment mirrors for each of the two kernels
    assert len(sharded) == 6, sharded
    assert all("gates_h" in p or "gates_x" in p for p in sharded), sharded
    assert all(p.endswith("['kernel']") for p in sharded), sharded
