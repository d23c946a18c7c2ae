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


@pytest.mark.slow
def test_tp_shardmap_rl_step_matches_chunked():
    """The shard_map SCST step folds each data shard's axis index into
    the sampling key, so its pinned reference program is: run
    ``steps.rl_loss`` on each batch CHUNK with the folded key, sum the
    losses, differentiate, apply the optimizer.  (The per-sample
    estimator — per-sample rollout baseline, summed loss — makes that
    chunked program gradient-identical to the replicated one; only the
    PRNG stream differs.)"""
    import bench
    from scanpaths_tpu.core.grid import GridSpec
    from scanpaths_tpu.train.tp_step import make_tp_rl_step

    rng = np.random.default_rng(1)
    smax, glen = 3, 4
    gt_fix = np.zeros((N, smax, glen, 3), np.float32)
    gt_fix[..., 0] = rng.uniform(0, W, (N, smax, glen))
    gt_fix[..., 1] = rng.uniform(0, H, (N, smax, glen))
    gt_fix[..., 2] = rng.uniform(0.1, 0.5, (N, smax, glen))
    batch = {
        "images": rng.normal(size=(N, H, W, 3)).astype(np.float32),
        "gt_fix": gt_fix,
        "gt_len": np.full((N, smax), glen, np.int32),
        "gt_mask": np.ones((N, smax), np.float32),
    }
    grid = GridSpec(map_width=12, map_height=10, width=W, height=H,
                    max_length=3, min_length=1)
    cfg = steps.RLConfig(task="osie", grid=grid, rl_sample_number=2,
                         max_symbols_wd=64, max_symbols_wod=8)

    plain = create_model("osie", **KW)
    variables = plain.init(jax.random.PRNGKey(0),
                           jnp.asarray(batch["images"]), train=False)
    # calibrated duration head: finite rollout durations -> nonzero
    # advantages, so the comparison exercises real gradients
    variables = bench.calibrate_duration_head(variables)
    optimizer = make_optimizer(_args(), steps_sup=100, steps_rl=100)
    state0 = steps.TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]), step=jnp.int32(0))

    mesh = make_mesh(4, model_parallel=2)
    d = mesh.shape["data"]
    key = jax.random.PRNGKey(7)

    # ---- chunked reference program ----
    def chunk_loss(params):
        total, metrics = 0.0, []
        for i in range(d):
            sub = {k: jnp.asarray(v[i * N // d:(i + 1) * N // d])
                   for k, v in batch.items()}
            loss, m = steps.rl_loss(plain, params, state0.batch_stats,
                                    sub, jax.random.fold_in(key, i), cfg)
            total = total + loss
            metrics.append(m)
        return total, metrics

    (ref_loss, ref_metrics), ref_grads = jax.jit(
        lambda p: jax.value_and_grad(chunk_loss, has_aux=True)(p))(
        state0.params)
    updates, _ = optimizer.update(ref_grads, state0.opt_state,
                                  state0.params)
    ref_params = jax.tree.map(lambda p, u: p + u, state0.params, updates)

    # ---- shard_map row-parallel step ----
    tp_model = create_model("osie", tp_axis="model", bn_axis="data",
                            tp_shards=2, **KW)
    from scanpaths_tpu.train.tp_step import tp_state_sharding
    rl_step = make_tp_rl_step(tp_model, optimizer, mesh, state0, cfg)
    tp_state = jax.device_put(state0, tp_state_sharding(mesh, state0))
    tp_state, tp_m = rl_step(tp_state, batch, key)

    a, b = float(ref_loss), float(tp_m["rl_loss"])
    assert abs(a - b) <= 5e-5 * max(abs(a), 1.0), (a, b)
    # a rollout actually scored (the estimator isn't trivially zero)
    assert float(tp_m["rollout_ok_frac"]) > 0.0
    # shard-averaged reporting equals the chunk means' average
    ref_rh = float(np.mean([float(m["reward_hmean"])
                            for m in ref_metrics]))
    assert abs(ref_rh - float(tp_m["reward_hmean"])) <= 1e-5

    worst = 0.0
    for (kp, vr), (kt, vt) in zip(
            jax.tree_util.tree_leaves_with_path(ref_params),
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(tp_state.params))):
        assert kp == kt
        vr, vt = np.asarray(vr), np.asarray(vt)
        d_ = float(np.abs(vr - vt).max())
        m_ = float(np.abs(vr).max())
        worst = max(worst, d_)
        # same floor rationale as the supervised test above
        assert d_ <= 5e-5 + 1e-4 * m_, (jax.tree_util.keystr(kp), d_, m_)


@pytest.mark.slow
def test_cli_shardmap_both_phases(tmp_path):
    """--model_parallel 2 --tp_impl shardmap is a USER path: drive the
    real CLI through a supervised and an RL epoch on a 4x2
    (data x model) mesh and check the run artifacts."""
    import json
    import os
    from os.path import join

    from scanpaths_tpu.cli import train as cli_train
    from tools.make_synth_data import make_osie

    root = str(tmp_path / "data")
    make_osie(join(root, "osie"), np.random.default_rng(0))
    log_root = str(tmp_path / "logs")
    cli_train.main([
        "--task", "osie",
        "--img_dir", join(root, "osie", "stimuli"),
        "--fix_dir", join(root, "osie", "fixations"),
        "--log_root", log_root,
        "--height", "40", "--width", "48",
        "--map_height", "5", "--map_width", "6",
        "--max_length", "4",
        "--embed", "128", "--backbone_layers", "1,1,1,1",
        "--batch", "16", "--rl_sample_number", "2",
        "--eval_repeat_num", "1",
        "--warmup_epoch", "1", "--start_rl_epoch", "1",
        "--epoch", "2",
        "--model_parallel", "2", "--tp_impl", "shardmap",
    ])
    runs = [r for r in os.listdir(log_root)
            if not r.endswith("_supervised_save")]
    (run,) = runs
    with open(join(log_root, run, "scalars.jsonl")) as f:
        tags = {json.loads(line)["tag"] for line in f}
    # both phases ran through the shard_map steps
    assert "loss/loss" in tags and "rl_loss" in tags
    assert "reward_hmean" in tags
    with open(join(log_root, run, "hparams.json")) as f:
        hp = json.load(f)
    assert hp["tp_impl"] == "shardmap" and hp["model_parallel"] == 2


@pytest.mark.slow
@pytest.mark.parametrize("task", ["air", "coco"])
def test_task_plugins_run_under_shardmap_tp(task):
    """The AiR dual-stream model (factorized SignalGates with
    num_signals=2, per-sample stream select, same/diff-group rewards)
    and the COCO multihead bank (gather+vmap fused-head dispatch) must
    execute under BOTH shard_map TP steps — the CLI exposes
    --task {air,coco} --tp_impl shardmap, so a latent break here would
    be a user-facing bug the osie-only equivalence tests cannot
    catch."""
    from scanpaths_tpu.core.grid import GridSpec
    from scanpaths_tpu.train.tp_step import (make_tp_rl_step,
                                             make_tp_supervised_step)

    rng = np.random.default_rng(0)
    plain = create_model(task, **KW)
    imgs = jnp.asarray(rng.normal(size=(N, H, W, 3)), jnp.float32)
    att = jnp.asarray(rng.uniform(0, 1, (N, 10, 12, 1)), jnp.float32)
    tids = jnp.asarray(rng.integers(0, 18, (N,)), jnp.int32)
    init_kw = {"attention_maps": att}
    if task == "coco":
        init_kw["task_ids"] = tids
    variables = plain.init(jax.random.PRNGKey(0), imgs, train=False,
                           **init_kw)
    optimizer = make_optimizer(_args(), steps_sup=10, steps_rl=10)
    state = steps.TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]), step=jnp.int32(0))
    mesh = make_mesh(4, model_parallel=2)
    tp_model = create_model(task, tp_axis="model", bn_axis="data",
                            tp_shards=2, **KW)

    sup_batch = dict(_batch(rng), images=imgs, attention_maps=att)
    if task == "air":
        sup_batch["performances"] = jnp.asarray(
            rng.integers(0, 2, (N,)), jnp.float32)
    else:
        sup_batch["tasks"] = tids
    step, sh = make_tp_supervised_step(tp_model, optimizer, mesh, state,
                                       1.0)
    st = jax.device_put(state, sh)
    st, m = step(st, sup_batch)
    assert np.isfinite(float(m["loss"]))

    grid = GridSpec(map_width=12, map_height=10, width=W, height=H,
                    max_length=3, min_length=1)
    cfg = steps.RLConfig(task=task, grid=grid, rl_sample_number=2,
                         max_symbols_wd=64, max_symbols_wod=8)
    smax, glen = 3, 4
    gt = np.zeros((N, smax, glen, 3), np.float32)
    gt[..., 0] = rng.uniform(0, W, (N, smax, glen))
    gt[..., 1] = rng.uniform(0, H, (N, smax, glen))
    gt[..., 2] = rng.uniform(0.1, 0.5, (N, smax, glen))
    rl_batch = {
        "images": imgs, "attention_maps": att,
        "gt_fix": jnp.asarray(gt),
        "gt_len": jnp.full((N, smax), glen, jnp.int32),
        "gt_mask": jnp.ones((N, smax), jnp.float32),
    }
    if task == "air":
        rl_batch["gt_performance"] = jnp.asarray(
            rng.integers(0, 2, (N, smax)), jnp.float32)
    else:
        rl_batch["tasks"] = tids
    rl = make_tp_rl_step(tp_model, optimizer, mesh, state, cfg)
    st, rm = rl(st, rl_batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(rm["rl_loss"]))
    key = "reward_same_hmean" if task == "air" else "reward_hmean"
    assert np.isfinite(float(rm[key]))


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
