"""Training layer: losses, schedule, config layering, supervised + RL
steps on a tiny geometry."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scanpaths_tpu.core.config import parse_opt
from scanpaths_tpu.core.grid import GridSpec
from scanpaths_tpu.models.scanpath_model import create_model
from scanpaths_tpu.train import losses, steps
from scanpaths_tpu.train.schedule import lr_multiplier, make_optimizer

MH, MW, T = 10, 12, 4
H, W = 8 * MH, 8 * MW
A = MH * MW + 1
N = 2


def test_cross_entropy_matches_manual():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 3, 5)), jnp.float32)
    gt = jax.nn.softmax(jnp.asarray(rng.normal(size=(2, 3, 5)), jnp.float32))
    mask = jnp.asarray([[1, 1, 0], [1, 0, 0]], jnp.float32)
    got = losses.cross_entropy_loss(logits, gt, mask)
    p = jax.nn.softmax(logits, -1)
    want = -(np.asarray(gt) * np.log(np.asarray(p) + 1e-7)
             * np.asarray(mask)[..., None]).sum() / np.asarray(mask).sum()
    assert float(got) == pytest.approx(float(want), rel=1e-4)


def test_log_normal_nll_positive_duration_fit():
    # NLL should be lower when mu matches log(duration)
    dur = jnp.full((2, 4), 0.4)
    mask = jnp.ones((2, 4))
    good = losses.mlp_log_normal_distribution(
        jnp.full((2, 4), float(np.log(0.4))), jnp.full((2, 4), 0.05),
        dur, mask)
    bad = losses.mlp_log_normal_distribution(
        jnp.full((2, 4), 3.0), jnp.full((2, 4), 0.05), dur, mask)
    assert float(good) < float(bad)


def test_lr_schedule_reference_shape():
    # steps_sup=10, warmup 1 epoch, rl starts at epoch 5 of 10, rl steps 4
    kw = dict(steps_sup=10, steps_rl=4, warmup_epoch=1, start_rl_epoch=5,
              epochs=10, rl_lr_initial_decay=0.5)
    assert float(lr_multiplier(0, **kw)) == pytest.approx(0.0, abs=1e-7)
    assert float(lr_multiplier(10, **kw)) == pytest.approx(1.0)
    assert float(lr_multiplier(30, **kw)) == pytest.approx(0.5)
    # the decay branch runs up to AND including sup_end (reference <=)
    assert float(lr_multiplier(50, **kw)) == pytest.approx(0.0, abs=1e-7)
    # halfway through rl: 0.5 * (1 - 10/20)
    assert float(lr_multiplier(60, **kw)) == pytest.approx(0.25)


def test_config_layering(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("batch: 8\nlr: 0.01\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"_BASE_: {base}\nlr: 0.02\n")
    args = parse_opt(["--task", "osie", "--cfg", str(child),
                      "--set_cfgs", "epoch", "3", "--lr", "0.5"])
    assert args.batch == 8          # from base yaml
    assert args.epoch == 3          # from set_cfgs
    assert args.lr == 0.5           # CLI wins over yaml
    assert args.seed == 10          # osie task default
    args2 = parse_opt(["--task", "air"])
    assert args2.seed == 0 and args2.weight_decay == 5e-5
    # bool flags must parse "False" as False (the reference's type=bool
    # foot-gun made `--center_bias False` truthy; core/config.py:121)
    args3 = parse_opt(["--task", "osie", "--center_bias", "False"])
    assert args3.center_bias is False


def _tiny_setup(task):
    import types
    model = create_model(task, seq_len=T, map_h=MH, map_w=MW,
                         embed=128, backbone_layers=(1, 1, 1, 1))
    args = types.SimpleNamespace(lr=1e-3, clip=12.5, weight_decay=1e-4,
                                 warmup_epoch=1, start_rl_epoch=5, epoch=10,
                                 rl_lr_initial_decay=0.5)
    optimizer = make_optimizer(args, steps_sup=4, steps_rl=4)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(N, H, W, 3)), jnp.float32)
    kw = {}
    if task in ("air", "coco"):
        kw["attention_maps"] = jnp.ones((N, MH, MW, 1), jnp.float32)
    if task == "coco":
        kw["task_ids"] = jnp.zeros((N,), jnp.int32)
    variables = jax.jit(lambda k: model.init(k, images, train=False, **kw))(
        jax.random.PRNGKey(0))
    state = steps.TrainState(params=variables["params"],
                             batch_stats=variables["batch_stats"],
                             opt_state=optimizer.init(variables["params"]),
                             step=jnp.int32(0))
    return model, optimizer, state, images, kw, rng


def test_supervised_step_learns():
    model, optimizer, state, images, kw, rng = _tiny_setup("osie")
    scan = np.zeros((N, T, A), np.float32)
    scan[:, :, 5] = 1.0
    batch = {
        "images": images,
        "scanpaths": jnp.asarray(scan),
        "durations": jnp.full((N, T), 0.3, jnp.float32),
        "action_masks": jnp.ones((N, T), jnp.float32),
        "duration_masks": jnp.ones((N, T), jnp.float32),
    }
    step = jax.jit(lambda s, b: steps.supervised_step(model, optimizer, s, b,
                                                      lambda_1=1.0))
    state1, m1 = step(state, batch)
    losses_seq = [float(m1["loss"])]
    st = state1
    for _ in range(4):
        st, m = step(st, batch)
        losses_seq.append(float(m["loss"]))
    assert losses_seq[-1] < losses_seq[0]
    assert int(st.step) == 5


@pytest.mark.parametrize("task", ["osie", "coco"])
def test_rl_step_runs(task):
    model, optimizer, state, images, kw, rng = _tiny_setup(task)
    grid = GridSpec(map_width=MW, map_height=MH, width=W, height=H,
                    max_length=T, min_length=1)
    cfg = steps.RLConfig(task=task, grid=grid, rl_sample_number=2,
                         max_symbols_wd=32)
    smax, glen = 3, 6
    gt_fix = np.zeros((N, smax, glen, 3), np.float32)
    gt_fix[..., 0] = rng.uniform(0, W, (N, smax, glen))
    gt_fix[..., 1] = rng.uniform(0, H, (N, smax, glen))
    gt_fix[..., 2] = rng.uniform(0.1, 0.5, (N, smax, glen))
    batch = {
        "images": images,
        "gt_fix": jnp.asarray(gt_fix),
        "gt_len": jnp.full((N, smax), glen, jnp.int32),
        "gt_mask": jnp.ones((N, smax), jnp.float32),
    }
    batch.update({k: v for k, v in kw.items()})
    if task == "coco":
        batch["tasks"] = kw["task_ids"]
    rl = jax.jit(lambda s, b, k: steps.rl_step(model, optimizer, s, b, k,
                                               cfg))
    state1, metrics = rl(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["rl_loss"]))
    assert 0.0 <= float(metrics["reward_hmean"]) <= 1.0
    # params change once the warmup lr is nonzero (step 0 lr is exactly
    # 0, like the reference LambdaLR warmup from zero)
    state2, _ = rl(state1, batch, jax.random.PRNGKey(4))
    before = np.concatenate([np.ravel(x) for x in
                             jax.tree_util.tree_leaves(state1.params)[:5]])
    after = np.concatenate([np.ravel(x) for x in
                            jax.tree_util.tree_leaves(state2.params)[:5]])
    assert not np.allclose(before, after)


def test_rl_step_improves_reward():
    """Live SCST sign test: updates on a fixed batch with a strongly
    learnable reward (every GT subject fixates ONE grid cell) must
    RAISE the mean reward and concentrate the policy on that cell.  A
    flipped advantage sign drives both DOWN, which no step-equivalence
    test catches; CONVERGENCE.json covers the full-geometry version.

    Setup notes (all measured, see git history): the duration head is
    calibrated like a supervised phase leaves it (x0.01 on drt_layer_2,
    the same device bench_train.py uses — SCST from a RAW random init
    blows sigma2 up through the duration REINFORCE term and NaNs the
    params, faithfully to the reference which never runs RL before 5
    supervised epochs); a constant learning rate replaces the two-phase
    schedule; 4 rollouts cut baseline variance enough for 48 steps to
    separate signal from sampling noise."""
    import flax
    import optax

    model, _, state0, images, kw, rng = _tiny_setup("coco")
    flat = flax.traverse_util.flatten_dict(state0.params)
    flat = {k: (v * 0.01 if "drt_layer_2" in k else v)
            for k, v in flat.items()}
    params0 = flax.traverse_util.unflatten_dict(flat)
    optimizer = optax.chain(optax.clip_by_global_norm(12.5),
                            optax.scale_by_adam(), optax.scale(-2e-3))
    state = steps.TrainState(
        params=params0, batch_stats=state0.batch_stats,
        opt_state=optimizer.init(params0), step=jnp.int32(0))
    grid = GridSpec(map_width=MW, map_height=MH, width=W, height=H,
                    max_length=T, min_length=1)
    cfg = steps.RLConfig(task="coco", grid=grid, rl_sample_number=4,
                         max_symbols_wd=32)
    smax, glen = 3, 4
    gx, gy = grid.x_granularity, grid.y_granularity
    gt_fix = np.zeros((N, smax, glen, 3), np.float32)
    gt_fix[..., 0] = 2 * gx + gx / 2
    gt_fix[..., 1] = 2 * gy + gy / 2
    gt_fix[..., 2] = 0.3
    batch = {
        "images": images,
        "gt_fix": jnp.asarray(gt_fix),
        "gt_len": jnp.full((N, smax), glen, jnp.int32),
        "gt_mask": jnp.ones((N, smax), jnp.float32),
        "attention_maps": kw["attention_maps"],
        "tasks": kw["task_ids"],
    }
    rl = jax.jit(lambda s, b, k: steps.rl_step(model, optimizer, s, b, k,
                                               cfg))
    act = 1 + 2 * MW + 2  # the GT cell's action id

    def gt_cell_prob(st):
        out = model.apply({"params": st.params,
                           "batch_stats": st.batch_stats},
                          images, train=False,
                          attention_maps=kw["attention_maps"],
                          task_ids=kw["task_ids"])
        return float(np.asarray(out["all_actions_prob"])[..., act].mean())

    p_before = gt_cell_prob(state)
    st, rewards = state, []
    for i in range(48):
        st, m = rl(st, batch, jax.random.PRNGKey(100 + i))
        rewards.append(float(m["reward_hmean"]))
    first, last = np.mean(rewards[:8]), np.mean(rewards[-8:])
    # measured trajectory: 0.50 -> 0.86 reward, cell prob 0.009 -> 1.0
    assert last > first + 0.1, (first, last)
    p_after = gt_cell_prob(st)
    assert p_after > max(5 * p_before, 0.5), (p_before, p_after)


def test_rl_step_air():
    model, optimizer, state, images, kw, rng = _tiny_setup("air")
    grid = GridSpec(map_width=MW, map_height=MH, width=W, height=H,
                    max_length=T, min_length=1)
    cfg = steps.RLConfig(task="air", grid=grid, rl_sample_number=2,
                         max_symbols_wd=32)
    smax, glen = 4, 6
    gt_fix = np.zeros((N, smax, glen, 3), np.float32)
    gt_fix[..., 0] = rng.uniform(0, W, (N, smax, glen))
    gt_fix[..., 1] = rng.uniform(0, H, (N, smax, glen))
    gt_fix[..., 2] = rng.uniform(0.1, 0.5, (N, smax, glen))
    batch = {
        "images": images,
        "attention_maps": kw["attention_maps"],
        "gt_fix": jnp.asarray(gt_fix),
        "gt_len": jnp.full((N, smax), glen, jnp.int32),
        "gt_mask": jnp.ones((N, smax), jnp.float32),
        "gt_performance": jnp.asarray([[1, 0, 1, 0], [0, 0, 1, 1]],
                                      jnp.float32),
    }
    rl = jax.jit(lambda s, b, k: steps.rl_step(model, optimizer, s, b, k,
                                               cfg))
    state1, metrics = rl(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["rl_loss"]))
    assert np.isfinite(float(metrics["reward_same_hmean"]))


def test_air_ablation_losses():
    """The AiR paper-ablation extras (reference AiR/models/loss.py:75-171,
    dead code in the reference drivers) — shape/semantics checks."""
    rng = np.random.default_rng(5)
    n, h, w, k, t = 3, 6, 8, 4, 5
    sal = jnp.asarray(rng.uniform(0.1, 1, (n, h, w)), jnp.float32)
    smap = jnp.asarray(rng.uniform(0.1, 1, (n, h, w)), jnp.float32)

    good = jnp.asarray([[1, 1], [0, 0], [1, 0]], jnp.float32)
    poor = jnp.asarray([[1, 0], [1, 1], [0, 0]], jnp.float32)
    cc_vals, paired = losses.cc_terms(sal, smap, good, poor)
    # only sample 0 has fixations in BOTH streams
    np.testing.assert_array_equal(np.asarray(paired), [1, 0, 0])
    assert float(jnp.abs(cc_vals[1])) == 0 and float(jnp.abs(cc_vals[2])) == 0
    # self-CC of a map is ~1
    self_cc, _ = losses.cc_terms(sal, sal, jnp.ones((n, 2)), jnp.ones((n, 2)))
    np.testing.assert_allclose(np.asarray(self_cc), 1.0, atol=1e-4)

    assert float(losses.cc_match_loss(jnp.ones(3), jnp.ones(3))) == 0.0
    assert float(losses.cc_match_loss(jnp.ones(3), jnp.zeros(3))) == 1.0

    ki = losses.kld_items(sal, smap)
    assert ki.shape == (n,)
    np.testing.assert_allclose(np.asarray(losses.kld_items(sal, sal)), 0.0,
                               atol=1e-5)

    qpos = jnp.asarray(rng.uniform(0, 1, (n, h, w, k)) > 0.7, jnp.float32)
    qmask = jnp.asarray([[1, 1, 0, 0], [1, 0, 0, 0], [1, 1, 1, 0]],
                        jnp.float32)
    fpos = jnp.asarray(rng.uniform(0, 1, (n, h, w, k)) > 0.7, jnp.float32)
    v = losses.kld_visual_linguistic_alignment(sal, qpos, qmask, fpos, qmask)
    assert np.isfinite(float(v))

    sal_t = jnp.asarray(rng.uniform(0.1, 1, (n, t, h, w)), jnp.float32)
    dmask = jnp.asarray(rng.uniform(0, 1, (n, t)) > 0.3, jnp.float32)
    dmask = dmask.at[:, 0].set(1.0)  # every sample has >=1 valid step
    q = losses.kld_question_aligment(sal_t, qpos, qmask, dmask)
    assert np.isfinite(float(q)) and float(q) >= 0
    # perfectly matching step maps should beat random ones
    obj0 = qpos[..., 0] / (qpos[..., 0].sum((1, 2), keepdims=True) + 1e-7)
    sal_match = jnp.log(jnp.tile(obj0[:, None], (1, t, 1, 1)) + 1e-7)
    q_match = losses.kld_question_aligment(
        sal_match, qpos, jnp.ones((n, k)).at[:, 1:].set(0), dmask)
    assert float(q_match) < float(q)


def test_supervised_step_bf16():
    """--half_precision path: bf16 compute, f32 params, finite loss and
    updates."""
    import types

    model = create_model("osie", seq_len=T, map_h=MH, map_w=MW,
                         embed=128, backbone_layers=(1, 1, 1, 1),
                         dtype=jnp.bfloat16)
    args = types.SimpleNamespace(lr=1e-3, clip=12.5, weight_decay=1e-4,
                                 warmup_epoch=1, start_rl_epoch=5, epoch=10,
                                 rl_lr_initial_decay=0.5)
    optimizer = make_optimizer(args, steps_sup=4, steps_rl=4)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(N, H, W, 3)), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, images, train=False))(
        jax.random.PRNGKey(0))
    assert all(x.dtype == jnp.float32 for x in
               jax.tree_util.tree_leaves(variables["params"]))
    state = steps.TrainState(params=variables["params"],
                             batch_stats=variables["batch_stats"],
                             opt_state=optimizer.init(variables["params"]),
                             step=jnp.int32(0))
    scan = np.zeros((N, T, A), np.float32)
    scan[:, :, 5] = 1.0
    batch = {"images": images, "scanpaths": jnp.asarray(scan),
             "durations": jnp.full((N, T), 0.3, jnp.float32),
             "action_masks": jnp.ones((N, T), jnp.float32),
             "duration_masks": jnp.ones((N, T), jnp.float32)}
    step = jax.jit(lambda s, b: steps.supervised_step(model, optimizer, s, b,
                                                      lambda_1=1.0))
    st, m = step(state, batch)
    st, m2 = step(st, batch)
    assert np.isfinite(float(m["loss"])) and np.isfinite(float(m2["loss"]))
    assert all(x.dtype == jnp.float32 for x in
               jax.tree_util.tree_leaves(st.params))


def test_profiler_hook(tmp_path):
    """--profile_dir captures a jax.profiler trace of steps 3..8
    (SURVEY §5 tracing note)."""
    import os
    import types

    from scanpaths_tpu.train.trainer import Trainer

    stub = types.SimpleNamespace(
        args=types.SimpleNamespace(profile_dir=str(tmp_path / "prof")),
        logger=types.SimpleNamespace(info=lambda *a, **k: None),
        _profiling=False)
    for it in range(1, 10):
        Trainer._maybe_profile(stub, it)
        # run a tiny computation inside the traced window
        jnp.ones((4,)).sum().block_until_ready()
    assert not stub._profiling          # stopped at iteration >= 8
    trace_files = []
    for root, _, files in os.walk(tmp_path / "prof"):
        trace_files.extend(files)
    assert trace_files, "no trace artifacts written"
