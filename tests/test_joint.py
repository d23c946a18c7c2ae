"""Joint multi-task training (BASELINE.json config 5): one shared-trunk
model trained round-robin over OSIE + AiR + COCO, through the real CLI."""

import json
import os
from os.path import exists, join

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from tools.make_synth_data import make_all
    root = tmp_path_factory.mktemp("joint_data")
    # minimal sizes: the joint drive costs 3 tasks x (steps + host
    # validation) on a 1-core box
    make_all(str(root),
             osie=dict(n_images=3, n_subjects=3),
             air=dict(n_questions=3, n_subjects=3),
             coco=dict(n_images=3, n_subjects=3))
    return str(root)


def test_joint_model_shares_backbone():
    import jax.numpy as jnp

    from scanpaths_tpu.models.scanpath_model import JointScanpathModel

    model = JointScanpathModel(seq_len=3, map_h=5, map_w=6, embed=128,
                               backbone_layers=(1, 1, 1, 1))
    imgs = jnp.zeros((2, 40, 48, 3), jnp.float32)
    att = jnp.zeros((2, 5, 6, 1), jnp.float32)
    tids = jnp.zeros((2,), jnp.int32)
    variables = jax.jit(lambda k: model.init(k, imgs, att, tids,
                                             method="init_all"))(
        jax.random.PRNGKey(0))
    top = set(variables["params"])
    # exactly one shared trunk + three task heads
    assert "backbone" in top
    assert {"osie", "air", "coco"} <= top
    # the task heads did NOT create their own backbones
    for t in ("osie", "air", "coco"):
        assert "backbone" not in variables["params"][t]

    # every task's forward runs against the shared variables
    out_osie = model.apply(variables, imgs, task="osie")
    assert out_osie["all_actions_prob"].shape == (2, 3, 31)
    out_air = model.apply(variables, imgs, task="air", attention_maps=att)
    assert "good_all_actions_prob" in out_air
    out_coco = model.apply(variables, imgs, task="coco",
                           attention_maps=att, task_ids=tids)
    assert out_coco["all_actions_prob"].shape == (2, 3, 31)


def test_joint_gradients_touch_shared_trunk_only_own_head():
    import jax.numpy as jnp

    from scanpaths_tpu.models.scanpath_model import (JointScanpathModel,
                                                     TaskView)
    from scanpaths_tpu.train import losses

    model = JointScanpathModel(seq_len=3, map_h=5, map_w=6, embed=128,
                               backbone_layers=(1, 1, 1, 1))
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 40, 48, 3)),
                       jnp.float32)
    att = jnp.zeros((2, 5, 6, 1), jnp.float32)
    tids = jnp.zeros((2,), jnp.int32)
    variables = jax.jit(lambda k: model.init(k, imgs, att, tids,
                                             method="init_all"))(
        jax.random.PRNGKey(0))
    view = TaskView(model, "osie")

    def loss_fn(params):
        out, _ = view.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            imgs, train=True, mutable=["batch_stats"])
        return (out["actions"] ** 2).mean()

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])

    def total(tree):
        return sum(float(np.abs(np.asarray(x)).sum())
                   for x in jax.tree_util.tree_leaves(tree))

    assert total(grads["backbone"]) > 0      # shared trunk learns
    assert total(grads["osie"]) > 0          # own head learns
    assert total(grads["air"]) == 0          # other heads untouched
    assert total(grads["coco"]) == 0


def test_joint_cli_end_to_end(synth_root, tmp_path):
    from scanpaths_tpu.cli import train as cli_train

    log_root = str(tmp_path / "logs")
    cli_train.main([
        "--task", "joint", "--joint_data_root", synth_root,
        "--log_root", log_root,
        "--height", "40", "--width", "48",
        "--map_height", "5", "--map_width", "6",
        "--max_length", "4",
        "--embed", "128", "--backbone_layers", "1,1,1,1",
        "--batch", "8", "--rl_sample_number", "2",
        "--eval_repeat_num", "1",
        "--warmup_epoch", "1", "--start_rl_epoch", "1", "--epoch", "2",
        "--mesh_size", "1",
    ])
    runs = [d for d in os.listdir(log_root)
            if not d.endswith("_supervised_save")]
    assert len(runs) == 1
    log_dir = join(log_root, runs[0])
    assert exists(join(log_dir, "checkpoints", "checkpoint_best.msgpack"))
    assert exists(log_dir + "_supervised_save")

    with open(join(log_dir, "history_record.json")) as f:
        rec = json.load(f)
    # sup: 9 records per task // batch 8 = 1 step x3; rl (batch 8//4=2):
    # 3 groups // 2 = 1 step x3; 0-indexed from the reference's -1
    assert rec["epoch"] == 1
    assert rec["iteration"] == 5
    assert rec["best_metric"] > 0

    tags = set()
    with open(join(log_dir, "scalars.jsonl")) as f:
        for line in f:
            tags.add(json.loads(line)["tag"])
    for t in ("osie", "air", "coco"):
        assert f"{t}/loss/loss" in tags
        assert f"{t}/rl_loss" in tags
        assert any(tag.startswith(f"{t}/metrics/") for tag in tags)
    assert "osie/metrics_for_reward/vector" in tags
    assert "current metric" in tags

    # a joint checkpoint is evaluated per task: the Evaluator detects
    # task=joint in the run's hparams.json and loads the osie head
    from scanpaths_tpu.cli import test as cli_test
    metrics = cli_test.main([
        "--task", "osie",
        "--img_dir", join(synth_root, "osie", "stimuli"),
        "--fix_dir", join(synth_root, "osie", "fixations"),
        "--evaluation_dir", log_dir,
        "--height", "40", "--width", "48",
        "--map_height", "5", "--map_width", "6",
        "--max_length", "4",
        "--embed", "128", "--backbone_layers", "1,1,1,1",
        "--batch", "8", "--eval_repeat_num", "1", "--mesh_size", "1",
    ])
    assert set(metrics["ScanMatch"]) == {"w/o duration", "with duration"}
    assert exists(join(log_dir, "test_predicts.json"))


def test_joint_weight_decay_semantics_pinned():
    """Pins the deliberate joint-training choice documented in
    train/joint.py: with weight_decay > 0, ONE task's supervised step
    updates the OTHER heads too (decay-only, grad = wd * p after the
    zero task gradient), so "joint minus two tasks" differs from
    single-task training exactly by that decay; with weight_decay = 0
    the other heads are bit-unchanged."""
    import types

    import jax.numpy as jnp

    from scanpaths_tpu.models.scanpath_model import (JointScanpathModel,
                                                     TaskView)
    from scanpaths_tpu.train import steps
    from scanpaths_tpu.train.schedule import make_optimizer

    rng = np.random.default_rng(0)
    model = JointScanpathModel(seq_len=3, map_h=5, map_w=6, embed=128,
                               backbone_layers=(1, 1, 1, 1))
    imgs = jnp.asarray(rng.normal(size=(2, 40, 48, 3)), jnp.float32)
    att = jnp.zeros((2, 5, 6, 1), jnp.float32)
    tids = jnp.zeros((2,), jnp.int32)
    variables = jax.jit(lambda k: model.init(k, imgs, att, tids,
                                             method="init_all"))(
        jax.random.PRNGKey(0))
    a = 5 * 6 + 1
    scan = np.zeros((2, 3, a), np.float32)
    scan[:, :, 1] = 1.0
    batch = {"images": imgs, "scanpaths": jnp.asarray(scan),
             "durations": jnp.full((2, 3), 0.3, jnp.float32),
             "action_masks": jnp.ones((2, 3), jnp.float32),
             "duration_masks": jnp.ones((2, 3), jnp.float32)}
    view = TaskView(model, "osie")

    def step_with(wd):
        # two steps: the reference warmup schedule gives LR exactly 0
        # at optimizer count 0, so a 1-step test would mask every update
        args = types.SimpleNamespace(
            lr=1e-3, clip=12.5, weight_decay=wd, warmup_epoch=1,
            start_rl_epoch=5, epoch=10, rl_lr_initial_decay=0.5)
        opt = make_optimizer(args, steps_sup=10, steps_rl=10)
        state = steps.TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=opt.init(variables["params"]), step=jnp.int32(0))
        step = jax.jit(lambda s, b: steps.supervised_step(
            view, opt, s, b, lambda_1=1.0))
        state, _ = step(state, batch)
        state, _ = step(state, batch)
        return state.params

    def flat(tree):
        return np.concatenate([np.asarray(x).ravel()
                               for x in jax.tree_util.tree_leaves(tree)])

    p0 = variables["params"]
    p_wd = step_with(5e-4)
    p_nowd = step_with(0.0)

    # no decay: other heads bit-unchanged by an OSIE step
    for t in ("air", "coco"):
        np.testing.assert_array_equal(flat(p_nowd[t]), flat(p0[t]))
    # with decay: other heads move — by decay alone (shrink direction),
    # while the task head moves by gradient + decay (differs from the
    # no-decay update)
    for t in ("air", "coco"):
        assert np.abs(flat(p_wd[t]) - flat(p0[t])).max() > 0
    assert np.abs(flat(p_wd["osie"]) - flat(p_nowd["osie"])).max() > 0
    # the off-task update is exactly Adam steps on grad = wd * p:
    # sign(update) = -sign(p) (Adam normalizes magnitude, direction
    # survives); check well-away-from-zero params so two ~lr-sized
    # steps cannot have crossed zero
    d = flat(p_wd["air"]) - flat(p0["air"])
    p = flat(p0["air"])
    nz = np.abs(p) > 0.05
    assert nz.sum() > 100
    assert (np.sign(d[nz]) == -np.sign(p[nz])).all()


def test_joint_validation_device_matches_host(synth_root, tmp_path):
    """--device_eval joint validation must reproduce the host metric
    trees and the joint selection scalar: same seed -> same rollouts,
    so per-task scalars agree to device-kernel tolerance (the
    with-duration ScanMatch column gets ~1% for the documented
    table-truncation divergence on wild untrained durations)."""
    from scanpaths_tpu.core.config import parse_opt
    from scanpaths_tpu.train.joint import JointTrainer

    args = parse_opt([
        "--task", "joint", "--joint_data_root", synth_root,
        "--log_root", str(tmp_path / "logs"),
        "--height", "40", "--width", "48",
        "--map_height", "5", "--map_width", "6", "--max_length", "4",
        "--embed", "128", "--backbone_layers", "1,1,1,1",
        "--batch", "8", "--eval_repeat_num", "2", "--mesh_size", "1",
    ])
    trainer = JointTrainer(args)

    trainer.key = jax.random.PRNGKey(99)
    host = trainer.validation(1)
    trainer.key = jax.random.PRNGKey(99)
    dev = trainer.validation_device(2)
    np.testing.assert_allclose(dev, host, rtol=1e-2)

    by_step = {1: {}, 2: {}}
    with open(join(trainer.log_dir, "scalars.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r["step"] in by_step and "/metrics/" in r["tag"]:
                by_step[r["step"]][r["tag"]] = r["value"]
    assert by_step[1], "host validation wrote no metric scalars"
    for tag, want in by_step[1].items():
        got = by_step[2][tag]
        rtol = 1e-2 if "with duration" in tag else 5e-4
        np.testing.assert_allclose(got, want, rtol=rtol, atol=5e-5,
                                   err_msg=tag)
    # the device sweep additionally reports its truncation counter
    assert any(t.endswith("wd_overflow_frac") for t in by_step[2])


def test_joint_human_baseline_device_matches_host(synth_root, tmp_path):
    """The per-task joint human baseline under --device_eval logs the
    same inter-observer numbers as the host path (GT only — fully
    deterministic, no decode involved)."""
    from scanpaths_tpu.core.config import parse_opt
    from scanpaths_tpu.train.joint import JointTrainer

    def lines(device):
        # distinct log roots: the joint run dir name is timestamped to
        # the minute, so two trainers in one test would share a dir
        args = parse_opt([
            "--task", "joint", "--joint_data_root", synth_root,
            "--log_root", str(tmp_path / ("dev" if device else "host")),
            "--height", "40", "--width", "48",
            "--map_height", "5", "--map_width", "6", "--max_length", "4",
            "--embed", "128", "--backbone_layers", "1,1,1,1",
            "--batch", "8", "--eval_repeat_num", "1", "--mesh_size", "1",
        ] + (["--device_eval", "True"] if device else []))
        trainer = JointTrainer(args)
        trainer.human_baseline()
        out = []
        with open(join(trainer.log_dir, "log_train.txt")) as f:
            for line in f:
                if "+-" in line:
                    # "...  <name>: <v> +- <s>" -> (name, v, s)
                    head, tail = line.rsplit(":", 1)
                    v, s = tail.split("+-")
                    out.append((head.split()[-1],
                                float(v), float(s)))
        return out

    host, dev = lines(False), lines(True)
    assert len(host) == len(dev) and len(host) > 0
    for (hn, hv, hs), (dn, dv, ds) in zip(host, dev):
        assert hn == dn
        np.testing.assert_allclose(dv, hv, rtol=5e-4, atol=5e-5,
                                   err_msg=hn)
        np.testing.assert_allclose(ds, hs, rtol=5e-4, atol=5e-5,
                                   err_msg=hn + " std")
