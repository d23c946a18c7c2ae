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
