"""End-to-end driver tests: Trainer.fit() over the synthetic OSIE
dataset through the real CLI entry points, artifact contract, resume,
and the inference driver (reference artifact contract:
AiR/train.py:68-71,480-482, AiR/test.py:153-200)."""

import json
import os
from os.path import exists, join

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from tools.make_synth_data import make_all
    root = tmp_path_factory.mktemp("e2e_data")
    make_all(str(root))
    return str(root)


def _argv(synth_root, log_root, extra=()):
    return [
        "--task", "osie",
        "--img_dir", join(synth_root, "osie", "stimuli"),
        "--fix_dir", join(synth_root, "osie", "fixations"),
        "--log_root", log_root,
        "--height", "40", "--width", "48",
        "--map_height", "5", "--map_width", "6",
        "--max_length", "4",
        "--embed", "128", "--backbone_layers", "1,1,1,1",
        "--batch", "4", "--rl_sample_number", "2",
        "--eval_repeat_num", "2",
        "--warmup_epoch", "1", "--start_rl_epoch", "1",
        "--mesh_size", "1",
        *extra,
    ]


@pytest.fixture(scope="module")
def trained_run(synth_root, tmp_path_factory):
    """One supervised epoch via cli.train (epoch=1), then a resumed run
    that adds the RL epoch (epoch=2) — exercising fresh start, the
    supervised_save snapshot, resume, and the RL phase in one drive."""
    from scanpaths_tpu.cli import train as cli_train

    log_root = str(tmp_path_factory.mktemp("e2e_logs"))
    cli_train.main(_argv(synth_root, log_root, ("--epoch", "1")))
    runs = [d for d in os.listdir(log_root)
            if d.startswith("log_") and not d.endswith("_supervised_save")]
    assert len(runs) == 1
    log_dir = join(log_root, runs[0])

    # resume: continues after epoch 0 and runs the RL epoch
    from scanpaths_tpu.cli import train as cli_train2
    cli_train2.main(_argv(synth_root, log_root,
                          ("--epoch", "2", "--resume_dir", log_dir)))
    return synth_root, log_root, log_dir


def test_artifact_contract(trained_run):
    _, log_root, log_dir = trained_run
    # the reference run-dir artifact set (AiR/train.py:68-71,124-140)
    assert exists(join(log_dir, "hparams.json"))
    assert exists(join(log_dir, "log_train.txt"))
    assert exists(join(log_dir, "history_record.json"))
    assert exists(join(log_dir, "scalars.jsonl"))
    assert exists(join(log_dir, "checkpoints", "checkpoint.msgpack"))
    assert exists(join(log_dir, "checkpoints", "checkpoint_best.msgpack"))
    # pre-RL snapshot (reference AiR/train.py:480-482)
    assert exists(log_dir + "_supervised_save")
    assert exists(join(log_dir + "_supervised_save", "checkpoints",
                       "checkpoint.msgpack"))

    with open(join(log_dir, "hparams.json")) as f:
        hp = json.load(f)
    assert hp["task"] == "osie" and hp["batch"] == 4

    with open(join(log_dir, "history_record.json")) as f:
        rec = json.load(f)
    assert rec["epoch"] == 1            # both epochs ran
    # 6 sup + 6 rl steps, 0-indexed from the reference's initial -1
    # (reference utils/recording.py:22)
    assert rec["iteration"] == 11
    assert rec["best_metric"] > 0

    tags = set()
    with open(join(log_dir, "scalars.jsonl")) as f:
        for line in f:
            tags.add(json.loads(line)["tag"])
    # supervised losses, lr, validation metrics, selection scalar
    for tag in ("loss/loss", "loss/loss_actions", "loss/loss_duration",
                "learning_rate", "current metric",
                "metrics/ScanMatch-w/o duration", "perf/steps_per_sec"):
        assert tag in tags, tag
    # RL-phase scalars incl. the reference's 11 metrics_for_reward/*
    for tag in ("rl_loss", "reward_hmean", "reward_overflow_frac",
                "metrics_for_reward/vector", "metrics_for_reward/duration",
                "metrics_for_reward/w/o duration",
                "metrics_for_reward/SED best",
                "metrics_for_reward/STDE mean"):
        assert tag in tags, tag


def test_cli_test_driver(trained_run):
    synth_root, log_root, log_dir = trained_run
    from scanpaths_tpu.cli import test as cli_test

    metrics = cli_test.main(_argv(synth_root, log_root,
                                  ("--evaluation_dir", log_dir)))
    assert set(metrics) >= {"MultiMatch", "ScanMatch", "VAME"}
    # reference key names: "with duration" here, "w/ duration" in the RL
    # tensorboard tags (OSIE/utils/evaluation.py:115 vs OSIE/train.py:270)
    assert set(metrics["ScanMatch"]) == {"w/o duration", "with duration"}
    assert all(0 <= v <= 1 for v in metrics["ScanMatch"].values())

    with open(join(log_dir, "test_predicts.json")) as f:
        preds = json.load(f)
    # 6 test images x eval_repeat_num(2) records, reference OSIE schema
    assert len(preds) == 12
    r = preds[0]
    assert set(r) == {"name", "repeat_id", "X", "Y", "T", "length"}
    assert r["length"] == len(r["X"]) == len(r["Y"]) == len(r["T"])
    assert r["repeat_id"] in (1, 2)
    # durations dumped in ms (reference test.py scales s -> ms)
    assert all(t >= 0 for t in r["T"])
    assert exists(join(log_dir, "log_test.txt"))


def test_cli_test_driver_device_eval_matches_host(trained_run):
    """The full test CLI under --device_eval: human baseline + metric
    sweep on device kernels.  Same seed -> identical stochastic decodes
    as the host-suite run above, so the metric trees must agree to
    device-kernel tolerance — except the with-duration ScanMatch
    column, where SAMPLED rollouts whose TempBin symbol expansion
    overflows the static NW table cap are prefix-truncated on device
    (the documented divergence, trainer._eval_specs): the untrained toy
    model here samples wild LogNormal durations, so allow ~1% there."""
    synth_root, log_root, log_dir = trained_run
    from scanpaths_tpu.cli import test as cli_test

    host = cli_test.main(_argv(synth_root, log_root,
                               ("--evaluation_dir", log_dir)))
    dev = cli_test.main(_argv(synth_root, log_root,
                              ("--evaluation_dir", log_dir,
                               "--device_eval", "True")))

    def walk(a, b, path=""):
        assert set(a) == set(b), path
        for k in a:
            if isinstance(a[k], dict):
                walk(a[k], b[k], path + "/" + str(k))
            else:
                rtol = 1e-2 if k == "with duration" else 5e-4
                np.testing.assert_allclose(
                    float(b[k]), float(a[k]), rtol=rtol, atol=5e-5,
                    err_msg=path + "/" + str(k))
    walk(host, dev)


def test_resume_restores_optimizer_and_record(trained_run):
    synth_root, log_root, log_dir = trained_run
    from scanpaths_tpu.core.config import parse_opt
    from scanpaths_tpu.train.trainer import Trainer

    args = parse_opt(_argv(synth_root, log_root,
                           ("--epoch", "2", "--resume_dir", log_dir)))
    trainer = Trainer(args)
    # record was restored, not re-initialized
    assert trainer.record_manager.get_epoch() == 1
    assert trainer.record_manager.get_iteration() == 11
    # fit() from a finished record is a no-op returning the best metric
    best = trainer.fit()
    assert best == pytest.approx(
        trainer.checkpoint_manager.get_best_metric())


def test_orbax_backend_end_to_end(synth_root, tmp_path):
    """--ckpt_backend orbax through the real CLIs: fresh train (async
    triad saves), resume from the orbax rolling checkpoint, and the
    test driver's auto-detected best restore."""
    from scanpaths_tpu.cli import test as cli_test
    from scanpaths_tpu.cli import train as cli_train
    from scanpaths_tpu.utils.checkpointing import detect_backend

    log_root = str(tmp_path / "orbax_logs")
    cli_train.main(_argv(synth_root, log_root,
                         ("--epoch", "1", "--ckpt_backend", "orbax")))
    runs = [d for d in os.listdir(log_root) if d.startswith("log_")
            and not d.endswith("_supervised_save")]
    log_dir = join(log_root, runs[0])
    ckdir = join(log_dir, "checkpoints")
    assert detect_backend(ckdir) == "orbax"
    assert exists(join(ckdir, "checkpoint.orbax"))
    assert exists(join(ckdir, "checkpoint_best.orbax"))
    assert not exists(join(ckdir, "checkpoint.msgpack"))
    # supervised_save copy (made AFTER wait()) carries complete dirs
    sup = log_dir + "_supervised_save"
    assert exists(join(sup, "checkpoints", "checkpoint.orbax"))

    # resume (auto-detected restore) + the RL epoch, still on orbax
    cli_train.main(_argv(synth_root, log_root,
                         ("--epoch", "2", "--resume_dir", log_dir,
                          "--ckpt_backend", "orbax")))
    metrics = cli_test.main(_argv(synth_root, log_root,
                                  ("--evaluation_dir", log_dir)))
    assert set(metrics) >= {"MultiMatch", "ScanMatch", "VAME"}


def test_air_cli_end_to_end(synth_root, tmp_path):
    """AiR single-task drive: dual-stream validation, performance-
    bucketed metrics, qid-keyed prediction dumps (reference
    AiR/train.py + AiR/test.py surface)."""
    from scanpaths_tpu.cli import test as cli_test
    from scanpaths_tpu.cli import train as cli_train

    log_root = str(tmp_path / "air_logs")
    argv = [
        "--task", "air",
        "--img_dir", join(synth_root, "air", "stimuli"),
        "--fix_dir", join(synth_root, "air", "fixations"),
        "--att_dir", join(synth_root, "air", "attention"),
        "--log_root", log_root,
        "--height", "40", "--width", "48",
        "--map_height", "5", "--map_width", "6",
        "--max_length", "4",
        "--embed", "128", "--backbone_layers", "1,1,1,1",
        "--batch", "8", "--rl_sample_number", "2",
        "--eval_repeat_num", "1",
        "--warmup_epoch", "1", "--start_rl_epoch", "1", "--epoch", "2",
        "--mesh_size", "1",
    ]
    cli_train.main(argv)
    runs = [d for d in os.listdir(log_root)
            if not d.endswith("_supervised_save")]
    log_dir = join(log_root, runs[0])

    tags = set()
    with open(join(log_dir, "scalars.jsonl")) as f:
        for line in f:
            tags.add(json.loads(line)["tag"])
    # AiR validation buckets metrics by answer correctness (reference
    # AiR/utils/evaluation.py:188-359)
    assert any(t.startswith("metrics/right_answer-") for t in tags)
    assert any(t.startswith("metrics/wrong_answer-") for t in tags)
    assert "reward_same_hmean" in tags  # AiR RL same/diff-group rewards

    metrics = cli_test.main(argv + ["--evaluation_dir", log_dir])
    assert {"right_answer", "wrong_answer", "all"} <= set(metrics)
    with open(join(log_dir, "test_predicts.json")) as f:
        preds = json.load(f)
    r = preds[0]
    # AiR dump schema: img_names + qid + performance flag + repeat
    # (reference AiR/test.py:153-191)
    assert {"img_names", "qid", "performance", "repeat_id", "X", "Y", "T",
            "length"} == set(r)
    # both streams dumped for every image x repeat
    assert sum(p["performance"] for p in preds) == len(preds) // 2


def test_coco_cli_end_to_end(synth_root, tmp_path):
    """COCO single-task drive: detector-bbox attention + 18-category
    conditioning, task-keyed dumps, and the COCO-specific
    validation_predicts.json artifact name (reference
    COCO_Search18/test.py:67-68)."""
    from scanpaths_tpu.cli import test as cli_test
    from scanpaths_tpu.cli import train as cli_train

    log_root = str(tmp_path / "coco_logs")
    argv = [
        "--task", "coco",
        "--img_dir", join(synth_root, "coco", "images"),
        "--fix_dir", join(synth_root, "coco", "fixations"),
        "--detector_dir", join(synth_root, "coco", "detectors"),
        "--log_root", log_root,
        "--height", "40", "--width", "48",
        "--map_height", "5", "--map_width", "6",
        "--max_length", "4",
        "--embed", "128", "--backbone_layers", "1,1,1,1",
        "--batch", "8", "--rl_sample_number", "2",
        "--eval_repeat_num", "1",
        "--warmup_epoch", "1", "--start_rl_epoch", "1", "--epoch", "2",
        "--mesh_size", "1",
    ]
    cli_train.main(argv)
    runs = [d for d in os.listdir(log_root)
            if not d.endswith("_supervised_save")]
    log_dir = join(log_root, runs[0])

    metrics = cli_test.main(argv + ["--evaluation_dir", log_dir])
    assert set(metrics) >= {"MultiMatch", "ScanMatch", "VAME"}
    # COCO has no public test split: the reference evaluates validation
    # and writes validation_predicts.json
    assert exists(join(log_dir, "validation_predicts.json"))
    assert not exists(join(log_dir, "test_predicts.json"))
    with open(join(log_dir, "validation_predicts.json")) as f:
        preds = json.load(f)
    r = preds[0]
    assert {"img_names", "task", "repeat_id", "X", "Y", "T",
            "length"} == set(r)
    from scanpaths_tpu.data.datasets import COCO_OBJECT_NAMES
    assert all(p["task"] in COCO_OBJECT_NAMES for p in preds)
