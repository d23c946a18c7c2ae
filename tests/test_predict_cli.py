"""The serving CLI (cli/predict.py): greedy and stochastic decode of
arbitrary image files from a trained run directory — a capability the
reference lacks (its test drivers need a dataset split on disk,
reference AiR/test.py:60-104)."""

import json
import os
from os.path import join

import jax
import numpy as np
import pytest
from PIL import Image

from scanpaths_tpu.cli import predict as predict_cli
from scanpaths_tpu.core.config import parse_opt
from scanpaths_tpu.train.trainer import build_model
from scanpaths_tpu.utils.checkpointing import save_pytree

TINY = ["--map_height", "10", "--map_width", "12", "--height", "80",
        "--width", "96", "--max_length", "4", "--backbone_layers",
        "1,1,1,1", "--embed", "16", "--batch", "2"]


def _make_run_dir(tmp_path, task):
    """A minimal Evaluator-compatible run dir: hparams.json + an
    initialized (untrained) checkpoint_best."""
    args = parse_opt(["--task", task] + TINY)
    model = build_model(args)
    dummy = np.zeros((1, args.height, args.width, 3), np.float32)
    kw = {}
    if task in ("air", "coco"):
        kw["attention_maps"] = np.zeros(
            (1, args.map_height, args.map_width, 1), np.float32)
    if task == "coco":
        kw["task_ids"] = np.zeros((1,), np.int32)
    variables = model.init(jax.random.PRNGKey(0), dummy, train=False, **kw)
    run = tmp_path / f"run_{task}"
    (run / "checkpoints").mkdir(parents=True)
    with open(run / "hparams.json", "w") as f:
        json.dump({"task": task}, f)
    save_pytree(str(run / "checkpoints" / "checkpoint_best.msgpack"),
                {"model": {"params": variables["params"],
                           "batch_stats": variables["batch_stats"]}})
    return run


def _make_images(tmp_path, n=3):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(rng.integers(0, 255, (60, 90, 3),
                                     dtype=np.uint8)).save(p)
        paths.append(str(p))
    return paths


def test_predict_greedy_deterministic(tmp_path):
    run = _make_run_dir(tmp_path, "osie")
    paths = _make_images(tmp_path, n=3)  # batch 2 -> padded tail chunk
    argv = (["--task", "osie", "--evaluation_dir", str(run),
             "--predict_images", ",".join(paths), "--decode", "greedy",
             "--predict_out", str(tmp_path / "out.json")] + TINY)
    recs1 = predict_cli.main(argv)
    recs2 = predict_cli.main(argv)

    assert len(recs1) == 3
    with open(tmp_path / "out.json") as f:
        assert json.load(f) == recs1
    for rec, p in zip(recs1, paths):
        assert rec["name"] == os.path.basename(p)
        assert rec["repeat_id"] == 1
        assert rec["length"] == len(rec["X"]) == len(rec["Y"]) == len(rec["T"])
        assert 1 <= rec["length"] <= 4
        for x, y in zip(rec["X"], rec["Y"]):
            assert 0 <= x <= 96 and 0 <= y <= 80
    assert recs1 == recs2  # greedy decode is deterministic


def test_predict_sampled_multiple(tmp_path):
    run = _make_run_dir(tmp_path, "osie")
    paths = _make_images(tmp_path, n=2)
    argv = (["--task", "osie", "--evaluation_dir", str(run),
             "--predict_images", ",".join(paths), "--decode", "sample",
             "--num_samples", "3", "--predict_out",
             str(tmp_path / "out.json")] + TINY)
    recs = predict_cli.main(argv)
    assert len(recs) == 6  # 3 samples x 2 images
    assert sorted({r["repeat_id"] for r in recs}) == [1, 2, 3]
    # stochastic: not all samples of an image identical
    per_img = [r for r in recs if r["name"] == recs[0]["name"]]
    assert len({tuple(r["X"]) for r in per_img}) > 1 or \
        len({tuple(r["T"]) for r in per_img}) > 1


def test_predict_coco_requires_category(tmp_path):
    run = _make_run_dir(tmp_path, "coco")
    paths = _make_images(tmp_path, n=2)
    base = (["--task", "coco", "--evaluation_dir", str(run),
             "--predict_images", ",".join(paths)] + TINY)
    with pytest.raises(AssertionError):
        predict_cli.main(base)
    recs = predict_cli.main(base + ["--target_category", "car"])
    assert len(recs) == 2


def _assert_records_equal(served, live):
    """Grid-derived fields must be exact; durations may differ by one
    float32 ulp (the bundle is lowered for platforms=["cpu","tpu"] and
    the platform-parameterized module fuses the exp() chain differently
    from the in-process jit)."""
    assert len(served) == len(live)
    for s_, l_ in zip(served, live):
        assert {k: v for k, v in s_.items() if k != "T"} \
            == {k: v for k, v in l_.items() if k != "T"}
        np.testing.assert_allclose(s_["T"], l_["T"], rtol=1e-6)


def test_predict_from_bundle_matches_live_model(tmp_path):
    """--bundle serves the exported AOT artifact through the same CLI;
    greedy output records must equal the live-model path's exactly
    (same function, exported)."""
    from scanpaths_tpu.cli import export as export_cli

    run = _make_run_dir(tmp_path, "osie")
    paths = _make_images(tmp_path, n=3)
    bundle = tmp_path / "bundle"
    export_cli.main(["--task", "osie", "--evaluation_dir", str(run),
                     "--export_dir", str(bundle), "--export_batch", "2",
                     "--export_check", "False"] + TINY)

    base = ["--task", "osie", "--predict_images", ",".join(paths),
            "--decode", "greedy"] + TINY
    live = predict_cli.main(base + ["--evaluation_dir", str(run)])
    served = predict_cli.main(base + ["--bundle", str(bundle)])
    _assert_records_equal(served, live)

    # a task-mismatched bundle is refused loudly
    with pytest.raises(AssertionError, match="task"):
        predict_cli.main(["--task", "air", "--predict_images", paths[0],
                          "--bundle", str(bundle)] + TINY)


def test_predict_from_symbolic_bundle(tmp_path):
    """A batch='sym' bundle serves any image count in one chunk, no
    padding."""
    from scanpaths_tpu.cli import export as export_cli

    run = _make_run_dir(tmp_path, "osie")
    paths = _make_images(tmp_path, n=3)
    bundle = tmp_path / "bundle_sym"
    export_cli.main(["--task", "osie", "--evaluation_dir", str(run),
                     "--export_dir", str(bundle), "--export_batch", "sym",
                     "--export_check", "False"] + TINY)
    live = predict_cli.main(["--task", "osie", "--evaluation_dir",
                             str(run), "--predict_images",
                             ",".join(paths), "--decode", "greedy"]
                            + TINY)
    served = predict_cli.main(["--task", "osie", "--bundle", str(bundle),
                               "--predict_images", ",".join(paths)]
                              + TINY)
    _assert_records_equal(served, live)
