"""AOT serving export (serve/export.py + cli/export.py): the decode
path serialized to a self-contained StableHLO bundle via jax.export —
a deployment artifact the reference has no analogue of (its serving
story is repo + .pth, reference AiR/test.py:60-104)."""

import json
import os
import subprocess
import sys
from os.path import join

import jax
import numpy as np
import pytest

from scanpaths_tpu.core.config import parse_opt
from scanpaths_tpu.serve.export import (build_serve_fn, export_bundle,
                                        load_bundle)
from scanpaths_tpu.train.trainer import build_model, grid_spec

TINY = ["--map_height", "10", "--map_width", "12", "--height", "80",
        "--width", "96", "--max_length", "4", "--backbone_layers",
        "1,1,1,1", "--embed", "16", "--batch", "2"]


def _tiny_model(task):
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
    return args, model, dict(variables)


def _feed(args, task, b, decode="greedy", seed=7):
    rng = np.random.default_rng(3)
    feed = []
    if decode == "sample":
        feed.append(np.uint32(seed))
    feed.append(rng.normal(size=(b, args.height, args.width, 3))
                .astype(np.float32))
    if task in ("air", "coco"):
        feed.append(rng.uniform(size=(b, args.map_height, args.map_width,
                                      1)).astype(np.float32))
    if task == "coco":
        feed.append(rng.integers(0, 18, size=(b,)).astype(np.int32))
    return feed


def test_export_greedy_roundtrip_osie(tmp_path):
    args, model, variables = _tiny_model("osie")
    grid = grid_spec(args)
    manifest = export_bundle(str(tmp_path), model, variables, grid,
                             batch=2, map_h=args.map_height,
                             map_w=args.map_width)
    assert manifest["bytes"] > 0
    assert [i["name"] for i in manifest["inputs"]] == ["images"]
    assert os.path.exists(join(tmp_path, "serve.jaxexport"))
    with open(join(tmp_path, "manifest.json")) as f:
        assert json.load(f)["task"] == "osie"

    fn, mf = load_bundle(str(tmp_path))
    feed = _feed(args, "osie", 2)
    got = fn(*feed)
    want = jax.jit(build_serve_fn(model, variables, grid))(*feed)
    for k in ("fix", "fix_len", "action_probs"):
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]))
    # fixations decode to pixel centers inside the image
    lens = np.asarray(got["fix_len"])
    assert lens.min() >= 1 and lens.max() <= args.max_length
    fix = np.asarray(got["fix"])
    for i, l in enumerate(lens):
        assert (fix[i, :l, 0] >= 0).all() and (fix[i, :l, 0] <= 96).all()
        assert (fix[i, :l, 1] >= 0).all() and (fix[i, :l, 1] <= 80).all()


def test_export_symbolic_batch(tmp_path):
    args, model, variables = _tiny_model("osie")
    grid = grid_spec(args)
    manifest = export_bundle(str(tmp_path), model, variables, grid,
                             batch="sym", map_h=args.map_height,
                             map_w=args.map_width)
    assert manifest["batch"] == "sym"
    assert manifest["inputs"][0]["shape"][0] == "b"
    fn, _ = load_bundle(str(tmp_path))
    ref = jax.jit(build_serve_fn(model, variables, grid))
    for b in (1, 3):
        feed = _feed(args, "osie", b)
        got, want = fn(*feed), ref(*feed)
        assert np.asarray(got["fix"]).shape[0] == b
        np.testing.assert_array_equal(np.asarray(got["fix"]),
                                      np.asarray(want["fix"]))


def test_export_sample_decode_coco(tmp_path):
    """Stochastic bundle: seed argument, conditioning inputs, [R, B]
    leading sample axis, seed-determinism."""
    args, model, variables = _tiny_model("coco")
    grid = grid_spec(args)
    export_bundle(str(tmp_path), model, variables, grid, decode="sample",
                  num_samples=3, batch=2, map_h=args.map_height,
                  map_w=args.map_width)
    fn, manifest = load_bundle(str(tmp_path))
    assert [i["name"] for i in manifest["inputs"]] == \
        ["seed", "images", "attention_maps", "tasks"]
    feed = _feed(args, "coco", 2, decode="sample")
    got = fn(*feed)
    assert np.asarray(got["fix"]).shape[:2] == (3, 2)
    np.testing.assert_array_equal(np.asarray(got["fix"]),
                                  np.asarray(fn(*feed)["fix"]))
    feed2 = list(feed)
    feed2[0] = np.uint32(8)
    assert not np.array_equal(np.asarray(got["fix"]),
                              np.asarray(fn(*feed2)["fix"]))
    want = jax.jit(build_serve_fn(model, variables, grid,
                                  decode="sample", num_samples=3))(*feed)
    np.testing.assert_array_equal(np.asarray(got["fix"]),
                                  np.asarray(want["fix"]))


def test_bundle_runs_without_model_code(tmp_path):
    """The deployment claim itself: a fresh interpreter that never
    imports scanpaths_tpu deserializes the bundle and reproduces the
    live model's output."""
    args, model, variables = _tiny_model("osie")
    grid = grid_spec(args)
    export_bundle(str(tmp_path), model, variables, grid, batch=1,
                  map_h=args.map_height, map_w=args.map_width)
    feed = _feed(args, "osie", 1)
    want = jax.jit(build_serve_fn(model, variables, grid))(*feed)
    np.save(tmp_path / "images.npy", feed[0])

    script = (
        "import os; os.environ['JAX_PLATFORMS']='cpu'\n"
        "import sys, json, numpy as np, jax\n"
        "d = sys.argv[1]\n"
        "assert 'scanpaths_tpu' not in sys.modules\n"
        "exp = jax.export.deserialize("
        "bytearray(open(d + '/serve.jaxexport', 'rb').read()))\n"
        "out = exp.call(np.load(d + '/images.npy'))\n"
        "assert 'scanpaths_tpu' not in sys.modules\n"
        "print(json.dumps({'fix': np.asarray(out['fix']).tolist(),"
        " 'fix_len': np.asarray(out['fix_len']).tolist()}))\n")
    # Pin the subprocess to the CPU backend robustly: a sitecustomize
    # may import jax (registering the axon TPU plugin) before the -c
    # script's os.environ mutation runs, so the plugin env vars must be
    # absent from the environment itself (same treatment as
    # __graft_entry__.py's dryrun subprocess).
    env = {k: v for k, v in os.environ.items()
           if k != "XLA_FLAGS" and not k.startswith("PALLAS_AXON")
           and not k.startswith("TPU_")}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", script, str(tmp_path)],
                       capture_output=True, text=True, env=env,
                       cwd="/")
    assert r.returncode == 0, r.stderr[-2000:]
    got = json.loads(r.stdout.strip().splitlines()[-1])
    # The bundle is lowered for platforms=["cpu","tpu"]; the
    # platform-parameterized module may fuse the duration exp() chain
    # differently from the in-process single-platform jit, so durations
    # can differ by 1 float32 ulp.  Grid-center coordinates and lengths
    # are integer-derived and must be exact.
    np.testing.assert_allclose(np.asarray(got["fix"], np.float64),
                               np.asarray(want["fix"], np.float64),
                               rtol=1e-6, atol=0)
    np.testing.assert_array_equal(np.asarray(got["fix_len"]),
                                  np.asarray(want["fix_len"]))


def test_bundle_loads_on_real_tpu(tmp_path):
    """Backend portability on real hardware: the default cpu+tpu bundle,
    exported under this CPU test process, deserializes and executes on
    the real TPU chip (axon tunnel) in a fresh interpreter and
    reproduces the CPU output bit-for-bit on the integer/len fields.
    Skipped when the environment has no TPU plugin configured."""
    if not any(k.startswith(("PALLAS_AXON", "TPU_")) for k in os.environ):
        pytest.skip("no TPU plugin env configured")
    args, model, variables = _tiny_model("osie")
    grid = grid_spec(args)
    manifest = export_bundle(str(tmp_path), model, variables, grid,
                             batch=1, map_h=args.map_height,
                             map_w=args.map_width)
    assert set(manifest["platforms"]) >= {"cpu", "tpu"}
    feed = _feed(args, "osie", 1)
    want = jax.jit(build_serve_fn(model, variables, grid))(*feed)
    np.save(tmp_path / "images.npy", feed[0])
    script = (
        "import sys, json, numpy as np, jax\n"
        "assert jax.default_backend() == 'tpu', jax.devices()\n"
        "d = sys.argv[1]\n"
        "exp = jax.export.deserialize("
        "bytearray(open(d + '/serve.jaxexport', 'rb').read()))\n"
        "out = exp.call(np.load(d + '/images.npy'))\n"
        "print(json.dumps({'fix': np.asarray(out['fix']).tolist(),"
        " 'fix_len': np.asarray(out['fix_len']).tolist()}))\n")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.pop("JAX_PLATFORMS", None)
    # De-flake (round-3 verdict): under full-suite load on this 1-core
    # box the child's cold TPU compile ate the whole 600 s budget
    # (passes alone in ~350 s).  Give the child a PERSISTENT compile
    # cache — the bundle's program is identical across runs, so every
    # run after the first skips the compile — and a timeout with real
    # margin over the measured cold path.
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/sp_tpu_export_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
    r = subprocess.run([sys.executable, "-c", script, str(tmp_path)],
                       capture_output=True, text=True, env=env,
                       cwd="/", timeout=1500)
    assert r.returncode == 0, r.stderr[-2000:]
    got = json.loads(r.stdout.strip().splitlines()[-1])
    # fix carries float durations whose bf16-free compute path is still
    # float32; TPU float32 conv accumulation may differ in ulps from
    # CPU, so compare lens exactly and coordinates loosely.
    np.testing.assert_array_equal(np.asarray(got["fix_len"]),
                                  np.asarray(want["fix_len"]))
    np.testing.assert_allclose(np.asarray(got["fix"], np.float64),
                               np.asarray(want["fix"], np.float64),
                               rtol=1e-3, atol=1e-3)


def test_export_cli_end_to_end(tmp_path):
    """cli/export.py on an Evaluator-compatible run dir, incl. its own
    deserialize-and-verify check."""
    from scanpaths_tpu.cli import export as export_cli
    from tests.test_predict_cli import _make_run_dir

    run = _make_run_dir(tmp_path, "air")
    out = tmp_path / "bundle"
    manifest = export_cli.main(
        ["--task", "air", "--evaluation_dir", str(run),
         "--export_dir", str(out), "--export_batch", "2"] + TINY)
    assert manifest["task"] == "air"
    assert manifest["stream"] == "good"
    fn, mf = load_bundle(str(out))
    feed = _feed(parse_opt(["--task", "air"] + TINY), "air", 2)
    assert np.asarray(fn(*feed)["fix"]).shape[0] == 2
