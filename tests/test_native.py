"""Native (C++) batch assembly must be BIT-identical to the numpy
input path it accelerates (data/datasets.py::tensorize_scanpath,
data/packed_cache.py::PackedImageCache.load semantics)."""

import numpy as np
import pytest

from scanpaths_tpu import native
from scanpaths_tpu.data.datasets import DataConfig, tensorize_scanpath
from scanpaths_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable")


def _rand_scanpath(rng, n, origin_hw, oob=False):
    oy, ox = origin_hw
    hi_x = ox * (1.1 if oob else 0.999)
    hi_y = oy * (1.1 if oob else 0.999)
    return (rng.uniform(0, hi_x, n).astype(np.float32),
            rng.uniform(0, hi_y, n).astype(np.float32),
            rng.uniform(30, 900, n).astype(np.float32))


@pytest.mark.parametrize("task,origin,clamp", [
    ("osie", (600, 800), False),
    ("air", (517, 713), False),      # AiR: per-record origin
    ("coco", (320, 512), True),      # COCO: clamp + in-grid
])
def test_tensorize_batch_bit_identical(rng, task, origin, clamp):
    cfg = DataConfig(img_dir="", fix_dir="", action_map=(30, 40),
                     max_length=16)
    lengths = [1, 3, 7, 15, 16, 24, 2]   # short, full, overflow
    xs, ys, ds, origins = [], [], [], []
    for i, l in enumerate(lengths):
        # vary the origin per sample for the AiR case
        o = (origin[0] + 11 * i, origin[1] + 7 * i) if task == "air" \
            else origin
        x, y, d = _rand_scanpath(rng, l, o, oob=clamp)
        xs.append(x), ys.append(y), ds.append(d), origins.append(o)

    t, dur, am, dm = native.tensorize_batch(
        xs, ys, ds, origins, cfg.max_length, 30, 40, clamp_to_grid=clamp)
    for i in range(len(lengths)):
        rt, rd, ra, rm = tensorize_scanpath(
            xs[i], ys[i], ds[i], origins[i], cfg, clamp_to_grid=clamp)
        np.testing.assert_array_equal(t[i], rt)
        np.testing.assert_array_equal(dur[i], rd)
        np.testing.assert_array_equal(am[i], ra)
        np.testing.assert_array_equal(dm[i], rm)


def test_tensorize_batch_blur_bit_identical(rng):
    cfg = DataConfig(img_dir="", fix_dir="", action_map=(10, 12),
                     max_length=6, blur_sigma=1.0)
    rows = native.make_blur_rows(10, 12, 1.0)
    xs, ys, ds, origins = [], [], [], []
    for l in (2, 5, 9):
        x, y, d = _rand_scanpath(rng, l, (200, 300))
        xs.append(x), ys.append(y), ds.append(d), origins.append((200, 300))
    t, dur, am, dm = native.tensorize_batch(
        xs, ys, ds, origins, 6, 10, 12, clamp_to_grid=False,
        blur_rows=rows)
    for i in range(3):
        rt, rd, ra, rm = tensorize_scanpath(
            xs[i], ys[i], ds[i], origins[i], cfg, clamp_to_grid=False)
        np.testing.assert_array_equal(t[i], rt)
        np.testing.assert_array_equal(dur[i], rd)
        np.testing.assert_array_equal(am[i], ra)
        np.testing.assert_array_equal(dm[i], rm)


def test_gather_normalize_bit_identical(rng):
    store = rng.integers(0, 256, size=(5, 24, 32, 3), dtype=np.uint8)
    rows = np.array([3, 0, 3, 4], np.int64)
    out = native.gather_normalize(store, rows, IMAGENET_MEAN, IMAGENET_STD)
    for i, r in enumerate(rows):
        ref = ((store[r].astype(np.float32) / 255.0 - IMAGENET_MEAN)
               / IMAGENET_STD).astype(np.float32)
        np.testing.assert_array_equal(out[i], ref)


def test_gather_normalize_threaded_matches_single(rng):
    store = rng.integers(0, 256, size=(16, 24, 32, 3), dtype=np.uint8)
    rows = np.arange(16, dtype=np.int64)
    a = native.gather_normalize(store, rows, IMAGENET_MEAN, IMAGENET_STD,
                                n_threads=1)
    b = native.gather_normalize(store, rows, IMAGENET_MEAN, IMAGENET_STD,
                                n_threads=4)
    np.testing.assert_array_equal(a, b)


def test_tensorize_threaded_matches_single(rng):
    xs, ys, ds, origins = [], [], [], []
    for l in range(1, 33):
        x, y, d = _rand_scanpath(rng, l, (600, 800))
        xs.append(x), ys.append(y), ds.append(d), origins.append((600, 800))
    a = native.tensorize_batch(xs, ys, ds, origins, 16, 30, 40,
                               clamp_to_grid=False, n_threads=1)
    b = native.tensorize_batch(xs, ys, ds, origins, 16, 30, 40,
                               clamp_to_grid=False, n_threads=8)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_disable_env_switch(monkeypatch):
    monkeypatch.setenv("SP_NATIVE", "0")
    assert not native.available()
