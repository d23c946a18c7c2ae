"""On-disk packed image cache: bit-identical loads, reuse across
instances, fingerprint-keyed rebuilds, dataset integration."""

import os
import sys
from os.path import join
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from scanpaths_tpu.data.packed_cache import PackedImageCache  # noqa: E402
from scanpaths_tpu.data.transforms import load_image  # noqa: E402


@pytest.fixture(scope="module")
def synth_data_root(tmp_path_factory):
    from make_synth_data import make_all

    root = tmp_path_factory.mktemp("synth_pc")
    make_all(str(root))
    return str(root)


def _write_images(tmp_path, n=4, hw=(50, 70)):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = str(tmp_path / f"im{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (*hw, 3),
                                     dtype=np.uint8)).save(p, quality=90)
        paths.append(p)
    return paths


def test_packed_load_identical_to_pil_path(tmp_path):
    paths = _write_images(tmp_path)
    cache = PackedImageCache(str(tmp_path / "cache"), paths, (24, 32))
    for p in paths:
        np.testing.assert_array_equal(cache.load(p), load_image(p, 24, 32))


def test_packed_reuses_existing_store(tmp_path):
    paths = _write_images(tmp_path)
    cdir = str(tmp_path / "cache")
    PackedImageCache(cdir, paths, (24, 32))
    # identity = inode + size (mtime is refreshed on every open — the
    # prune() freshness marker), so a rebuild would change the inode
    files = {f: (os.stat(join(cdir, f)).st_ino,
                 os.stat(join(cdir, f)).st_size) for f in os.listdir(cdir)}
    cache2 = PackedImageCache(cdir, paths, (24, 32))
    assert {f: (os.stat(join(cdir, f)).st_ino,
                os.stat(join(cdir, f)).st_size)
            for f in os.listdir(cdir)} == files  # nothing rebuilt
    np.testing.assert_array_equal(cache2.load(paths[0]),
                                  load_image(paths[0], 24, 32))


def test_packed_prune_evicts_stale_keeps_fresh(tmp_path):
    paths = _write_images(tmp_path)
    cdir = str(tmp_path / "cache")
    PackedImageCache(cdir, paths, (24, 32))
    # an old orphaned store from a superseded fingerprint
    stale_npy = join(cdir, "images_deadbeefdeadbeef.npy")
    stale_json = join(cdir, "images_deadbeefdeadbeef.json")
    open(stale_npy, "wb").close()
    open(stale_json, "w").close()
    old = 1.0  # epoch 1970 — far past any keep window
    os.utime(stale_npy, (old, old))
    os.utime(stale_json, (old, old))
    removed = PackedImageCache.prune(cdir, keep_days=30)
    assert sorted(removed) == ["images_deadbeefdeadbeef.json",
                               "images_deadbeefdeadbeef.npy"]
    # the freshly opened store survives
    assert any(f.endswith(".npy") for f in os.listdir(cdir))


def test_packed_fingerprint_invalidates(tmp_path):
    paths = _write_images(tmp_path)
    cdir = str(tmp_path / "cache")
    PackedImageCache(cdir, paths, (24, 32))
    n_files = len(os.listdir(cdir))
    # different geometry -> new store, old one untouched
    PackedImageCache(cdir, paths, (16, 20))
    assert len(os.listdir(cdir)) == n_files + 2
    # different path set -> new store as well
    PackedImageCache(cdir, paths[:2], (24, 32))
    assert len(os.listdir(cdir)) == n_files + 4


def test_packed_detects_inplace_content_change(tmp_path):
    """Re-generating an image under the SAME filename must not serve
    stale rows: the fingerprint covers file size+mtime."""
    paths = _write_images(tmp_path)
    cdir = str(tmp_path / "cache")
    cache1 = PackedImageCache(cdir, paths, (24, 32))
    old = cache1.load(paths[0]).copy()
    rng = np.random.default_rng(99)
    Image.fromarray(rng.integers(0, 255, (50, 70, 3),
                                 dtype=np.uint8)).save(paths[0], quality=90)
    os.utime(paths[0], ns=(1, 1))  # force a distinct mtime even on
    cache2 = PackedImageCache(cdir, paths, (24, 32))  # coarse clocks
    fresh = cache2.load(paths[0])
    np.testing.assert_array_equal(fresh, load_image(paths[0], 24, 32))
    assert not np.array_equal(fresh, old)


def test_dataset_uses_packed_cache(tmp_path, synth_data_root):
    from scanpaths_tpu.data.datasets import DataConfig, SupervisedDataset

    root = synth_data_root
    cdir = str(tmp_path / "cache")
    kw = dict(img_dir=join(root, "osie", "stimuli"),
              fix_dir=join(root, "osie", "fixations"),
              action_map=(10, 12), resize=(80, 96), max_length=4)
    ds_packed = SupervisedDataset("osie", DataConfig(
        packed_cache_dir=cdir, cache_images=False, **kw))
    ds_plain = SupervisedDataset("osie", DataConfig(
        cache_images=False, **kw))
    assert os.listdir(cdir)  # store was built
    s_packed, s_plain = ds_packed[0], ds_plain[0]
    np.testing.assert_array_equal(s_packed["image"], s_plain["image"])
