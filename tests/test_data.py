"""Data layer: tensorization semantics and task adapters on synthetic
dataset trees."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from scanpaths_tpu.data.datasets import (  # noqa: E402
    DataConfig,
    EvaluationDataset,
    Loader,
    SupervisedDataset,
    tensorize_scanpath,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from make_synth_data import make_all

    root = tmp_path_factory.mktemp("synth")
    make_all(str(root))
    return str(root)


def cfg_for(root, task):
    if task == "osie":
        return DataConfig(img_dir=f"{root}/osie/stimuli",
                          fix_dir=f"{root}/osie/fixations")
    if task == "air":
        return DataConfig(img_dir=f"{root}/air/stimuli",
                          fix_dir=f"{root}/air/fixations",
                          att_dir=f"{root}/air/attention")
    return DataConfig(img_dir=f"{root}/coco/images",
                      fix_dir=f"{root}/coco/fixations",
                      att_dir=f"{root}/coco/detectors",
                      detector_threshold=0.5)


def test_tensorize_matches_reference_semantics():
    cfg = DataConfig(img_dir="", fix_dir="")
    # 3 fixations on a 600x800 image
    x = [100.0, 780.0, 400.0]
    y = [50.0, 580.0, 300.0]
    t = [250.0, 400.0, 125.0]
    target, duration, amask, dmask = tensorize_scanpath(x, y, t, (600, 800), cfg)
    assert target.shape == (16, 1201)
    # grid indices: down_x = 20, down_y = 20
    exp_cells = [(int(yy / 20), int(xx / 20)) for xx, yy in zip(x, y)]
    for i, (gy, gx) in enumerate(exp_cells):
        assert target[i, 1 + gy * 40 + gx] == 1.0
        assert target[i, 0] == 0.0
    # steps beyond the scanpath supervise STOP
    assert np.all(target[3:, 0] == 1.0)
    np.testing.assert_allclose(duration[:3], np.array(t) / 1000.0)
    # action mask has one extra step for STOP supervision
    np.testing.assert_array_equal(amask[:5], [1, 1, 1, 1, 0])
    np.testing.assert_array_equal(dmask[:4], [1, 1, 1, 0])


def test_tensorize_full_length_no_extra_stop():
    cfg = DataConfig(img_dir="", fix_dir="")
    x = list(np.linspace(10, 700, 16))
    y = list(np.linspace(10, 500, 16))
    t = [100.0] * 16
    target, _, amask, _ = tensorize_scanpath(x, y, t, (600, 800), cfg)
    assert amask.sum() == 16
    assert np.all(target[:, 0] == 0.0)


def test_tensorize_blur_normalized():
    cfg = DataConfig(img_dir="", fix_dir="", blur_sigma=1.0)
    target, _, _, _ = tensorize_scanpath([400.0], [300.0], [100.0],
                                         (600, 800), cfg)
    assert target[0, 1:].sum() == pytest.approx(1.0, rel=1e-5)
    assert (target[0, 1:] > 0).sum() > 1  # actually blurred


@pytest.mark.parametrize("task", ["osie", "air", "coco"])
def test_supervised_dataset(synth_root, task):
    ds = SupervisedDataset(task, cfg_for(synth_root, task), split="train")
    assert len(ds) > 0
    s = ds[0]
    assert s["image"].shape == (240, 320, 3)
    assert s["image"].dtype == np.float32
    assert s["target_scanpath"].shape == (16, 1201)
    if task == "air":
        assert s["attention_map"].shape == (30, 40, 1)
        assert s["attention_map"].max() == pytest.approx(1.0)
        assert isinstance(bool(s["performance"]), bool)
    if task == "coco":
        assert s["attention_map"].shape == (30, 40, 1)
        assert 0 <= int(s["task"]) < 18


@pytest.mark.parametrize("task", ["osie", "air", "coco"])
def test_evaluation_dataset_and_loader(synth_root, task):
    ds = EvaluationDataset(task, cfg_for(synth_root, task),
                           split="validation")
    assert len(ds) > 0
    s = ds[0]
    assert len(s["fix_vectors"]) >= 2
    # coordinates rescaled into the 320x240 frame
    for v in s["fix_vectors"]:
        assert v["start_x"].max() < 320.5
        assert v["start_y"].max() < 240.5
        assert np.all(v["duration"] < 10.0)  # seconds, not ms
    # device-GT pads are DERIVED from the split (no silent truncation):
    # subject axis = largest group, fixation axis = longest GT scanpath
    exp_subjects = max(len(g) for g in ds.groups.values())
    exp_len = max(int(r.get("length", len(r["X"]))) for r in ds.records)
    assert ds.pad_subjects == exp_subjects
    assert ds.pad_gt_len == exp_len
    assert s["gt_fix"].shape == (exp_subjects, exp_len, 3)
    assert s["gt_mask"].sum() == len(s["fix_vectors"])
    # every GT fixation of every group fits the padded tensors
    for i in range(len(ds)):
        gi = ds[i]
        assert len(gi["fix_vectors"]) <= exp_subjects
        assert all(len(v) <= exp_len for v in gi["fix_vectors"])
    assert ds.wd_symbols_needed >= 1

    loader = Loader(ds, batch_size=4, shuffle=True, seed=3)
    batch = next(iter(loader))
    assert batch["images"].shape[0] == min(4, len(ds))
    assert len(batch["fix_vectors"]) == batch["images"].shape[0]
    assert batch["gt_fix"].shape[1:] == (exp_subjects, exp_len, 3)


def test_loader_shuffle_deterministic(synth_root):
    ds = SupervisedDataset("osie", cfg_for(synth_root, "osie"), split="train")
    l1 = Loader(ds, batch_size=4, shuffle=True, seed=7)
    l2 = Loader(ds, batch_size=4, shuffle=True, seed=7)
    b1, b2 = next(iter(l1)), next(iter(l2))
    np.testing.assert_array_equal(b1["images"], b2["images"])
    # next epoch reshuffles
    b1b = next(iter(l1))
    assert not np.array_equal(b1["images"], b1b["images"])


def test_ablate_attention_info_zeroes_maps(synth_root):
    """--ablate_attention_info must zero the conditioning maps before
    they reach the model (reference AiR/train.py:185-186)."""
    import types

    from scanpaths_tpu.train.trainer import EvalCore

    core = EvalCore.__new__(EvalCore)
    core.args = types.SimpleNamespace(ablate_attention_info=True)
    from scanpaths_tpu.train.mesh import make_mesh
    core.mesh = make_mesh(1)
    batch = {"images": np.ones((2, 8, 8, 3), np.float32),
             "attention_maps": np.ones((2, 5, 6, 1), np.float32),
             "gt_fix": np.ones((2, 3, 4, 3), np.float32),
             "gt_len": np.ones((2, 3), np.int32),
             "gt_mask": np.ones((2, 3), np.float32)}
    db = core._device_batch(batch, for_rl=True)
    assert float(np.asarray(db["attention_maps"]).sum()) == 0.0
    core.args.ablate_attention_info = False
    db2 = core._device_batch(batch, for_rl=True)
    assert float(np.asarray(db2["attention_maps"]).sum()) > 0


@pytest.mark.parametrize("task", ["osie", "air", "coco"])
def test_get_batch_equals_per_sample_collate(synth_root, task, tmp_path):
    """The native batch assembly (Loader -> get_batch) must equal the
    per-sample numpy path (collate of __getitem__) exactly, for every
    task — including with the packed image cache."""
    from scanpaths_tpu import native
    from scanpaths_tpu.data.datasets import collate

    if not native.available():
        pytest.skip("native library unavailable")
    cfg = cfg_for(synth_root, task)
    cfg.packed_cache_dir = str(tmp_path / "packed")
    ds = SupervisedDataset(task, cfg, split="train")
    idxs = list(range(min(len(ds), 7)))
    fast = ds.get_batch(idxs)
    ref = collate([ds[i] for i in idxs])
    assert set(fast) == set(ref)
    for k in ref:
        if isinstance(ref[k], np.ndarray):
            np.testing.assert_array_equal(fast[k], ref[k], err_msg=k)
        else:
            assert fast[k] == ref[k], k


def test_get_batch_blur_equals_per_sample(synth_root):
    from scanpaths_tpu import native
    from scanpaths_tpu.data.datasets import collate

    if not native.available():
        pytest.skip("native library unavailable")
    cfg = cfg_for(synth_root, "osie")
    cfg.blur_sigma = 1.0
    ds = SupervisedDataset("osie", cfg, split="train")
    idxs = [0, 2, 1]
    fast = ds.get_batch(idxs)
    ref = collate([ds[i] for i in idxs])
    np.testing.assert_array_equal(fast["scanpaths"], ref["scanpaths"])


def test_loader_uses_get_batch_and_matches_disabled(synth_root,
                                                    monkeypatch):
    """One full Loader epoch with the native path on vs off must yield
    identical batches in identical order."""
    from scanpaths_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")
    ds = SupervisedDataset("osie", cfg_for(synth_root, "osie"),
                           split="train")
    on = list(Loader(ds, batch_size=4, shuffle=True, seed=3))
    monkeypatch.setenv("SP_NATIVE", "0")
    ds2 = SupervisedDataset("osie", cfg_for(synth_root, "osie"),
                            split="train")
    off = list(Loader(ds2, batch_size=4, shuffle=True, seed=3))
    assert len(on) == len(off)
    for a, b in zip(on, off):
        for k in b:
            if isinstance(b[k], np.ndarray):
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
            else:
                assert a[k] == b[k], k


@pytest.mark.parametrize("task", ["osie", "air", "coco"])
def test_eval_get_batch_equals_per_sample_collate(synth_root, task,
                                                  tmp_path):
    from scanpaths_tpu.data.datasets import collate

    cfg = cfg_for(synth_root, task)
    cfg.packed_cache_dir = str(tmp_path / "packed")
    ds = EvaluationDataset(task, cfg, split="validation")
    idxs = list(range(min(len(ds), 5)))
    fast = ds.get_batch(idxs)
    ref = collate([ds[i] for i in idxs])
    assert set(fast) == set(ref)
    for k in ref:
        if isinstance(ref[k], np.ndarray):
            np.testing.assert_array_equal(fast[k], ref[k], err_msg=k)
        elif k == "fix_vectors":
            for a, b in zip(fast[k], ref[k]):
                for fa, fb in zip(a, b):
                    np.testing.assert_array_equal(fa, fb)
        else:
            assert fast[k] == ref[k], k
