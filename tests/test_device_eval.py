"""--device_eval correctness: the device-kernel validation sweep
(metrics/device_eval.py) must produce the exact metric tree of the host
suite (metrics/evaluation.py) on the same scanpaths — including NaN
MultiMatch handling, per-image SED/STDE best groups, and the AiR
performance bucketing."""

import numpy as np
import pytest

from scanpaths_tpu.core.grid import fix_vector, pad_fix_vectors
from scanpaths_tpu.metrics import evaluation as heval
from scanpaths_tpu.metrics import jax_metrics as jm
from scanpaths_tpu.metrics.device_eval import DeviceSweep


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def _grid_path(rng, l):
    xs = rng.integers(0, 40, l) * 8 + 4.0
    ys = rng.integers(0, 30, l) * 8 + 4.0
    d = rng.integers(2, 12, l) * 0.05
    return fix_vector(xs, ys, d)


def _specs(gts, preds):
    wd_need = max(
        int(sum(round(d * 1000 / 50) for d in np.asarray(v["duration"])))
        for group in gts for v in group)
    wd_need = max(wd_need, max(
        int(sum(round(d * 1000 / 50) for d in np.asarray(v["duration"])))
        for v in preds))
    cap = int(np.ceil(max(wd_need, 64) / 64) * 64)
    max_len = max(max(len(v) for g in gts for v in g),
                  max(len(v) for v in preds))
    spec_wd = jm.ScanMatchSpec(temp_bin=50.0, max_symbols=cap)
    spec_wod = jm.ScanMatchSpec(temp_bin=0.0, max_symbols=max_len)
    return spec_wd, spec_wod


def _pad_batch(gts, preds):
    """Host fix-vector lists -> the padded tensors the trainer's device
    batch carries."""
    s_max = max(len(g) for g in gts)
    l_max = max(max(len(v) for g in gts for v in g),
                max(len(v) for v in preds))
    gt_fix, gt_len, gt_mask = [], [], []
    for g in gts:
        f, l, m = pad_fix_vectors(g, l_max, s_max)
        gt_fix.append(f)
        gt_len.append(l)
        gt_mask.append(m)
    pred_fix = np.zeros((len(preds), l_max, 3), np.float32)
    pred_len = np.zeros((len(preds),), np.int32)
    for i, v in enumerate(preds):
        arr = np.stack([v["start_x"], v["start_y"], v["duration"]], -1)
        pred_fix[i, :len(v)] = arr
        pred_len[i] = len(v)
    return (np.stack(gt_fix), np.stack(gt_len), np.stack(gt_mask),
            pred_fix, pred_len)


def test_device_sweep_equals_host_evaluation(rng):
    gts, preds = [], []
    for i in range(6):
        subj = []
        for s in range(3):
            # a couple of <3-fixation subjects exercise the MultiMatch
            # NaN path straight through the aggregation
            l = 2 if (i == 2 and s == 1) else int(rng.integers(3, 10))
            subj.append(_grid_path(rng, l))
        gts.append(subj)
        preds.append(_grid_path(rng, int(rng.integers(3, 10))))

    want_m, want_s, _ = heval.evaluation(gts, preds)

    spec_wd, spec_wod = _specs(gts, preds)
    sweep = DeviceSweep(spec_wd, spec_wod)
    gt_fix, gt_len, gt_mask, pred_fix, pred_len = _pad_batch(gts, preds)
    sweep.add_batch(gt_fix, gt_len, gt_mask, pred_fix, pred_len)
    got_m, got_s = sweep.result()

    def assert_tree(a, b, path=""):
        assert set(a) == set(b), path
        for k in a:
            if isinstance(a[k], dict):
                assert_tree(a[k], b[k], path + "/" + str(k))
            else:
                np.testing.assert_allclose(
                    float(b[k]), float(a[k]), rtol=2e-4, atol=2e-5,
                    err_msg=path + "/" + str(k))

    assert_tree(want_m, got_m)
    assert_tree(want_s, got_s)


def _assert_tree(a, b, path="", rtol=2e-4, atol=2e-5):
    assert set(a) == set(b), path
    for k in a:
        if isinstance(a[k], dict):
            _assert_tree(a[k], b[k], path + "/" + str(k), rtol, atol)
        else:
            np.testing.assert_allclose(
                float(b[k]), float(a[k]), rtol=rtol, atol=atol,
                err_msg=path + "/" + str(k))


def test_device_human_evaluation_equals_host(rng):
    """human_evaluation on device rows == the host sweep, including the
    mm_dropna=False quirk (a <3-fixation subject NaNs the printed
    MultiMatch human baseline) and the leave-one-out best groups."""
    from scanpaths_tpu.metrics.device_eval import human_evaluation_device

    batches = []
    all_preds = []
    for b in range(2):
        gts, names = [], []
        for i in range(3):
            # one short subject exercises the NaN path
            ls = [2 if (b == 1 and i == 0 and s == 2) else
                  int(rng.integers(3, 9)) for s in range(4)]
            gts.append([_grid_path(rng, l) for l in ls])
            names.append(f"img_{b}_{i}.jpg")
        gt_fix, gt_len, gt_mask, _, _ = _pad_batch(
            gts, [_grid_path(rng, 5)] * len(gts))
        batches.append({"fix_vectors": gts, "img_names": names,
                        "gt_fix": gt_fix, "gt_len": gt_len,
                        "gt_mask": gt_mask})
        all_preds.extend(v for g in gts for v in g)

    want_m, want_s, want_img = heval.human_evaluation(iter(batches))

    spec_wd, spec_wod = _specs([b["fix_vectors"][i] for b in batches
                                for i in range(3)], all_preds)
    got_m, got_s, got_img = human_evaluation_device(
        iter(batches), spec_wd, spec_wod)

    _assert_tree(want_m, got_m)
    _assert_tree(want_s, got_s)
    assert set(want_img) == set(got_img)
    for k in want_img:
        np.testing.assert_allclose(got_img[k], want_img[k],
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_device_human_evaluation_equals_host_air(rng):
    from scanpaths_tpu.metrics.device_eval import human_evaluation_device

    gts, perfs, qids = [], [], []
    for i in range(4):
        subj = [_grid_path(rng, int(rng.integers(3, 9)))
                for _ in range(4)]
        gts.append(subj)
        perfs.append([bool(rng.integers(0, 2)) for _ in subj])
        qids.append(f"q{i}")
    perfs[0] = [True, True, False, False]
    perfs[1] = [False, False, False, False]  # empty 'right' bucket
    gt_fix, gt_len, gt_mask, _, _ = _pad_batch(
        gts, [_grid_path(rng, 5)] * len(gts))
    batch = {"fix_vectors": gts, "performances": perfs,
             "question_ids": qids, "gt_fix": gt_fix, "gt_len": gt_len,
             "gt_mask": gt_mask}

    want_m, want_s, want_q = heval.human_evaluation(iter([batch]),
                                                    task="air")
    spec_wd, spec_wod = _specs(gts, [v for g in gts for v in g])
    got_m, got_s, got_q = human_evaluation_device(
        iter([batch]), spec_wd, spec_wod, task="air")

    for cat in ("all", "right_answer", "wrong_answer"):
        _assert_tree(want_m[cat], got_m[cat], path=cat)
        _assert_tree(want_s[cat], got_s[cat], path=cat)
    assert set(want_q) == set(got_q)
    for q in want_q:
        for flag in (True, False):
            np.testing.assert_allclose(got_q[q][flag], want_q[q][flag],
                                       rtol=2e-4, atol=2e-5,
                                       err_msg=f"{q}/{flag}")


def test_device_sweep_equals_host_air_bucketed(rng):
    gts, preds, perfs = [], [], []
    for i in range(5):
        subj = [_grid_path(rng, int(rng.integers(3, 9))) for _ in range(4)]
        gts.append(subj)
        preds.append(_grid_path(rng, int(rng.integers(3, 9))))
        perfs.append([bool(rng.integers(0, 2)) for _ in subj])
    perfs[0] = [True, True, False, False]
    allocs = [True, False, True, False, True]

    want_m, want_s, _ = heval.evaluation_performance_related(
        gts, preds, perfs, allocs)

    spec_wd, spec_wod = _specs(gts, preds)
    sweep = DeviceSweep(spec_wd, spec_wod)
    gt_fix, gt_len, gt_mask, pred_fix, pred_len = _pad_batch(gts, preds)
    # the trainer adds per allocated stream; emulate per-image allocation
    # by two single-image adds per alloc flag value
    for i in range(len(preds)):
        sweep.add_batch_air(gt_fix[i:i + 1], gt_len[i:i + 1],
                            gt_mask[i:i + 1], pred_fix[i:i + 1],
                            pred_len[i:i + 1], [perfs[i]], allocs[i])
    got_m, got_s = sweep.result()

    for cat in ("all", "right_answer", "wrong_answer"):
        def assert_tree(a, b, path=""):
            for k in a:
                if isinstance(a[k], dict):
                    assert_tree(a[k], b[k], path + "/" + str(k))
                else:
                    np.testing.assert_allclose(
                        float(b[k]), float(a[k]), rtol=2e-4, atol=2e-5,
                        err_msg=cat + path + "/" + str(k))
        assert_tree(want_m[cat], got_m[cat])
        assert_tree(want_s[cat], got_s[cat])


def test_sweep_overflow_counter_fires_on_absurd_durations(rng):
    """An early-training model can sample durations whose TempBin
    expansion exceeds the split-derived w/-duration table bound; the
    device sweep prefix-truncates those rollouts (documented,
    trainer._eval_specs) and must COUNT them rather than diverge
    silently from the host suite."""
    gts = [[_grid_path(rng, 5) for _ in range(3)] for _ in range(4)]
    preds = [_grid_path(rng, 5) for _ in range(4)]
    # one pathological rollout: 5 fixations x 40 s = 4000 symbols at
    # TempBin 50 >> the 64-symbol table below
    preds[2]["duration"][:] = 40.0
    spec_wd = jm.ScanMatchSpec(temp_bin=50.0, max_symbols=64)
    spec_wod = jm.ScanMatchSpec(temp_bin=0.0, max_symbols=8)
    sweep = DeviceSweep(spec_wd, spec_wod)
    sweep.add_batch(*_pad_batch(gts, preds))
    assert sweep.overflow == {"count": 1, "total": 4, "frac": 0.25}
    # a sane second batch leaves the counter untouched
    sweep.add_batch(*_pad_batch(gts, [_grid_path(rng, 5)
                                      for _ in range(4)]))
    assert sweep.overflow["count"] == 1 and sweep.overflow["total"] == 8
    # the AiR path counts too
    sweep2 = DeviceSweep(spec_wd, spec_wod)
    gt_fix, gt_len, gt_mask, pred_fix, pred_len = _pad_batch(gts, preds)
    sweep2.add_batch_air(gt_fix, gt_len, gt_mask, pred_fix, pred_len,
                         [[True, False, True]] * 4, True)
    assert sweep2.overflow["count"] == 1
