"""The in-graph OSIE RL reward vs the host pairs_eval oracle on a batch
containing the awkward NaN sources (too-short scanpaths, zero-duration
pairs) — closing the documented approximation from round 1: the device
path now reproduces the reference's row-voiding exactly
(reference OSIE/utils/evaluation.py:284-340)."""

import numpy as np
import pytest

import jax.numpy as jnp

from scanpaths_tpu.core.grid import GridSpec, fix_vector
from scanpaths_tpu.metrics.evaluation import pairs_eval
from scanpaths_tpu.metrics.scanmatch import make_scanmatch_pair
from scanpaths_tpu.train.steps import RLConfig, _pair_grids

S, L, T = 3, 10, 8


def _mk(rng, n_fix, zero_dur=False):
    x = rng.uniform(0, 320, n_fix)
    y = rng.uniform(0, 240, n_fix)
    d = np.zeros(n_fix) if zero_dur else rng.uniform(0.1, 0.5, n_fix)
    return fix_vector(x, y, d)


def test_osie_reward_grids_match_host_pairs_eval():
    rng = np.random.default_rng(42)
    # sample 0: plain; sample 1: one GT too short (<3 fixations);
    # sample 2: pred all-zero durations + one all-zero-duration GT
    # (max(d1,d2)=0 along the alignment -> MultiMatch duration NaN for
    # exactly that pair, the others survive with dur-diff 1);
    # sample 3: every GT too short -> the whole sample voids (the
    # reference's reject-and-resample trigger)
    gts = [
        [_mk(rng, 6), _mk(rng, 5), _mk(rng, 8)],
        [_mk(rng, 2), _mk(rng, 7), _mk(rng, 6)],
        [_mk(rng, 5), _mk(rng, 6, zero_dur=True), _mk(rng, 7)],
        [_mk(rng, 2), _mk(rng, 1), _mk(rng, 2)],
    ]
    preds = [_mk(rng, 7), _mk(rng, 6), _mk(rng, 5, zero_dur=True),
             _mk(rng, 6)]
    n = len(gts)

    # ---- host oracle ----
    sm_wd, sm_wod = make_scanmatch_pair(320, 240)
    host = pairs_eval(gts, preds, sm_wd, sm_wod)        # [N, 11]

    # ---- device grids, aggregated the way rl_step does ----
    gt_fix = np.zeros((n, S, L, 3), np.float32)
    gt_len = np.zeros((n, S), np.int32)
    for i, subj in enumerate(gts):
        for j, v in enumerate(subj):
            arr = np.stack([v["start_x"], v["start_y"], v["duration"]], -1)
            gt_fix[i, j, :len(arr)] = arr
            gt_len[i, j] = len(arr)
    gt_mask = np.ones((n, S), np.float32)
    pred_fix = np.zeros((1, n, T, 3), np.float32)
    pred_len = np.zeros((1, n), np.int32)
    for i, v in enumerate(preds):
        arr = np.stack([v["start_x"], v["start_y"], v["duration"]], -1)
        pred_fix[0, i, :len(arr)] = arr
        pred_len[0, i] = len(arr)

    cfg = RLConfig(task="osie", grid=GridSpec(), rl_sample_number=1,
                   max_symbols_wd=192, max_symbols_wod=L)
    grids = _pair_grids(cfg, jnp.asarray(gt_fix), jnp.asarray(gt_len),
                        jnp.asarray(gt_mask), jnp.asarray(pred_fix),
                        jnp.asarray(pred_len), full=True)
    mm = np.asarray(grids["mm"])[0]                     # [N, S, 5]
    wod = np.asarray(grids["wod"])[0]
    wd = np.asarray(grids["wd"])[0]
    sed = np.asarray(grids["sed"])[0]
    stde = np.asarray(grids["stde"])[0]

    pair_ok = ~np.isnan(mm).any(-1)                     # [N, S]
    total = S

    def agg_mean(x):
        return np.where(np.isnan(x), 0.0, x * pair_ok).sum(-1) / total

    # sample 1 drops exactly the short-GT row; sample 2 exactly the
    # zero-duration x zero-duration pair; sample 3 voids entirely like
    # the host NaN row
    assert pair_ok[1].tolist() == [False, True, True]
    assert pair_ok[2].tolist() == [True, False, True]
    assert not pair_ok[3].any()
    assert np.isnan(host[3]).all()

    for i in range(3):      # samples with valid rows
        got_mm = agg_mean(np.moveaxis(mm, -1, 0))[:, i]
        np.testing.assert_allclose(got_mm, host[i, :5], rtol=2e-5,
                                   atol=2e-6, err_msg=f"mm sample {i}")
        assert agg_mean(wod)[i] == pytest.approx(host[i, 5], rel=2e-5)
        assert agg_mean(wd)[i] == pytest.approx(host[i, 6], rel=2e-5)
        assert agg_mean(sed)[i] == pytest.approx(host[i, 7], rel=2e-5)
        assert agg_mean(stde)[i] == pytest.approx(host[i, 8], rel=2e-5)
        assert sed[i][pair_ok[i]].min() == pytest.approx(host[i, 9])
        assert stde[i][pair_ok[i]].max() == pytest.approx(host[i, 10],
                                                          rel=2e-5)
