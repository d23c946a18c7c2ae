"""Host evaluation sweeps: structure, internal consistency, and the RL
pair-reward functions."""

import numpy as np
import pytest

from scanpaths_tpu.core.grid import fix_vector
from scanpaths_tpu.metrics import evaluation as he
from scanpaths_tpu.metrics.scanmatch import make_scanmatch_pair


def rand_fv(rng, lo=4, hi=10):
    l = int(rng.integers(lo, hi))
    return fix_vector(rng.uniform(0, 319, l), rng.uniform(0, 239, l),
                      rng.uniform(0.08, 0.7, l))


@pytest.fixture()
def gt_sets(rng):
    return [[rand_fv(rng) for _ in range(4)] for _ in range(3)]


def test_evaluation_structure_and_selfmatch(rng, gt_sets):
    preds = [g[0] for g in gt_sets]  # predict = first subject
    metrics, stds, per_image = he.evaluation(gt_sets, preds)
    assert set(metrics) == {"MultiMatch", "ScanMatch", "VAME"}
    assert set(metrics["ScanMatch"]) == {"w/o duration", "with duration"}
    assert len(per_image) == 3
    # per-image best SED over subjects includes the self-match (0)
    assert metrics["VAME"]["SED_best"] == 0.0
    assert 0 < metrics["ScanMatch"]["w/o duration"] <= 1.0


def test_pairs_eval_columns(rng, gt_sets):
    sm_wd, sm_wod = make_scanmatch_pair()
    preds = [rand_fv(rng) for _ in range(3)]
    rows = he.pairs_eval(gt_sets, preds, sm_wd, sm_wod)
    assert rows.shape == (3, 11)
    assert not np.any(np.isnan(rows))
    # short prediction (<3 fixations) voids MultiMatch -> all-NaN row
    short = [fix_vector([10.0, 50.0], [10.0, 50.0], [0.2, 0.2])] * 3
    rows2 = he.pairs_eval(gt_sets, short, sm_wd, sm_wod)
    assert np.all(np.isnan(rows2))


def test_pairs_eval_scanmatch_total_normalization(rng, gt_sets):
    sm_wd, sm_wod = make_scanmatch_pair()
    preds = [g[0] for g in gt_sets]
    rows = he.pairs_eval_scanmatch(gt_sets, preds, sm_wd, sm_wod)
    assert rows.shape == (3, 2)
    # self-match contributes 1.0; mean over TOTAL subjects <= 1
    assert np.all(rows > 0) and np.all(rows <= 1.0)


def test_air_performance_related(rng, gt_sets):
    sm_wd, sm_wod = make_scanmatch_pair()
    perfs = [[True, True, False, False]] * 3
    preds = [g[0] for g in gt_sets]
    same, diff, accept = he.pairs_eval_scanmatch_performance_related(
        gt_sets, preds, sm_wd, sm_wod, perfs, True)
    assert same.shape == (3, 2) and diff.shape == (3, 2)
    assert accept is True
    # same group (True) includes the self-match subject
    assert np.all(same[:, 0] >= diff[:, 0] - 1e9)  # shapes sane

    good, poor, cross = he.gtpairs_eval_scanmatch_performance_related(
        gt_sets, sm_wd, sm_wod, perfs)
    assert good.shape == (3, 2)
    assert not np.any(np.isnan(good))
    # singleton group -> NaN
    perfs1 = [[True, False, False, False]] * 3
    good1, _, cross1 = he.gtpairs_eval_scanmatch_performance_related(
        gt_sets, sm_wd, sm_wod, perfs1)
    assert np.all(np.isnan(good1))
    assert np.all(np.isnan(cross1))  # cross needs >1 in BOTH groups


def test_evaluation_performance_related_structure(rng, gt_sets):
    preds = [g[0] for g in gt_sets]
    perfs = [[True, True, False, False]] * 3
    alloc = [True, False, True]
    m, s, per = he.evaluation_performance_related(gt_sets, preds, perfs,
                                                  alloc)
    assert set(m) == {"all", "right_answer", "wrong_answer"}
    for cat in m.values():
        assert set(cat) == {"MultiMatch", "ScanMatch", "VAME"}
    assert len(per) == 3


class FakeLoader:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def test_human_evaluation_osie_and_air(rng, gt_sets):
    batches = [{"fix_vectors": gt_sets,
                "img_names": ["a.jpg", "b.jpg", "c.jpg"],
                "performances": [[True, True, False, False]] * 3,
                "question_ids": ["q1", "q2", "q3"]}]
    m, s, per = he.human_evaluation(FakeLoader(batches), task="osie")
    assert set(m) == {"MultiMatch", "ScanMatch", "VAME"}
    assert set(per) == {"a.jpg", "b.jpg", "c.jpg"}
    m2, s2, per2 = he.human_evaluation(FakeLoader(batches), task="air")
    assert set(m2) == {"all", "right_answer", "wrong_answer"}
    assert set(per2) == {"q1", "q2", "q3"}
    assert True in per2["q1"] and False in per2["q1"]
