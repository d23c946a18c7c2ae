"""Evaluation-sweep parity vs the EXECUTED reference: import
OSIE/utils/evaluation.py (a namespace-package import from the read-only
reference tree), shim its ``multimatch_gaze`` dependency (the package
cannot be pip-installed offline), and compare the full ``evaluation``,
``human_evaluation`` and ``pairs_eval`` sweeps on the same random
scanpath sets.  This executes the reference's grouping, NaN-row
dropping, best-per-image selection, and normalization logic — nothing
is hand-copied.

The shim is ``tests/mm_oracle.py`` — the package-faithful heap-Dijkstra
implementation — while this framework's own sweep uses the production
DP implementation (scanpaths_tpu/metrics/multimatch.py).  The two are
structurally independent (see tests/test_multimatch_parity.py), so the
MultiMatch columns here are NOT self-validated: agreement requires two
different algorithms to produce identical numbers through the whole
reference sweep."""

import sys
import types

import numpy as np
import pytest

import mm_oracle
from scanpaths_tpu.core.grid import fix_vector
from scanpaths_tpu.metrics import evaluation as ours
from scanpaths_tpu.metrics.scanmatch import make_scanmatch_pair


@pytest.fixture(scope="module")
def ref_eval():
    shim = types.ModuleType("multimatch_gaze")
    shim.docomparison = mm_oracle.docomparison
    sys.modules.setdefault("multimatch_gaze", shim)
    sys.path.insert(0, "/root/reference/OSIE")
    try:
        import utils.evaluation as ref  # noqa: PLC0415
        yield ref
    finally:
        sys.path.remove("/root/reference/OSIE")


def _paths(rng, n_images=4, n_subjects=3):
    gts, preds = [], []
    for i in range(n_images):
        subj = []
        for s in range(n_subjects):
            # one deliberately short GT triggers the MultiMatch NaN path
            l = 2 if (i == 1 and s == 0) else int(rng.integers(4, 9))
            subj.append(fix_vector(rng.uniform(0, 320, l),
                                   rng.uniform(0, 240, l),
                                   rng.uniform(0.1, 0.6, l)))
        gts.append(subj)
        lp = int(rng.integers(4, 9))
        preds.append(fix_vector(rng.uniform(0, 320, lp),
                                rng.uniform(0, 240, lp),
                                rng.uniform(0.1, 0.6, lp)))
    return gts, preds


def _assert_tree_close(got, want, path="", rtol=1e-6):
    assert set(got) == set(want), (path, set(got), set(want))
    for k in want:
        if isinstance(want[k], dict):
            _assert_tree_close(got[k], want[k], path + "/" + str(k),
                               rtol=rtol)
        else:
            np.testing.assert_allclose(
                float(got[k]), float(want[k]), rtol=rtol, atol=1e-9,
                err_msg=f"{path}/{k}")


def test_evaluation_sweep_matches_reference(ref_eval):
    rng = np.random.default_rng(7)
    gts, preds = _paths(rng)
    want, want_std, _ = ref_eval.evaluation(gts, preds)
    got, got_std, _ = ours.evaluation(gts, preds)
    _assert_tree_close(got, want)
    _assert_tree_close(got_std, want_std)


def test_human_evaluation_matches_reference(ref_eval):
    rng = np.random.default_rng(8)
    gts, _ = _paths(rng, n_images=3, n_subjects=4)
    batches = [{"fix_vectors": gts[:2], "img_names": ["a.jpg", "b.jpg"]},
               {"fix_vectors": gts[2:], "img_names": ["c.jpg"]}]
    want, want_std, _ = ref_eval.human_evaluation(batches)
    got, got_std, _ = ours.human_evaluation(batches, task="osie")
    _assert_tree_close(got, want)
    _assert_tree_close(got_std, want_std)


def test_pairs_eval_matches_reference(ref_eval):
    rng = np.random.default_rng(9)
    gts, preds = _paths(rng)
    sm_wd, sm_wod = make_scanmatch_pair(320, 240)
    # the reference builds its own ScanMatch objects with identical
    # config; pass OURS through its API to keep a single source of truth
    RefSM = ref_eval.ScanMatch
    ref_wd = RefSM(Xres=320, Yres=240, Xbin=16, Ybin=12, Offset=(0, 0),
                   TempBin=50, Threshold=3.5)
    ref_wod = RefSM(Xres=320, Yres=240, Xbin=16, Ybin=12, Offset=(0, 0),
                    Threshold=3.5)
    want = ref_eval.pairs_eval(gts, preds, ref_wd, ref_wod)
    got = ours.pairs_eval(gts, preds, sm_wd, sm_wod)
    np.testing.assert_allclose(np.asarray(got, np.float64),
                               np.asarray(want, np.float64),
                               rtol=1e-6, atol=1e-9)


@pytest.fixture()
def ref_eval_air():
    shim = types.ModuleType("multimatch_gaze")
    shim.docomparison = mm_oracle.docomparison
    sys.modules.setdefault("multimatch_gaze", shim)
    # the OSIE fixture may have cached a 'utils' namespace package
    for mod in [m for m in sys.modules if m.startswith("utils")]:
        del sys.modules[mod]
    sys.path.insert(0, "/root/reference/AiR")
    try:
        src = open("/root/reference/AiR/utils/evaluation.py").read()
        # the reference filters ndarray groups with `arr != []`, an
        # ambiguous idiom that raises under numpy 2; substitute its
        # intended emptiness check so the ORIGINAL logic can execute
        src = src.replace("if _ != []]", "if len(_) != 0]")
        ref = types.ModuleType("ref_air_evaluation")
        ref.__dict__["__file__"] = "/root/reference/AiR/utils/evaluation.py"
        exec(compile(src, ref.__file__, "exec"), ref.__dict__)
        yield ref
    finally:
        sys.path.remove("/root/reference/AiR")
        for mod in [m for m in sys.modules if m.startswith("utils")]:
            del sys.modules[mod]


def _swap_scanmatch(tree):
    """The AiR reference stores the with-duration ScanMatch score at the
    column it LABELS 'w/o duration' (AiR/utils/evaluation.py:52-65 vs
    :144-147); this framework labels consistently, so comparing against
    the executed reference requires swapping its two ScanMatch keys."""
    out = dict(tree)
    sm = tree["ScanMatch"]
    out["ScanMatch"] = {"w/o duration": sm["with duration"],
                        "with duration": sm["w/o duration"]}
    return out


def test_air_human_evaluation_matches_reference(ref_eval_air):
    rng = np.random.default_rng(11)
    gts, _ = _paths(rng, n_images=3, n_subjects=5)
    perfs = [[bool(rng.integers(0, 2)) for _ in g] for g in gts]
    perfs[0] = [True, True, False, False, True]   # both buckets non-empty
    batches = [{"fix_vectors": gts, "performances": perfs,
                "question_ids": ["q0", "q1", "q2"]}]
    want, want_std, _ = ref_eval_air.human_evaluation(batches)
    got, got_std, _ = ours.human_evaluation(batches, task="air")
    for cat in ("all", "right_answer", "wrong_answer"):
        _assert_tree_close(got[cat], _swap_scanmatch(want[cat]), "/" + cat)
        _assert_tree_close(got_std[cat], _swap_scanmatch(want_std[cat]),
                           "/std/" + cat)


def test_air_evaluation_performance_related_matches_reference(ref_eval_air):
    rng = np.random.default_rng(12)
    gts, preds = _paths(rng, n_images=4, n_subjects=4)
    perfs = [[bool(rng.integers(0, 2)) for _ in g] for g in gts]
    perfs[0] = [True, True, False, False]
    alloc = [True, False, True, False]
    want, want_std, _ = ref_eval_air.evaluation_performance_related(
        gts, preds, perfs, alloc)
    got, got_std, _ = ours.evaluation_performance_related(
        gts, preds, perfs, alloc)
    # the reference casts its per-sample rows to float32 before
    # aggregating (AiR/utils/evaluation.py:280-282); ours stays f64 —
    # tolerate the f32 rounding
    for cat in ("all", "right_answer", "wrong_answer"):
        _assert_tree_close(got[cat], _swap_scanmatch(want[cat]), "/" + cat,
                           rtol=1e-5)
        _assert_tree_close(got_std[cat], _swap_scanmatch(want_std[cat]),
                           "/std/" + cat, rtol=1e-5)


def test_air_rl_pair_functions_match_reference(ref_eval_air):
    rng = np.random.default_rng(13)
    gts, preds = _paths(rng, n_images=4, n_subjects=5)
    perfs = [[bool(rng.integers(0, 2)) for _ in g] for g in gts]
    perfs[0] = [True] * 5            # no poor subjects -> NaN diff group
    perfs[1] = [True, False, False, False, False]  # singleton good group
    sm_wd, sm_wod = make_scanmatch_pair(320, 240)
    RefSM = ref_eval_air.ScanMatch
    ref_wd = RefSM(Xres=320, Yres=240, Xbin=16, Ybin=12, Offset=(0, 0),
                   TempBin=50, Threshold=3.5)
    ref_wod = RefSM(Xres=320, Yres=240, Xbin=16, Ybin=12, Offset=(0, 0),
                    Threshold=3.5)

    for given in (True, False):
        want_s, want_d, want_ok = \
            ref_eval_air.pairs_eval_scanmatch_performance_related(
                gts, preds, ref_wd, ref_wod, perfs, given)
        got_s, got_d, got_ok = ours.pairs_eval_scanmatch_performance_related(
            gts, preds, sm_wd, sm_wod, perfs, given)
        np.testing.assert_allclose(got_s, want_s, rtol=1e-6)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-6)
        assert got_ok == want_ok

    want_gg, want_pp, want_gp = \
        ref_eval_air.gtpairs_eval_scanmatch_performance_related(
            gts, ref_wd, ref_wod, perfs)
    got_gg, got_pp, got_gp = ours.gtpairs_eval_scanmatch_performance_related(
        gts, sm_wd, sm_wod, perfs)
    np.testing.assert_allclose(got_gg, want_gg, rtol=1e-6)
    np.testing.assert_allclose(got_pp, want_pp, rtol=1e-6)
    np.testing.assert_allclose(got_gp, want_gp, rtol=1e-6)


@pytest.fixture()
def ref_eval_coco():
    shim = types.ModuleType("multimatch_gaze")
    shim.docomparison = mm_oracle.docomparison
    sys.modules.setdefault("multimatch_gaze", shim)
    for mod in [m for m in sys.modules if m.startswith("utils")]:
        del sys.modules[mod]
    sys.path.insert(0, "/root/reference/COCO_Search18")
    try:
        import utils.evaluation as ref  # noqa: PLC0415
        yield ref
    finally:
        sys.path.remove("/root/reference/COCO_Search18")
        for mod in [m for m in sys.modules if m.startswith("utils")]:
            del sys.modules[mod]


def test_coco_pairs_eval_scanmatch_matches_reference(ref_eval_coco):
    rng = np.random.default_rng(14)
    gts, preds = _paths(rng, n_images=5, n_subjects=3)
    sm_wd, sm_wod = make_scanmatch_pair(320, 240)
    RefSM = ref_eval_coco.ScanMatch
    ref_wd = RefSM(Xres=320, Yres=240, Xbin=16, Ybin=12, Offset=(0, 0),
                   TempBin=50, Threshold=3.5)
    ref_wod = RefSM(Xres=320, Yres=240, Xbin=16, Ybin=12, Offset=(0, 0),
                    Threshold=3.5)
    want = ref_eval_coco.pairs_eval_scanmatch(gts, preds, ref_wd, ref_wod)
    got = ours.pairs_eval_scanmatch(gts, preds, sm_wd, sm_wod)
    np.testing.assert_allclose(np.asarray(got, np.float64),
                               np.asarray(want, np.float64), rtol=1e-6)
