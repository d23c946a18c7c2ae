"""Host metric oracles vs. golden fixtures recorded from the reference
implementation (tools/gen_goldens.py)."""

import json

import numpy as np
import pytest

from scanpaths_tpu.metrics.multimatch import docomparison
from scanpaths_tpu.metrics.scanmatch import ScanMatch
from scanpaths_tpu.metrics.vame import (
    scaled_time_delay_embedding_similarity,
    string_edit_distance,
)


def load(fixtures_dir, name):
    with open(fixtures_dir / name) as f:
        return json.load(f)


def test_scanmatch_sequences_and_scores(fixtures_dir):
    cases = load(fixtures_dir, "scanmatch_goldens.json")
    assert len(cases) > 0
    for case in cases:
        cfg = dict(case["cfg"])
        cfg["Offset"] = tuple(cfg.get("Offset", (0, 0)))
        sm = ScanMatch(**cfg)
        fix1 = np.array(case["fix1"])
        fix2 = np.array(case["fix2"])
        if sm.TempBin == 0:
            fix1, fix2 = fix1[:, :2], fix2[:, :2]
        seq1 = sm.fixationToSequence(fix1).astype(np.int32)
        seq2 = sm.fixationToSequence(fix2).astype(np.int32)
        np.testing.assert_array_equal(seq1, np.array(case["seq1"], np.int32))
        np.testing.assert_array_equal(seq2, np.array(case["seq2"], np.int32))
        score, _, _ = sm.match(seq1, seq2)
        assert score == pytest.approx(case["score"], rel=1e-9, abs=1e-12)


def test_scanmatch_symmetry_and_selfmatch():
    sm = ScanMatch(Xres=320, Yres=240, Xbin=16, Ybin=12, Threshold=3.5)
    rng = np.random.default_rng(7)
    a = rng.integers(0, 192, size=12)
    b = rng.integers(0, 192, size=9)
    s_ab, _, _ = sm.match(a, b)
    s_ba, _, _ = sm.match(b, a)
    assert s_ab == pytest.approx(s_ba)
    s_aa, _, _ = sm.match(a, a)
    assert s_aa == pytest.approx(1.0)


def test_vame_goldens(fixtures_dir):
    cases = load(fixtures_dir, "vame_goldens.json")
    for case in cases:
        f1 = np.array(case["fix1"])
        f2 = np.array(case["fix2"])
        shape = tuple(case["shape"]) + (3,)
        sed = string_edit_distance(shape, f1, f2)
        assert sed == case["sed"]
        stde = scaled_time_delay_embedding_similarity(f1, f2, shape)
        assert stde == pytest.approx(case["stde"], rel=1e-9)


def test_multimatch_basic_properties():
    rng = np.random.default_rng(3)
    f1 = np.stack([rng.uniform(0, 320, 8), rng.uniform(0, 240, 8),
                   rng.uniform(0.05, 0.6, 8)], axis=1)
    f2 = np.stack([rng.uniform(0, 320, 6), rng.uniform(0, 240, 6),
                   rng.uniform(0.05, 0.6, 6)], axis=1)
    r = docomparison(f1, f2, screensize=[320, 240])
    assert len(r) == 5
    assert all(0.0 <= v <= 1.0 for v in r)
    # self-comparison is a perfect score on every dimension
    r_self = docomparison(f1, f1, screensize=[320, 240])
    assert np.allclose(r_self, 1.0)
    # symmetric
    r_rev = docomparison(f2, f1, screensize=[320, 240])
    assert np.allclose(r, r_rev, atol=1e-12)


def test_multimatch_short_scanpaths_nan():
    f1 = np.array([[10.0, 10.0, 0.2], [50.0, 60.0, 0.3]])
    f2 = np.array([[10.0, 10.0, 0.2], [50.0, 60.0, 0.3], [90.0, 20.0, 0.1]])
    assert np.all(np.isnan(docomparison(f1, f2)))
    assert np.all(np.isnan(docomparison(f2, f1)))
    assert not np.any(np.isnan(docomparison(f2, f2)))


def test_multimatch_align_matches_bruteforce(rng):
    """The lattice alignment must be a true minimum-cost monotone path:
    compare the DP's path cost against exhaustive enumeration."""
    import itertools

    from scanpaths_tpu.metrics.multimatch import _align

    def brute_cost(m):
        n, k = m.shape
        best = np.inf
        # enumerate move sequences (R/D/G) reaching (n-1, k-1)
        def walk(i, j, cost):
            nonlocal best
            if cost >= best:
                return
            if (i, j) == (n - 1, k - 1):
                best = min(best, cost)
                return
            for di, dj in ((1, 1), (1, 0), (0, 1)):
                ni, nj = i + di, j + dj
                if ni < n and nj < k:
                    walk(ni, nj, cost + m[ni, nj])
        walk(0, 0, 0.0)
        return best

    for trial in range(20):
        n, k = rng.integers(2, 6, size=2)
        m = rng.uniform(0, 10, size=(n, k))
        path = _align(m)
        cost = sum(m[i, j] for i, j in path) - m[0, 0]
        assert path[0] == (0, 0) and path[-1] == (n - 1, k - 1)
        np.testing.assert_allclose(cost, brute_cost(m), rtol=1e-12,
                                   err_msg=f"trial {trial}")


def test_multimatch_hand_golden():
    """Hand-computable golden: two 3-fixation paths -> 2x2 lattice.

    path1: (0,0) d=0.2 -> (100,0) d=0.2 -> (100,100) d=0.2
      saccades: (100,0), (0,100); thetas 0, pi/2; rhos 100, 100
    path2: (0,0) d=0.4 -> (200,0) d=0.2 -> (200,100) d=0.2
      saccades: (200,0), (0,100); thetas 0, pi/2; rhos 200, 100
    M = [[100, sqrt(100^2+200^2)], [sqrt(100^2+100^2), 0]]
    best path: (0,0) -> (1,1) diag, cost 0; cells [(0,0), (1,1)]
    vector diffs along path: [100, 0] -> median 50
    direction diffs: [0, 0] -> 0
    length diffs: [100, 0] -> 50
    position diffs (saccade starts): [0, hypot(100,0)=100] -> 50
    duration diffs: [|0.2-0.4|/0.4, 0] -> 0.25
    screen (320,240): diag = 400
    """
    from scanpaths_tpu.metrics.multimatch import docomparison

    p1 = np.array([[0, 0, 0.2], [100, 0, 0.2], [100, 100, 0.2]])
    p2 = np.array([[0, 0, 0.4], [200, 0, 0.2], [200, 100, 0.2]])
    got = docomparison(p1, p2, screensize=(320, 240))
    want = [1 - 50 / 800.0, 1.0, 1 - 50 / 400.0, 1 - 50 / 400.0, 1 - 0.25]
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_vame_saliency_metrics():
    """AUC-Judd / KLdiv / NSS sanity + analytic cases (reference
    visual_attention_metrics.py:41-191)."""
    from scanpaths_tpu.metrics.vame import auc_judd, kl_div, nss

    rng = np.random.default_rng(7)
    fixmap = np.zeros((24, 32))
    fixmap[5, 6] = 1
    fixmap[10, 20] = 1
    # a saliency map that equals the fixation map is a perfect predictor
    assert auc_judd(fixmap.astype(float), fixmap, jitter=False) > 0.99
    # a uniform-random map should hover near chance
    auc_rand = auc_judd(rng.random(fixmap.shape), fixmap, rng=rng)
    assert 0.05 < auc_rand < 0.95
    # KLdiv of a map against itself is ~0, against a disjoint map large
    assert abs(kl_div(fixmap, fixmap)) < 1e-6
    other = np.zeros_like(fixmap)
    other[0, 0] = 1
    assert kl_div(other, fixmap) > 5
    # NSS: z-scored value at the fixated cells
    s = fixmap.astype(float)
    expect = (1 / s.max() - s.mean() / s.max()) / (s / s.max()).std(ddof=1)
    np.testing.assert_allclose(nss(s, fixmap), expect, rtol=1e-9)
    assert np.isnan(nss(s, np.zeros_like(fixmap)))
