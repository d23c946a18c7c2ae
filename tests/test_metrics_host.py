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
