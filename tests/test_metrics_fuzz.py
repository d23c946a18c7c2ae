"""Multi-seed adversarial fuzz: device metric kernels vs host oracles.

The single-seed tests in test_metrics_jax.py prove the kernels on
benign random batches; this file sweeps several seeds and deliberately
hostile constructions — length-1 scanpaths, identical pairs, coincident
consecutive fixations (zero-amplitude saccades), near-boundary and
zero coordinates, zero durations mixed with long ones — through all
nine metric columns at once (the ``pair_rows`` production entry point)
and asserts bitwise/tolerance agreement with the host oracles that are
themselves golden-tested against the executed reference
(tests/test_metrics_host.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from scanpaths_tpu.metrics import jax_metrics as jm
from scanpaths_tpu.metrics.device_eval import pair_rows
from scanpaths_tpu.metrics.multimatch import docomparison
from scanpaths_tpu.metrics.scanmatch import ScanMatch
from scanpaths_tpu.metrics.vame import (
    scaled_time_delay_embedding_similarity,
    string_edit_distance,
)

L = 18
SPEC_WD = jm.ScanMatchSpec(temp_bin=50.0, max_symbols=352)
SPEC_WOD = jm.ScanMatchSpec(temp_bin=0.0, max_symbols=L)


def _uniform(rng, l):
    f = np.zeros((L, 3), np.float32)
    f[:l, 0] = rng.uniform(0, 320, l)
    f[:l, 1] = rng.uniform(0, 240, l)
    f[:l, 2] = rng.uniform(0.03, 0.9, l)
    return f, l


def _hostile_pairs(rng):
    """A batch of (fix_a, len_a, fix_b, len_b) mixing benign and
    adversarial constructions."""
    pairs = []
    # benign random lengths
    for _ in range(8):
        pairs.append(_uniform(rng, int(rng.integers(1, L + 1)))
                     + _uniform(rng, int(rng.integers(1, L + 1))))
    # length-1 vs length-1 and length-1 vs long
    pairs.append(_uniform(rng, 1) + _uniform(rng, 1))
    pairs.append(_uniform(rng, 1) + _uniform(rng, L))
    # identical scanpaths
    f, l = _uniform(rng, int(rng.integers(3, L + 1)))
    pairs.append((f, l, f.copy(), l))
    # coincident consecutive fixations (zero-amplitude saccades)
    f, l = _uniform(rng, 8)
    f[2:6, :2] = f[2, :2]
    g, m = _uniform(rng, 6)
    g[1:4, :2] = g[1, :2]
    pairs.append((f, l, g, m))
    # near-boundary and zero coordinates
    f, l = _uniform(rng, 5)
    f[0, :2] = (0.0, 0.0)
    f[1, :2] = (319.999, 239.999)
    f[2, :2] = (0.0, 239.999)
    g, m = _uniform(rng, 4)
    g[0, :2] = (319.999, 0.0)
    pairs.append((f, l, g, m))
    # zero durations (empty TempBin expansion) mixed with long ones
    f, l = _uniform(rng, 6)
    f[:3, 2] = 0.01
    g, m = _uniform(rng, 6)
    g[:, 2] = 0.01
    pairs.append((f, l, g, m))
    # all-zero-duration against itself
    f, l = _uniform(rng, 4)
    f[:, 2] = 0.0
    pairs.append((f, l, f.copy(), l))
    return pairs


def _stack(pairs):
    b = len(pairs)
    fa = np.zeros((b, L, 3), np.float32)
    la = np.zeros((b,), np.int32)
    fb = np.zeros((b, L, 3), np.float32)
    lb = np.zeros((b,), np.int32)
    for i, (f, l, g, m) in enumerate(pairs):
        fa[i], la[i], fb[i], lb[i] = f, l, g, m
    return fa, la, fb, lb


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_pair_rows_fuzz_vs_host_oracles(seed):
    rng = np.random.default_rng(seed)
    fa, la, fb, lb = _stack(_hostile_pairs(rng))
    b = len(la)

    # production entry point: GT = the a-side as a single "subject"
    rows = np.asarray(pair_rows(
        SPEC_WD, SPEC_WOD, jnp.asarray(fa)[:, None], jnp.asarray(la)[:, None],
        jnp.asarray(fb), jnp.asarray(lb)))[:, 0]          # [b, 9]

    sm_wd = ScanMatch(Xres=320, Yres=240, Xbin=16, Ybin=12, TempBin=50.0,
                      Threshold=3.5)
    sm_wod = ScanMatch(Xres=320, Yres=240, Xbin=16, Ybin=12, TempBin=0.0,
                       Threshold=3.5)

    def host_sm(sm, f1, l1, f2, l2):
        a = np.column_stack([f1[:l1, 0], f1[:l1, 1], f1[:l1, 2] * 1000.0])
        c = np.column_stack([f2[:l2, 0], f2[:l2, 1], f2[:l2, 2] * 1000.0])
        with np.errstate(invalid="ignore"):
            score, _, _ = sm.match(sm.fixationToSequence(a).astype(np.int32),
                                   sm.fixationToSequence(c).astype(np.int32))
        return score

    for i in range(b):
        ctx = f"seed {seed} pair {i}"
        a, al = fa[i, :la[i]], int(la[i])
        c, cl = fb[i, :lb[i]], int(lb[i])

        mm_host = np.asarray(
            docomparison(a, c, screensize=(320, 240)), np.float64)
        # elementwise: partial NaN (e.g. the duration column on
        # all-zero durations) must match column for column
        np.testing.assert_allclose(rows[i, :5], mm_host, rtol=3e-5,
                                   atol=3e-5, equal_nan=True, err_msg=ctx)

        wod = host_sm(sm_wod, fa[i], al, fb[i], cl)
        wd = host_sm(sm_wd, fa[i], al, fb[i], cl)
        np.testing.assert_allclose(rows[i, 5], wod, rtol=1e-5, atol=1e-6,
                                   equal_nan=True, err_msg=ctx)
        np.testing.assert_allclose(rows[i, 6], wd, rtol=1e-5, atol=1e-6,
                                   equal_nan=True, err_msg=ctx)

        sed = string_edit_distance((240, 320, 3), a, c)
        assert rows[i, 7] == sed, (ctx, rows[i, 7], sed)

        stde = scaled_time_delay_embedding_similarity(a, c, (240, 320, 3))
        np.testing.assert_allclose(rows[i, 8], stde, rtol=1e-4, err_msg=ctx)


def _decode_like(rng, l, repeat_prob=0.5):
    """A prediction the decoder could emit: fixations on grid-cell
    centers (8 px pitch at the 240x320/30x40 geometry), frequently
    REPEATING the previous saccade — which makes whole alignment-DP
    columns exactly tied — with continuous LogNormal-ish durations."""
    f = np.zeros((L, 3), np.float32)
    col = rng.integers(0, 40)
    row = rng.integers(0, 30)
    dc, dr = 0, 0
    for t in range(l):
        f[t, 0] = 8 * col + 4
        f[t, 1] = 8 * row + 4
        if t == 0 or rng.random() > repeat_prob or (dc == 0 and dr == 0):
            dc = int(rng.integers(-6, 7))
            dr = int(rng.integers(-5, 6))
        col = int(np.clip(col + dc, 0, 39))
        row = int(np.clip(row + dr, 0, 29))
    f[:l, 2] = np.exp(rng.normal(-1.2, 0.8, l)).astype(np.float32)
    return f, l


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_multimatch_decode_like_ties_fuzz(seed):
    """Continuous near-tie sensitivity (VERDICT r2 item 8): decoded
    scanpaths land on grid centers and often repeat saccades, creating
    EXACT alignment ties that float noise in the device DP used to
    break differently from the host — with path-dependent position/
    duration swings (the joint AiR ~1% regression).  Sweep many
    GT-continuous vs decode-like pairs through the kernel and require
    column-for-column agreement with the host oracle."""
    rng = np.random.default_rng(seed)
    pairs = []
    for _ in range(24):
        gt = _uniform(rng, int(rng.integers(3, L + 1)))
        pred = _decode_like(rng, int(rng.integers(3, 9)))
        pairs.append(gt + pred)
    fa, la, fb, lb = _stack(pairs)
    dev = np.asarray(jm.multimatch_scores(
        jnp.asarray(fa), jnp.asarray(la), jnp.asarray(fb),
        jnp.asarray(lb)))
    for i in range(len(pairs)):
        host = np.asarray(docomparison(fa[i, :la[i]], fb[i, :lb[i]],
                                       screensize=(320, 240)), np.float64)
        np.testing.assert_allclose(
            dev[i], host, rtol=3e-5, atol=3e-5, equal_nan=True,
            err_msg=f"seed {seed} pair {i}")


def test_pair_rows_identical_scanpaths_perfect_scores(rng):
    """Identity pairs: ScanMatch = 1, SED = 0, MultiMatch = 1."""
    fa, la, _, _ = _stack([_uniform(rng, int(rng.integers(3, L + 1)))
                           + _uniform(rng, 1) for _ in range(6)])
    rows = np.asarray(pair_rows(
        SPEC_WD, SPEC_WOD, jnp.asarray(fa)[:, None], jnp.asarray(la)[:, None],
        jnp.asarray(fa), jnp.asarray(la)))[:, 0]
    np.testing.assert_allclose(rows[:, :5], 1.0, atol=1e-6)   # MultiMatch
    np.testing.assert_allclose(rows[:, 5], 1.0, atol=1e-6)    # SM w/o dur
    np.testing.assert_allclose(rows[:, 6], 1.0, atol=1e-6)    # SM w/ dur
    np.testing.assert_array_equal(rows[:, 7], 0.0)            # SED
