"""Device (JAX) metric kernels vs. the host oracles on random padded
scanpath batches."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scanpaths_tpu.metrics import jax_metrics as jm
from scanpaths_tpu.metrics.scanmatch import ScanMatch
from scanpaths_tpu.metrics.vame import (
    scaled_time_delay_embedding_similarity,
    string_edit_distance,
)

L = 18  # static padded length


def random_batch(rng, b, min_len=1, max_len=L):
    lens = rng.integers(min_len, max_len + 1, size=b).astype(np.int32)
    fix = np.zeros((b, L, 3), np.float32)
    for i, l in enumerate(lens):
        fix[i, :l, 0] = rng.uniform(0, 320, l)
        fix[i, :l, 1] = rng.uniform(0, 240, l)
        fix[i, :l, 2] = rng.uniform(0.03, 0.9, l)  # seconds
    return fix, lens


def host_scanmatch(sm, f1, l1, f2, l2):
    a = np.column_stack([f1[:l1, 0], f1[:l1, 1], f1[:l1, 2] * 1000.0])
    b = np.column_stack([f2[:l2, 0], f2[:l2, 1], f2[:l2, 2] * 1000.0])
    s1 = sm.fixationToSequence(a).astype(np.int32)
    s2 = sm.fixationToSequence(b).astype(np.int32)
    score, _, _ = sm.match(s1, s2)
    return score


@pytest.mark.parametrize("temp_bin,max_symbols", [(0.0, L), (50.0, 352)])
def test_scanmatch_jax_matches_host(rng, temp_bin, max_symbols):
    b = 16
    f1, l1 = random_batch(rng, b)
    f2, l2 = random_batch(rng, b)
    spec = jm.ScanMatchSpec(temp_bin=temp_bin, max_symbols=max_symbols)
    fn = jax.jit(lambda *a: jm.scanmatch_scores(spec, *a))
    got = np.array(fn(jnp.array(f1), jnp.array(l1), jnp.array(f2),
                      jnp.array(l2)))
    sm = ScanMatch(Xres=320, Yres=240, Xbin=16, Ybin=12,
                   TempBin=temp_bin, Threshold=3.5)
    want = np.array([host_scanmatch(sm, f1[i], l1[i], f2[i], l2[i])
                     for i in range(b)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_scanmatch_jax_empty_expansion(rng):
    # durations so small that round(dur_ms/50) == 0 -> empty sequences
    f1, l1 = random_batch(rng, 4)
    f2, l2 = random_batch(rng, 4)
    f1[..., 2] = 0.01
    f2[0, :, 2] = 0.01
    spec = jm.ScanMatchSpec(temp_bin=50.0, max_symbols=64)
    got = np.array(jm.scanmatch_scores(
        spec, jnp.array(f1), jnp.array(l1), jnp.array(f2), jnp.array(l2)))
    sm = ScanMatch(Xres=320, Yres=240, Xbin=16, Ybin=12, TempBin=50.0,
                   Threshold=3.5)
    with np.errstate(invalid="ignore"):
        want = np.array([host_scanmatch(sm, f1[i], l1[i], f2[i], l2[i])
                         for i in range(4)])
    np.testing.assert_allclose(got, want, rtol=1e-5, equal_nan=True)


def test_sed_jax_matches_host(rng):
    b = 24
    f1, l1 = random_batch(rng, b)
    f2, l2 = random_batch(rng, b)
    got = np.array(jm.sed_scores(jnp.array(f1), jnp.array(l1),
                                 jnp.array(f2), jnp.array(l2)))
    want = np.array([
        string_edit_distance((240, 320, 3), f1[i, :l1[i]], f2[i, :l2[i]])
        for i in range(b)])
    np.testing.assert_array_equal(got, want)


def test_stde_jax_matches_host(rng):
    b = 24
    f1, l1 = random_batch(rng, b)
    f2, l2 = random_batch(rng, b)
    got = np.array(jm.stde_scores(jnp.array(f1), jnp.array(l1),
                                  jnp.array(f2), jnp.array(l2)))
    want = np.array([
        scaled_time_delay_embedding_similarity(
            f1[i, :l1[i]], f2[i, :l2[i]], (240, 320, 3))
        for i in range(b)])
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pair_grid_shapes(rng):
    n, s = 3, 5
    gt = np.zeros((n, s, L, 3), np.float32)
    gl = np.zeros((n, s), np.int32)
    gm = np.zeros((n, s), np.float32)
    for i in range(n):
        f, l = random_batch(rng, s)
        gt[i], gl[i] = f, l
        gm[i, :rng.integers(1, s + 1)] = 1
    pf, pl = random_batch(rng, n)
    wod, wd = jm.scanmatch_pair_grid(
        jm.ScanMatchSpec(temp_bin=50.0, max_symbols=128),
        jm.ScanMatchSpec(temp_bin=0.0, max_symbols=L),
        jnp.array(gt), jnp.array(gl), jnp.array(gm), jnp.array(pf),
        jnp.array(pl))
    assert wod.shape == (n, s) and wd.shape == (n, s)
    # spot-check one cell against host
    sm_wod = ScanMatch(Xres=320, Yres=240, Xbin=16, Ybin=12, Threshold=3.5)
    want = host_scanmatch(sm_wod, gt[1, 2], gl[1, 2], pf[1], pl[1])
    assert np.array(wod)[1, 2] == pytest.approx(want, rel=1e-5)
