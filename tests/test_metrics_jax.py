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


def test_multimatch_jax_matches_host(rng):
    """Device MultiMatch vs the host docomparison on random pairs,
    including <3-fixation NaN rows."""
    from scanpaths_tpu.metrics.multimatch import docomparison

    b = 12
    fa, la = random_batch(rng, b, min_len=2, max_len=L)
    fb, lb = random_batch(rng, b, min_len=2, max_len=L)
    dev = np.asarray(jax.jit(
        lambda *a: jm.multimatch_scores(*a, xres=320, yres=240))(
        jnp.asarray(fa), jnp.asarray(la), jnp.asarray(fb), jnp.asarray(lb)))
    for i in range(b):
        host = docomparison(fa[i, :la[i]], fb[i, :lb[i]],
                            screensize=(320, 240))
        if np.any(np.isnan(host)):
            assert np.all(np.isnan(dev[i])), (i, dev[i], host)
        else:
            np.testing.assert_allclose(dev[i], host, rtol=2e-5, atol=2e-5,
                                       err_msg=f"pair {i}")


def test_multimatch_jax_identical_paths(rng):
    fa, la = random_batch(rng, 4, min_len=4, max_len=L)
    dev = np.asarray(jm.multimatch_scores(
        jnp.asarray(fa), jnp.asarray(la), jnp.asarray(fa), jnp.asarray(la)))
    np.testing.assert_allclose(dev, 1.0, atol=1e-6)


def test_multimatch_jax_exact_alignment_tie(rng):
    """Regression: a decoded scanpath with REPEATED saccades makes whole
    DP columns exactly tied; the kernel's min-plus prefix scan lands the
    tied table entries a few ulps apart, and without the traceback's
    tie tolerance the rounding noise (not the host's diag > up > left
    order) picked the alignment — flipping the path-dependent columns
    (observed: duration 0.487 -> 0.200 on this real rollout, a ~1%
    aggregate shift in joint AiR validation).  Pair captured from a
    joint --device_eval run: pred fixations sit on grid centers and
    saccade 0 == saccade 1 exactly."""
    from scanpaths_tpu.metrics.multimatch import docomparison

    gt = np.array([
        [28.637657, 17.975346, 0.571892],
        [5.826118, 8.386845, 0.132733],
        [17.664713, 12.10556, 0.604229],
        [30.110462, 24.06101, 0.219451],
        [36.353935, 17.330498, 0.320491],
        [30.968199, 19.8957, 0.128302],
        [45.647884, 27.97657, 0.226726],
        [16.720411, 10.860298, 0.368716],
        [37.81781, 26.949255, 0.410576],
        [4.596786, 10.206927, 0.597115],
        [9.773601, 6.566147, 0.521667],
        [21.472595, 35.86916, 0.222975],
        [31.736494, 36.20962, 0.442775]], np.float32)
    pred = np.array([
        [44.0, 28.0, 0.166949],
        [28.0, 20.0, 4.857131],      # saccade 1 == saccade 0 = (-16,-8)
        [12.0, 12.0, 0.789355],
        [20.0, 36.0, 0.55234]], np.float32)
    # pad gt to a bigger static shape, like the eval sweep does
    gt_pad = np.zeros((1, 20, 3), np.float32)
    gt_pad[0, :13] = gt
    pr_pad = pred[None]
    dev = np.asarray(jm.multimatch_scores(
        jnp.asarray(gt_pad), jnp.asarray([13], np.int32),
        jnp.asarray(pr_pad), jnp.asarray([4], np.int32)))[0]
    host = docomparison(gt, pred, screensize=(320, 240))
    np.testing.assert_allclose(dev, host, rtol=2e-5, atol=2e-5)


def test_expansion_overflow_flags(rng):
    spec = jm.ScanMatchSpec(temp_bin=50.0, max_symbols=8)
    fix = np.zeros((2, 4, 3), np.float32)
    fix[:, :, 2] = 0.1          # 100 ms -> 2 symbols per fixation
    lens = np.array([4, 4], np.int32)
    fix[1, :, 2] = 0.3          # 300 ms -> 6 symbols each -> 24 > 8
    flags = np.asarray(jm.expansion_overflow(
        spec, jnp.asarray(fix), jnp.asarray(lens)))
    assert flags.tolist() == [False, True]


def test_pallas_nw_matches_xla(rng):
    """The Pallas NW kernel (interpret mode on CPU) vs the XLA scan
    formulation, including empty sequences and nan cases."""
    from scanpaths_tpu.ops.pallas_nw import nw_scores_bins

    for spec in (jm.ScanMatchSpec(temp_bin=0.0, max_symbols=L),
                 jm.ScanMatchSpec(temp_bin=50.0, max_symbols=160)):
        fa, la = random_batch(rng, 10, min_len=1)
        fb, lb = random_batch(rng, 10, min_len=1)
        la = la.copy()
        la[0] = 0                       # empty A
        lb[1] = 0                       # empty B
        la[2] = 0                       # both empty -> nan
        lb[2] = 0
        sa, na = jm.quantize(spec, jnp.asarray(fa), jnp.asarray(la))
        sb, nb = jm.quantize(spec, jnp.asarray(fb), jnp.asarray(lb))
        want = np.asarray(jm.nw_scores(jm.sub_matrix(spec), sa, na, sb, nb))
        got = np.asarray(nw_scores_bins(spec.threshold, spec.xbin,
                                        spec.ybin, sa, na, sb, nb,
                                        interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7,
                                   err_msg=f"temp_bin={spec.temp_bin}")
        assert np.isnan(got[2]) and np.isnan(want[2])


def test_pallas_probe_escapes_ambient_trace():
    """Regression: pallas_nw.available() is usually first called DURING
    the tracing of a jitted consumer (scanmatch_scores selects its
    implementation at trace time, e.g. inside the jitted RL step).  The
    probe must still produce a CONCRETE result there — on the real TPU
    it once returned a tracer, raised at its np.asarray barrier, and
    permanently (lru_cache) demoted every run to the XLA fallback.  The
    probe now executes in a fresh thread (clean trace context); this
    exercises that mechanism under an ambient trace with the
    interpret-mode kernel."""
    import concurrent.futures

    from scanpaths_tpu.ops.pallas_nw import nw_scores_bins

    def probe_like():
        got = nw_scores_bins(
            3.5, 4, 3,
            jnp.asarray([[1, 2, 3, 0]], jnp.int32), jnp.asarray([3]),
            jnp.asarray([[1, 2, 3, 0]], jnp.int32), jnp.asarray([3]),
            interpret=True)
        return np.asarray(got)  # raises if `got` is a tracer

    out = {}

    def traced(x):
        with concurrent.futures.ThreadPoolExecutor(1) as ex:
            out["probe"] = ex.submit(probe_like).result(timeout=600)
        return x

    jax.jit(traced)(jnp.zeros(()))
    assert np.isfinite(out["probe"]).all()
    # a perfect self-match scores 1.0
    np.testing.assert_allclose(out["probe"], [1.0], atol=1e-6)
