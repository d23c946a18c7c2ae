"""Device-side (JAX) scanpath metrics on fixed-shape padded tensors.

These are the TPU-native re-expressions of the reference's CPU metric
loops (reference OSIE/utils/evaltools/scanmatch.py:135-197,
visual_attention_metrics.py:236-441).  They power:

* the SCST reward inside the jitted RL training step (the reference
  computes rewards on host mid-step, OSIE/train.py:234 — here the whole
  rollout->reward->gradient path stays on device), and
* fast batched validation sweeps.

Conventions:
* a scanpath batch is ``(fix [..., L, 3], length [...])`` where the last
  axis is (x_pixel, y_pixel, duration_seconds) and entries at or beyond
  ``length`` are padding;
* all DP tables are statically padded and masked; scores match the host
  oracles exactly (same float64->float32 tolerance) for lengths within
  the static bounds.

The Needleman-Wunsch recurrence with gap value 0 (the only gap value the
framework uses; reference ScanMatch default GapValue=0 is never
overridden) reduces each DP row to ``cummax(max(diag + S, up))`` — a
vectorizable scan: rows go through ``lax.scan``, the in-row dependency
is ``jax.lax.cummax``.  Same shape for Levenshtein with ``cummin``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.grid import GridSpec


class ScanMatchSpec(NamedTuple):
    """Static ScanMatch configuration (framework standard:
    16x12 bins over 320x240, threshold 3.5 — reference AiR/train.py:216-218)."""
    xres: int = 320
    yres: int = 240
    xbin: int = 16
    ybin: int = 12
    threshold: float = 3.5
    temp_bin: float = 0.0       # ms per symbol repeat; 0 = no expansion
    max_symbols: int = 16       # static bound on expanded sequence length

    @property
    def num_bins(self) -> int:
        return self.xbin * self.ybin


def sub_matrix(spec: ScanMatchSpec) -> jnp.ndarray:
    """S[a, b] = threshold - ||bin_a - bin_b|| (bins raster-ordered)."""
    idx = jnp.arange(spec.num_bins)
    ys, xs = idx // spec.xbin, idx % spec.xbin
    d = jnp.hypot((xs[:, None] - xs[None, :]).astype(jnp.float32),
                  (ys[:, None] - ys[None, :]).astype(jnp.float32))
    return spec.threshold - d


def quantize(spec: ScanMatchSpec, fix: jnp.ndarray, length: jnp.ndarray):
    """Fixations -> (symbols [..., max_symbols], n_symbols [...]).

    Applies the reference clamping (negative -> 0, >=res -> res-1,
    truncate to int) and, when ``temp_bin`` != 0, repeats each symbol
    ``round(duration_ms / temp_bin)`` times (reference scanmatch.py:116-131;
    durations here are SECONDS and scaled by 1000 like the callers do).
    """
    x = jnp.clip(fix[..., 0], 0, spec.xres - 1).astype(jnp.int32)
    y = jnp.clip(fix[..., 1], 0, spec.yres - 1).astype(jnp.int32)
    bx = x * spec.xbin // spec.xres
    by = y * spec.ybin // spec.yres
    bins = by * spec.xbin + bx                      # [..., L]
    L = fix.shape[-2]
    valid = jnp.arange(L) < length[..., None]       # [..., L]
    if spec.temp_bin == 0:
        n = jnp.minimum(length, spec.max_symbols)
        pad_take = jnp.minimum(jnp.arange(spec.max_symbols), L - 1)
        sym = jnp.take_along_axis(
            bins, jnp.broadcast_to(pad_take, bins.shape[:-1] + (spec.max_symbols,)),
            axis=-1)
        return sym, n
    # Durations go through the same int truncation as the coordinates in
    # the host pipeline (the whole array is cast to int before the
    # temporal binning, reference scanmatch.py:122-127).
    dur_ms = jnp.floor(jnp.maximum(fix[..., 2] * 1000.0, 0.0))
    # Clamp before the int cast so inf/huge durations can't overflow;
    # sequences longer than max_symbols are prefix-truncated (pick the
    # static bound above the data's expansion, e.g. 16 fixations at
    # <=800 ms each with temp_bin=50 -> 256).
    reps = jnp.where(valid, jnp.round(dur_ms / spec.temp_bin), 0)
    reps = jnp.clip(reps, 0, spec.max_symbols).astype(jnp.int32)
    cum = jnp.cumsum(reps, axis=-1)                 # [..., L]
    total = jnp.minimum(cum[..., -1], spec.max_symbols)
    # symbol k belongs to fixation l = #{cum <= k}  (searchsorted right)
    k = jnp.arange(spec.max_symbols)
    src = jnp.sum(k[..., None] >= cum[..., None, :], axis=-1)  # [..., K]
    src = jnp.minimum(src, L - 1)
    sym = jnp.take_along_axis(bins, src, axis=-1)
    return sym, total


def expansion_overflow(spec: ScanMatchSpec, fix: jnp.ndarray,
                       length: jnp.ndarray) -> jnp.ndarray:
    """True where a scanpath's TempBin symbol expansion exceeds the
    static ``max_symbols`` bound (i.e. `quantize` would prefix-truncate
    it and the in-graph score would diverge from the host oracle).
    Surfaced as a trainer metric so truncation is never silent."""
    if spec.temp_bin == 0:
        return length > spec.max_symbols
    L = fix.shape[-2]
    valid = jnp.arange(L) < length[..., None]
    dur_ms = jnp.floor(jnp.maximum(fix[..., 2] * 1000.0, 0.0))
    reps = jnp.where(valid, jnp.round(dur_ms / spec.temp_bin), 0)
    return jnp.sum(reps, axis=-1) > spec.max_symbols


def nw_scores(sub: jnp.ndarray,
              seq_a: jnp.ndarray, len_a: jnp.ndarray,
              seq_b: jnp.ndarray, len_b: jnp.ndarray) -> jnp.ndarray:
    """Batched Needleman-Wunsch alignment scores with gap value 0.

    seq_a: [B, Ta] int32, len_a: [B]; likewise seq_b.  Returns [B]
    float32 scores maxF / (max(sub) * max(len_a, len_b)); 0/0 -> nan
    like the reference (scanmatch.py:190-193).
    """
    ta, tb = seq_a.shape[-1], seq_b.shape[-1]
    neg = jnp.float32(-3.4e38)

    def one(a, la, b, lb):
        s_full = sub[a][:, b]                       # [Ta, Tb]
        jb = jnp.arange(tb)
        col_ok = jb < lb
        ia = jnp.arange(ta)
        row_ok = ia < la

        def row(prev, inp):
            s_row, ok = inp
            s_row = jnp.where(col_ok & ok, s_row, neg)
            diag = jnp.concatenate([jnp.zeros((1,), prev.dtype), prev[:-1]])
            cand = jnp.maximum(diag + s_row, prev)
            # F[i,0] = 0 boundary enters as the floor of the running max.
            cur = jnp.maximum(jax.lax.cummax(cand), 0.0)
            return cur, jnp.max(cur)

        prev0 = jnp.zeros((tb,), jnp.float32)
        _, row_maxes = jax.lax.scan(row, prev0, (s_full, row_ok))
        max_f = jnp.maximum(jnp.max(row_maxes), 0.0)
        scale = jnp.max(sub) * jnp.maximum(la, lb).astype(jnp.float32)
        return jnp.where(scale > 0, max_f / scale, jnp.nan)

    return jax.vmap(one)(seq_a, len_a, seq_b, len_b)


def _pallas_nw_ok() -> bool:
    from ..ops import pallas_nw
    return pallas_nw.available()


def scanmatch_scores(spec: ScanMatchSpec,
                     fix_a: jnp.ndarray, len_a: jnp.ndarray,
                     fix_b: jnp.ndarray, len_b: jnp.ndarray,
                     use_pallas: bool | None = None) -> jnp.ndarray:
    """End-to-end batched ScanMatch: quantize + align.  fix_*: [B, L, 3].

    On TPU the NW alignment runs as a single Pallas kernel
    (ops/pallas_nw.py) — the ``lax.scan`` formulation pays per-row
    while-loop overhead that dominates at ScanMatch table sizes; the
    kernel is ~10-30x faster at RL-reward shapes (tools/bench_steps.py).
    ``use_pallas=None`` auto-selects (TPU and the one-time probe passes).
    """
    sa, na = quantize(spec, fix_a, len_a)
    sb, nb = quantize(spec, fix_b, len_b)
    if use_pallas is None:
        use_pallas = _pallas_nw_ok()
    if use_pallas:
        from ..ops.pallas_nw import nw_scores_bins
        return nw_scores_bins(spec.threshold, spec.xbin, spec.ybin,
                              sa, na, sb, nb)
    return nw_scores(sub_matrix(spec), sa, na, sb, nb)


# ---------------------------------------------------------------------------
# SED (Levenshtein over 5x5-grid strings)
# ---------------------------------------------------------------------------

def sed_symbols(fix: jnp.ndarray, height: int = 240, width: int = 320,
                n: int = 5) -> jnp.ndarray:
    """Reference letter mapping (visual_attention_metrics.py:288-298)."""
    wstep, hstep = width // n, height // n
    x = fix[..., 0].astype(jnp.int32)
    y = fix[..., 1].astype(jnp.int32)
    return x // wstep + (y // hstep) * n


def levenshtein(sym_a: jnp.ndarray, len_a: jnp.ndarray,
                sym_b: jnp.ndarray, len_b: jnp.ndarray) -> jnp.ndarray:
    """Batched Levenshtein distance.  sym_*: [B, L] int32.  Returns [B]
    int32 D[len_a, len_b] of the padded DP."""
    ta, tb = sym_a.shape[-1], sym_b.shape[-1]

    def one(a, la, b, lb):
        jb = jnp.arange(1, tb + 1)

        def row(prev, inp):
            a_i, i = inp
            neq = (b != a_i).astype(jnp.int32)
            cand = jnp.minimum(prev[:-1] + neq, prev[1:] + 1)
            base = cand - jb
            base = base.at[0].set(jnp.minimum(base[0], i))
            cur_tail = jax.lax.cummin(base) + jb
            cur = jnp.concatenate([i[None], cur_tail])
            return cur, cur

        prev0 = jnp.arange(tb + 1, dtype=jnp.int32)
        _, rows = jax.lax.scan(row, prev0,
                               (a, jnp.arange(1, ta + 1, dtype=jnp.int32)))
        table = jnp.concatenate([prev0[None], rows])      # [Ta+1, Tb+1]
        return table[la, lb]

    return jax.vmap(one)(sym_a, len_a, sym_b, len_b)


def sed_scores(fix_a, len_a, fix_b, len_b, height: int = 240,
               width: int = 320) -> jnp.ndarray:
    return levenshtein(sed_symbols(fix_a, height, width), len_a,
                       sed_symbols(fix_b, height, width), len_b)


# ---------------------------------------------------------------------------
# STDE (scaled time-delay-embedding similarity)
# ---------------------------------------------------------------------------

def stde_scores(fix_h: jnp.ndarray, len_h: jnp.ndarray,
                fix_s: jnp.ndarray, len_s: jnp.ndarray,
                height: int = 240, width: int = 320) -> jnp.ndarray:
    """Batched STDE (reference visual_attention_metrics.py:393-441).

    fix_h (human) and fix_s (simulated): [B, L, 3].  Returns [B] float32;
    nan when either length is 0 (reference returns None).
    """
    max_dim = float(max(height, width))
    lh, ls = fix_h.shape[-2], fix_s.shape[-2]
    ph = fix_h[..., :2] / max_dim
    ps = fix_s[..., :2] / max_dim
    big = jnp.float32(3.4e38)

    def one(h, nh, s, ns):
        # c[i, j] = ||s_i - h_j||
        c = jnp.hypot(s[:, None, 0] - h[None, :, 0],
                      s[:, None, 1] - h[None, :, 1])         # [ls, lh]
        max_k = jnp.minimum(nh, ns)

        def body(k, carry):
            w, acc = carry
            # w currently holds window sums of length k (built incrementally)
            i_ok = jnp.arange(ls) < (ns - k + 1)
            j_ok = jnp.arange(lh) < (nh - k + 1)
            wm = jnp.where(j_ok[None, :], w, big)
            mins = jnp.min(wm, axis=1) / k.astype(jnp.float32)
            sk = jnp.sum(jnp.where(i_ok, mins, 0.0)) / jnp.maximum(
                jnp.sum(i_ok), 1).astype(jnp.float32)
            sim_k = jnp.exp(-sk)
            acc = acc + jnp.where(k <= max_k, sim_k, 0.0)
            # extend windows: w'[i, j] = w[i, j] + c[i+k, j+k]
            shifted = jnp.roll(jnp.roll(c, -k, axis=0), -k, axis=1)
            w = w + shifted
            return (w, acc)

        _, acc = jax.lax.fori_loop(1, min(lh, ls) + 1, body,
                                   (c, jnp.float32(0.0)))
        return jnp.where(max_k > 0,
                         acc / jnp.maximum(max_k, 1).astype(jnp.float32),
                         jnp.nan)

    return jax.vmap(one)(ph, len_h, ps, len_s)


# ---------------------------------------------------------------------------
# MultiMatch (Jarodzka alignment) — device kernel
# ---------------------------------------------------------------------------

def _mm_align_table(m: jnp.ndarray) -> jnp.ndarray:
    """Min-cost monotone-path DP over a padded lattice.

    D[i, j] = M[i, j] + min(D[i-1, j], D[i-1, j-1], D[i, j-1]), D[0, 0]=0
    (the start node's cost is excluded — host `_align` semantics, which
    in turn mirror multimatch_gaze's Dijkstra with edge weight = cost of
    the target node).  The in-row dependency is removed with a min-plus
    prefix scan: D[i, j] = P[j] + cummin_k(U[k] - P[k-1]) where
    P = cumsum(M[i, :]) and U[k] = min(D[i-1, k], D[i-1, k-1]).
    Returns the full [A, B] table.
    """
    big = jnp.float32(3.4e38)

    row0 = jnp.cumsum(m[0]) - m[0][0]

    def row(prev, m_row):
        p = jnp.cumsum(m_row)
        p_shift = jnp.concatenate([jnp.zeros((1,), p.dtype), p[:-1]])
        diag = jnp.concatenate([jnp.full((1,), big, prev.dtype), prev[:-1]])
        u = jnp.minimum(prev, diag)
        cur = p + jax.lax.cummin(u - p_shift)
        return cur, cur

    _, rows = jax.lax.scan(row, row0, m[1:])
    return jnp.concatenate([row0[None], rows], axis=0)


def _mm_traceback(table, m, na, nb, max_path: int):
    """Walk the DP table back from (na-1, nb-1) to (0, 0), preferring
    diagonal, then up, then left on ties (the host `_align` tie order).
    Returns (cells [max_path, 2] int32, valid [max_path] bool) — cells
    are emitted end-first and include both endpoints.

    Ties are detected with a tolerance scaled to the LOCAL cell
    magnitude: `_mm_align_table`'s min-plus prefix scan reassociates
    the cost sums (cumsum then cummin), so two EXACTLY tied alignments
    — common for decoded scanpaths, where repeated saccades make whole
    DP columns identical — land a few ulps apart in the f32 table and
    a raw <= would break the tie by rounding noise instead of by the
    host's deterministic diag > up > left order.  The flipped path is
    still cost-optimal, but path-dependent columns (position, duration)
    then diverge from the host suite (observed: a single tied pair
    moving the aggregated AiR MultiMatch-duration by ~1%).  The
    reassociation noise at a cell is a few ulps of the costs
    accumulated UP TO that cell, so the tolerance scales with the
    candidates at the cell (not the endpoint total, which would
    over-tolerate near the origin where table entries are far
    smaller): costs that genuinely differ by less than ~16 ulps of
    the local magnitude are fp-ambiguous either way; resolving them
    like exact ties is the consistent choice."""
    big = jnp.float32(3.4e38)
    eps16 = 16 * jnp.finfo(table.dtype).eps

    def body(k, carry):
        i, j, done, cells, valid = carry
        cells = cells.at[k, 0].set(i)
        cells = cells.at[k, 1].set(j)
        valid = valid.at[k].set(~done)
        d_diag = jnp.where((i > 0) & (j > 0), table[i - 1, j - 1], big)
        d_up = jnp.where(i > 0, table[i - 1, j], big)
        d_left = jnp.where(j > 0, table[i, j - 1], big)
        best = jnp.minimum(d_diag, jnp.minimum(d_up, d_left))
        tol = eps16 * (jnp.abs(best) + 1)
        take_diag = d_diag <= best + tol
        take_up = (~take_diag) & (d_up <= best + tol)
        ni = jnp.where(take_diag | take_up, i - 1, i)
        nj = jnp.where(take_diag | (~take_up), j - 1, j)
        now_done = done | ((i == 0) & (j == 0))
        i = jnp.where(now_done, i, ni)
        j = jnp.where(now_done, j, nj)
        return i, j, now_done, cells, valid

    cells0 = jnp.zeros((max_path, 2), jnp.int32)
    valid0 = jnp.zeros((max_path,), bool)
    _, _, _, cells, valid = jax.lax.fori_loop(
        0, max_path, body, (na - 1, nb - 1, False, cells0, valid0))
    return cells, valid


def _masked_median(vals: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """numpy-median semantics over the masked entries (nan propagates)."""
    big = jnp.float32(3.4e38)
    has_nan = jnp.any(valid & jnp.isnan(vals))
    v = jnp.sort(jnp.where(valid & ~jnp.isnan(vals), vals, big))
    cnt = valid.sum()
    lo = jnp.maximum((cnt - 1) // 2, 0)
    hi = jnp.maximum(cnt // 2, 0)
    med = 0.5 * (v[lo] + v[hi])
    return jnp.where(has_nan | (cnt == 0), jnp.nan, med)


def multimatch_scores(fix_a: jnp.ndarray, len_a: jnp.ndarray,
                      fix_b: jnp.ndarray, len_b: jnp.ndarray,
                      xres: int = 320, yres: int = 240) -> jnp.ndarray:
    """Batched MultiMatch (vector, direction, length, position, duration)
    similarities; [B, 5].  nan rows where either scanpath has < 3
    fixations — exactly the host `metrics.multimatch.docomparison`
    contract (itself the behavioural contract of multimatch_gaze as used
    at reference OSIE/utils/evaluation.py:38)."""
    la_max = fix_a.shape[-2]
    lb_max = fix_b.shape[-2]
    amax, bmax = la_max - 1, lb_max - 1
    max_path = amax + bmax
    diag = jnp.float32(jnp.hypot(float(xres), float(yres)))

    def one(a, la, b, lb):
        ax, ay, adur = a[:-1, 0], a[:-1, 1], a[:-1, 2]
        bx, by, bdur = b[:-1, 0], b[:-1, 1], b[:-1, 2]
        adx, ady = a[1:, 0] - a[:-1, 0], a[1:, 1] - a[:-1, 1]
        bdx, bdy = b[1:, 0] - b[:-1, 0], b[1:, 1] - b[:-1, 1]
        atheta = jnp.arctan2(ady, adx)
        btheta = jnp.arctan2(bdy, bdx)
        arho = jnp.hypot(adx, ady)
        brho = jnp.hypot(bdx, bdy)

        m = jnp.hypot(adx[:, None] - bdx[None, :],
                      ady[:, None] - bdy[None, :])         # [amax, bmax]
        na = jnp.clip(la - 1, 1, amax)
        nb = jnp.clip(lb - 1, 1, bmax)
        table = _mm_align_table(m)
        cells, valid = _mm_traceback(table, m, na, nb, max_path)
        ci, cj = cells[:, 0], cells[:, 1]

        vec = m[ci, cj]
        two_pi = 2 * jnp.pi
        ta = jnp.mod(atheta[ci] + two_pi, two_pi)
        tb = jnp.mod(btheta[cj] + two_pi, two_pi)
        dth = jnp.abs(ta - tb)
        ang = jnp.where(dth > jnp.pi, two_pi - dth, dth)
        ln = jnp.abs(arho[ci] - brho[cj])
        pos = jnp.hypot(ax[ci] - bx[cj], ay[ci] - by[cj])
        denom = jnp.maximum(adur[ci], bdur[cj])
        dur = jnp.where(denom > 0,
                        jnp.abs(adur[ci] - bdur[cj]) / denom, jnp.nan)

        sims = jnp.stack([
            1.0 - _masked_median(vec, valid) / (2 * diag),
            1.0 - _masked_median(ang, valid) / jnp.pi,
            1.0 - _masked_median(ln, valid) / diag,
            1.0 - _masked_median(pos, valid) / diag,
            1.0 - _masked_median(dur, valid),
        ])
        ok = (la >= 3) & (lb >= 3)
        return jnp.where(ok, sims, jnp.nan)

    return jax.vmap(one)(fix_a, len_a, fix_b, len_b)


# ---------------------------------------------------------------------------
# Pair-sweep helpers (sample x subject grids for rewards / validation)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(0, 1))
def scanmatch_pair_grid(spec_wd: ScanMatchSpec, spec_wod: ScanMatchSpec,
                        gt_fix, gt_len, gt_mask, pred_fix, pred_len):
    """Score every (GT subject, prediction) pair of a batch.

    gt_fix: [N, S, L, 3], gt_len: [N, S], gt_mask: [N, S] (1 = real
    subject), pred_fix: [N, L, 3], pred_len: [N].
    Returns (wod [N, S], wd [N, S]) score grids (garbage where mask==0).
    """
    n, s = gt_fix.shape[:2]
    gt_flat = gt_fix.reshape(n * s, *gt_fix.shape[2:])
    gt_len_flat = gt_len.reshape(n * s)
    pred_rep = jnp.repeat(pred_fix, s, axis=0)
    pred_len_rep = jnp.repeat(pred_len, s, axis=0)
    wd = scanmatch_scores(spec_wd, gt_flat, gt_len_flat, pred_rep, pred_len_rep)
    wod = scanmatch_scores(spec_wod, gt_flat, gt_len_flat, pred_rep, pred_len_rep)
    return wod.reshape(n, s), wd.reshape(n, s)
