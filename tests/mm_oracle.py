"""Clean-room oracle for the ``multimatch_gaze.docomparison`` call the
reference makes (OSIE/utils/evaluation.py:38, package pinned at 0.1.2 in
sp_baseline.yml).  The package cannot be installed in this offline
environment, so this oracle re-derives its computation path from the
published algorithm (Jarodzka et al. 2010; Dewhurst et al. 2012) using
the package's own structure — a directed lattice graph with edge cost =
cost of the entered node, solved by a binary-heap Dijkstra with
strict-improvement relaxation — rather than the production module's DP
formulation (scanpaths_tpu/metrics/multimatch.py).  Two independently
structured implementations agreeing on random and grid-quantized data,
plus the all-optimal-path invariance test in test_multimatch_parity.py,
is the strongest parity evidence available without network access.

Semantics mirrored from the package (grouping/simplification OFF — the
reference passes only ``screensize``):
* < 3 fixations on either side -> [nan] * 5;
* saccade vectors between consecutive fixations; alignment lattice
  M[i, j] = || sac_i - sac_j ||;
* moves right / down / diagonal, entering (i, j) costs M[i, j];
* five difference series along the path: vector, direction (wrapped
  angle), length, position (saccade start points), duration (relative,
  |d1 - d2| / max);
* median of each; normalization: vector by 2*diag, direction by pi,
  length and position by diag, duration already relative.
"""

from __future__ import annotations

import heapq
import math

import numpy as np


def gen_scanpath_structure(fix: np.ndarray) -> dict:
    x, y, dur = fix[:, 0], fix[:, 1], fix[:, 2]
    return {
        "x": x[:-1], "y": y[:-1], "dur": dur,
        "lenx": np.diff(x), "leny": np.diff(y),
        "theta": np.arctan2(np.diff(y), np.diff(x)),
        "rho": np.hypot(np.diff(x), np.diff(y)),
    }


def cal_vectordifferences(s1: dict, s2: dict) -> np.ndarray:
    dx = s1["lenx"][:, None] - s2["lenx"][None, :]
    dy = s1["leny"][:, None] - s2["leny"][None, :]
    return np.sqrt(dx * dx + dy * dy)


def dijkstra_path(m: np.ndarray) -> list[tuple[int, int]]:
    """Shortest path (0,0) -> (n-1,k-1) with binary-heap Dijkstra,
    strict-improvement relaxation, neighbors expanded in (right, down,
    diagonal) order, heap ties broken by node id (row-major)."""
    n, k = m.shape
    goal = n * k - 1
    dist = {0: 0.0}
    prev: dict[int, int] = {}
    pq: list[tuple[float, int]] = [(0.0, 0)]
    settled = set()
    while pq:
        d, u = heapq.heappop(pq)
        if u in settled:
            continue
        settled.add(u)
        if u == goal:
            break
        i, j = divmod(u, k)
        for ni, nj in ((i, j + 1), (i + 1, j), (i + 1, j + 1)):
            if ni >= n or nj >= k:
                continue
            v = ni * k + nj
            nd = d + m[ni, nj]
            if v not in dist or nd < dist[v]:
                dist[v] = nd
                prev[v] = u
                heapq.heappush(pq, (nd, v))
    path = [goal]
    while path[-1] != 0:
        path.append(prev[path[-1]])
    return [divmod(u, k) for u in reversed(path)]


def _angle_diff(t1: float, t2: float) -> float:
    d = abs(t1 - t2)
    return 2 * math.pi - d if d > math.pi else d


def docomparison(fv1, fv2, screensize=(320, 240)):
    f1, f2 = _as_xyd(fv1), _as_xyd(fv2)
    if len(f1) < 3 or len(f2) < 3:
        return [np.nan] * 5
    s1, s2 = gen_scanpath_structure(f1), gen_scanpath_structure(f2)
    m = cal_vectordifferences(s1, s2)
    path = dijkstra_path(m)

    vec, ang, length, pos, dur = [], [], [], [], []
    for i, j in path:
        vec.append(m[i, j])
        ang.append(_angle_diff(s1["theta"][i], s2["theta"][j]))
        length.append(abs(s1["rho"][i] - s2["rho"][j]))
        pos.append(math.hypot(s1["x"][i] - s2["x"][j],
                              s1["y"][i] - s2["y"][j]))
        d1, d2 = s1["dur"][i], s2["dur"][j]
        mx = max(d1, d2)
        dur.append(abs(d1 - d2) / mx if mx > 0 else np.nan)

    diag = math.hypot(screensize[0], screensize[1])
    return [
        1.0 - float(np.median(vec)) / (2 * diag),
        1.0 - float(np.median(ang)) / math.pi,
        1.0 - float(np.median(length)) / diag,
        1.0 - float(np.median(pos)) / diag,
        1.0 - float(np.median(dur)),
    ]


def _as_xyd(v) -> np.ndarray:
    v = np.asarray(v)
    if v.dtype.names:
        return np.stack([v["start_x"], v["start_y"], v["duration"]],
                        axis=-1).astype(np.float64)
    return v.astype(np.float64).reshape(-1, 3) if v.size else np.zeros((0, 3))


def all_optimal_path_similarities(fv1, fv2, screensize=(320, 240),
                                  max_paths=256):
    """Enumerate up to ``max_paths`` distinct OPTIMAL alignments (via the
    DAG of argmin predecessors) and return the 5-similarity tuple for
    each — the tie-breaking sensitivity probe."""
    f1, f2 = _as_xyd(fv1), _as_xyd(fv2)
    if len(f1) < 3 or len(f2) < 3:
        return [tuple([np.nan] * 5)]
    s1, s2 = gen_scanpath_structure(f1), gen_scanpath_structure(f2)
    m = cal_vectordifferences(s1, s2)
    n, k = m.shape
    dist = np.full((n, k), np.inf)
    dist[0, 0] = 0.0
    for i in range(n):
        for j in range(k):
            if i == 0 and j == 0:
                continue
            best = math.inf
            for pi, pj in ((i - 1, j - 1), (i - 1, j), (i, j - 1)):
                if pi >= 0 and pj >= 0:
                    best = min(best, dist[pi, pj])
            dist[i, j] = best + m[i, j]

    paths: list[list[tuple[int, int]]] = []

    def backtrack(i, j, acc):
        if len(paths) >= max_paths:
            return
        if i == 0 and j == 0:
            paths.append([(0, 0)] + list(reversed(acc)))
            return
        preds = [(pi, pj) for pi, pj in ((i - 1, j - 1), (i - 1, j),
                                         (i, j - 1))
                 if pi >= 0 and pj >= 0
                 and math.isclose(dist[pi, pj] + m[i, j], dist[i, j],
                                  rel_tol=0.0, abs_tol=1e-12)]
        for p in preds:
            backtrack(p[0], p[1], acc + [(i, j)])

    backtrack(n - 1, k - 1, [])

    diag = math.hypot(screensize[0], screensize[1])
    out = []
    for path in paths:
        vec, ang, length, pos, dur = [], [], [], [], []
        for i, j in path:
            vec.append(m[i, j])
            ang.append(_angle_diff(s1["theta"][i], s2["theta"][j]))
            length.append(abs(s1["rho"][i] - s2["rho"][j]))
            pos.append(math.hypot(s1["x"][i] - s2["x"][j],
                                  s1["y"][i] - s2["y"][j]))
            d1, d2 = s1["dur"][i], s2["dur"][j]
            mx = max(d1, d2)
            dur.append(abs(d1 - d2) / mx if mx > 0 else np.nan)
        out.append((
            1.0 - float(np.median(vec)) / (2 * diag),
            1.0 - float(np.median(ang)) / math.pi,
            1.0 - float(np.median(length)) / diag,
            1.0 - float(np.median(pos)) / diag,
            1.0 - float(np.median(dur)),
        ))
    return out
