"""Dynamic time warping kernels.

Replaces the reference's external deps (fastdtw C extension and
dtw-python, habitat_extensions/measures.py:7 + tour_ndtw.py:4) with:

- ``exact_dtw``: classic symmetric1 DTW, vectorized row-scan. The inner
  row recurrence D[j] = c[j] + min(E[j], D[j-1]) is a min-plus prefix
  scan, computed in O(M) numpy via
      D[j] = C[j] + min_{k<=j}(E[k] + c[k] - C[k-1]... )
  i.e. cumulative sums + minimum.accumulate — no Python inner loop.
- ``windowed_dtw``: same with a boolean window mask (the constrained
  tour-nDTW alignment windows, tour_ndtw.py:19-27).
- ``fastdtw``: the standard Salvador-Chan approximation with radius 1
  (the default the reference uses through the fastdtw package,
  measures.py:165,199).

All distances are Euclidean over R^3 positions unless a custom ``dist``
is given.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

BIG = 1e12


def _pairwise_dists(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    diff = x[:, None, :] - y[None, :, :]
    return np.sqrt(np.sum(diff * diff, axis=-1))


def _dtw_from_cost(
    cost: np.ndarray, window: Optional[np.ndarray] = None
) -> float:
    """symmetric1 DTW distance from an (N, M) cost matrix via vectorized
    row scans."""
    n, m = cost.shape
    c = np.asarray(cost, np.float64).copy()
    # blocked-cell penalty: any path touching one blocked cell costs more
    # than the most expensive fully-valid path, while keeping magnitudes
    # small enough that the cumsum trick stays numerically exact
    penalty = float(c[np.isfinite(c)].sum()) + 1.0
    if window is not None:
        c = np.where(window, c, penalty)

    prev = np.cumsum(c[0])  # D[0, j]: only (0,1) moves available

    for i in range(1, n):
        ci = c[i]
        # E[j] = min(D[i-1, j] (down), D[i-1, j-1] (diag))
        e = prev.copy()
        e[1:] = np.minimum(e[1:], prev[:-1])
        # min-plus scan: D[j] = ci[j] + min(E[j], D[j-1])
        #   = Cs[j] + min_{k<=j}(E[k] - Cs[k-1]) where Cs = cumsum(ci)
        cs = np.cumsum(ci)
        base = e - np.concatenate(([0.0], cs[:-1]))
        prev = cs + np.minimum.accumulate(base)
    result = float(prev[-1])
    if result >= penalty:
        return float("inf")
    return result


def exact_dtw(
    x: Sequence, y: Sequence, dist: Optional[Callable] = None
) -> Tuple[float, None]:
    """Returns (distance, None); API shaped like fastdtw's return for
    drop-in use in measures (measures.py:199-201)."""
    xa, ya = np.asarray(x, float), np.asarray(y, float)
    if xa.ndim == 1:
        xa, ya = xa[:, None], ya[:, None]
    if dist is None:
        cost = _pairwise_dists(xa, ya)
    else:
        cost = np.array(
            [[dist(xi, yj) for yj in ya] for xi in xa], dtype=float
        )
    return _dtw_from_cost(cost), None


def windowed_dtw(
    x: Sequence,
    y: Sequence,
    window: np.ndarray,
) -> float:
    """Constrained symmetric1 DTW with a boolean (N, M) window."""
    xa, ya = np.asarray(x, float), np.asarray(y, float)
    cost = _pairwise_dists(xa, ya)
    return _dtw_from_cost(cost, window)


# -----------------------------------------------------------------------------
# fastdtw (Salvador & Chan, radius=1 default like the pypi package)
# -----------------------------------------------------------------------------
def fastdtw(
    x: Sequence, y: Sequence, radius: int = 1, dist: Optional[Callable] = None
) -> Tuple[float, List[Tuple[int, int]]]:
    xa = np.asarray(x, float)
    ya = np.asarray(y, float)
    if xa.ndim == 1:
        xa = xa[:, None]
    if ya.ndim == 1:
        ya = ya[:, None]
    return _fastdtw_rec(xa, ya, radius, dist)


def _fastdtw_rec(x, y, radius, dist):
    min_time_size = radius + 2
    if len(x) < min_time_size or len(y) < min_time_size:
        return _dtw_with_path(x, y, None, dist)

    x_shrunk = _reduce_by_half(x)
    y_shrunk = _reduce_by_half(y)
    _, path = _fastdtw_rec(x_shrunk, y_shrunk, radius, dist)
    window = _expand_window(path, len(x), len(y), radius)
    return _dtw_with_path(x, y, window, dist)


def _reduce_by_half(x):
    n = len(x) // 2 * 2
    return (x[0:n:2] + x[1:n:2]) / 2


def _expand_window(path, len_x, len_y, radius):
    path_set = set(path)
    for i, j in list(path_set):
        for a in range(-radius, radius + 1):
            for b in range(-radius, radius + 1):
                path_set.add((i + a, j + b))

    window_set = set()
    for i, j in path_set:
        window_set.add((i * 2, j * 2))
        window_set.add((i * 2, j * 2 + 1))
        window_set.add((i * 2 + 1, j * 2))
        window_set.add((i * 2 + 1, j * 2 + 1))

    window = []
    start_j = 0
    for i in range(len_x):
        new_start_j = None
        for j in range(start_j, len_y):
            if (i, j) in window_set:
                window.append((i, j))
                if new_start_j is None:
                    new_start_j = j
            elif new_start_j is not None:
                break
        if new_start_j is not None:
            start_j = new_start_j
    return window


def _dtw_with_path(x, y, window, dist):
    """DP over an explicit sparse window (or full if None), returning
    (distance, path) like the fastdtw package."""
    len_x, len_y = len(x), len(y)
    if window is None:
        window = [(i, j) for i in range(len_x) for j in range(len_y)]
    window = [(i + 1, j + 1) for i, j in window]

    if dist is None:
        def dist(a, b):
            return float(np.linalg.norm(a - b))

    D = {(0, 0): (0.0, 0, 0)}
    for i, j in window:
        dt = dist(x[i - 1], y[j - 1])
        candidates = []
        for (pi, pj) in ((i - 1, j), (i, j - 1), (i - 1, j - 1)):
            if (pi, pj) in D:
                candidates.append((D[(pi, pj)][0] + dt, pi, pj))
        if candidates:
            D[(i, j)] = min(candidates, key=lambda t: t[0])
    if (len_x, len_y) not in D:
        # the expanded window failed to connect (0,0) to (len_x,len_y) —
        # cannot happen with the contiguous windows _expand_window builds,
        # but guard with an exact full-grid DP rather than KeyError
        return _dtw_with_path(x, y, None, dist)
    path = []
    i, j = len_x, len_y
    while (i, j) != (0, 0):
        _, pi, pj = D[(i, j)]
        path.append((i - 1, j - 1))
        i, j = pi, pj
    path.reverse()
    return D[(len_x, len_y)][0], path
