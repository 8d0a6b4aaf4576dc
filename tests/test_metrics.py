"""Metric tests: DTW kernels vs brute-force DP, tour-nDTW semantics
(reference habitat_extensions/tour_ndtw.py + utils.py:155-222)."""

import numpy as np
import pytest

from ivlnce_tpu.tasks.dtw import exact_dtw, fastdtw, windowed_dtw
from ivlnce_tpu.tasks.tour_ndtw import (
    alignments_from_paths,
    compute_episodes_per_tour,
    compute_tour_ndtw,
    novel_only,
    window_from_alignments,
)


def brute_dtw(x, y, window=None):
    """O(N*M) reference DP (symmetric1)."""
    n, m = len(x), len(y)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            if window is not None and not window[i - 1, j - 1]:
                continue
            c = np.linalg.norm(np.asarray(x[i - 1]) - np.asarray(y[j - 1]))
            D[i, j] = c + min(D[i - 1, j - 1], D[i - 1, j], D[i, j - 1])
    return D[n, m]


def test_exact_dtw_matches_brute_force(rng):
    for n, m in [(5, 7), (20, 13), (1, 9), (8, 1)]:
        x = rng.normal(size=(n, 3))
        y = rng.normal(size=(m, 3))
        ours, _ = exact_dtw(x, y)
        ref = brute_dtw(x, y)
        assert ours == pytest.approx(ref, rel=1e-9)


def test_windowed_dtw_matches_brute_force(rng):
    n, m = 14, 11
    x = rng.normal(size=(n, 3))
    y = rng.normal(size=(m, 3))
    window = np.ones((n, m), bool)
    # constrain a column like the tour alignment windows
    window[:, 4] = False
    window[6, 4] = True
    ours = windowed_dtw(x, y, window)
    ref = brute_dtw(x, y, window)
    assert ours == pytest.approx(ref, rel=1e-9)


def test_fastdtw_close_to_exact(rng):
    x = np.cumsum(rng.normal(size=(60, 3)) * 0.1, axis=0)
    y = x[::2] + rng.normal(size=(30, 3)) * 0.01
    exact, _ = exact_dtw(x, y)
    approx, path = fastdtw(x, y)
    assert approx >= exact - 1e-9  # approximation never undershoots
    assert approx <= exact * 1.3 + 1e-6
    assert path[0] == (0, 0) and path[-1] == (59, 29)


def _tour_path(positions, episode_ids, phases=None):
    phases = phases or ["agent"] * len(positions)
    return [
        {"position": list(map(float, p)), "phase": ph, "episode_id": str(e)}
        for p, ph, e in zip(positions, phases, episode_ids)
    ]


def test_tour_ndtw_perfect_match_is_one(rng):
    pos = np.cumsum(rng.normal(size=(12, 3)) * 0.2, axis=0)
    eps = [0] * 6 + [1] * 6
    path = _tour_path(pos, eps)
    score = compute_tour_ndtw({"t0": path}, {"t0": path})
    assert score == pytest.approx(1.0)


def test_tour_ndtw_degrades_with_error(rng):
    pos = np.cumsum(rng.normal(size=(12, 3)) * 0.2, axis=0)
    eps = [0] * 6 + [1] * 6
    gt = _tour_path(pos, eps)
    agent = _tour_path(pos + 1.0, eps)  # 1 m systematic error
    s_perfect = compute_tour_ndtw({"t": gt}, {"t": gt})
    s_off = compute_tour_ndtw({"t": agent}, {"t": gt})
    assert s_off < s_perfect


def test_tour_ndtw_oracle_steps_excluded(rng):
    pos = np.cumsum(rng.normal(size=(8, 3)) * 0.2, axis=0)
    eps = [0] * 4 + [1] * 4
    gt = _tour_path(pos, eps)
    # agent path with extra oracle-phase steps of garbage positions
    agent_positions = list(pos) + [pos[-1] + 100]
    agent_eps = eps + [1]
    phases = ["agent"] * 8 + ["oracle_goal"]
    agent = _tour_path(agent_positions, agent_eps, phases)
    score = compute_tour_ndtw({"t": agent}, {"t": gt})
    assert score == pytest.approx(1.0)


def test_episodes_per_tour_counts_transitions():
    path = _tour_path(np.zeros((5, 3)), [0, 0, 1, 1, 2])
    counts = compute_episodes_per_tour({"t": path})
    assert counts["t"] == 2  # reference quirk: transitions, not episodes


def test_alignments_and_window():
    gt = _tour_path(np.zeros((6, 3)), [0, 0, 0, 1, 1, 1])
    agent = _tour_path(np.zeros((4, 3)), [0, 0, 1, 1])
    aligns = alignments_from_paths(agent, gt)
    assert aligns == [(1, 2), (2, 3)]
    w = window_from_alignments(4, 6, aligns)
    assert w[1, 2] and not w[0, 2] and not w[3, 2]
    assert w[2, 3] and not w[1, 3]
    assert w[:, 0].all() and w[:, 5].all()


def test_novel_only():
    path = _tour_path(
        [[0, 0, 0], [0, 0, 0], [1, 0, 0], [1, 0, 0]], [0, 0, 0, 0]
    )
    assert len(novel_only(path)) == 2
    assert novel_only([]) == []


def test_episode_order_mismatch_raises():
    gt = _tour_path(np.zeros((4, 3)), [0, 0, 1, 1])
    agent = _tour_path(np.zeros((4, 3)), [1, 1, 0, 0])
    with pytest.raises(AssertionError):
        alignments_from_paths(agent, gt)
