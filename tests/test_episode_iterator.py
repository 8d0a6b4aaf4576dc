"""TourBasedEpisodeIterator behavioral spec (reference
habitat_extensions/episode_iterator.py:11-101).

The iterator's observable behavior — grouping, seeded shuffle order, the
tours-file pinned ordering, cycling — IS the compatibility contract, so
these tests pin it against `_reference_oracle`, a direct transcription of
the reference algorithm (sparse list grouping + whole-tour shuffle +
within-tour shuffle + per-cycle ordering lookup) kept here as a fixture.
"""

import random
from dataclasses import dataclass

import pytest

from ivlnce_tpu.tasks.episode_iterator import TourBasedEpisodeIterator


@dataclass
class Ep:
    episode_id: str
    tour_id: str
    scene_id: str = "data/scenes/sceneA.glb"


def _make_episodes():
    eps = []
    sizes = {0: 3, 2: 4, 5: 2, 7: 1}
    for tid, n in sizes.items():
        for i in range(n):
            eps.append(Ep(episode_id=f"t{tid}e{i}", tour_id=str(tid)))
    return eps


def _reference_oracle(episodes, shuffle_tours, shuffle_episodes,
                      episode_order=None, cycles=1):
    """The reference's _init_iterator flow, transcribed for comparison."""
    out = []
    for _ in range(cycles):
        sparse = [[] for _ in range(1 + max(int(e.tour_id) for e in episodes))]
        for e in episodes:
            sparse[int(e.tour_id)].append(e)
        tours = [t for t in sparse if t]
        if shuffle_tours:
            random.shuffle(tours)
        if shuffle_episodes:
            for t in tours:
                random.shuffle(t)
        if episode_order is not None:
            ordered_tours = []
            for t in tours:
                scene = "sceneA"
                for ordered in episode_order[scene]:
                    if t[0].episode_id in ordered:
                        break
                else:
                    raise AssertionError
                idx = {eid: i for i, eid in enumerate(ordered)}
                ordered_tours.append(
                    sorted(t, key=lambda e: idx[e.episode_id])
                )
            tours = ordered_tours
        episodes = [e for t in tours for e in t]
        out.extend(episodes)
    return [e.episode_id for e in out]


@pytest.mark.parametrize("shuffle_tours", [False, True])
@pytest.mark.parametrize("shuffle_episodes", [False, True])
def test_matches_reference_rng_sequence(shuffle_tours, shuffle_episodes):
    """Seeded runs must reproduce the reference's episode order exactly
    (same random.shuffle draw sequence), including across cycles."""
    for seed in (0, 7, 123):
        random.seed(seed)
        expected = _reference_oracle(
            _make_episodes(), shuffle_tours, shuffle_episodes, cycles=3
        )
        random.seed(seed)
        it = TourBasedEpisodeIterator(
            episodes=_make_episodes(),
            shuffle_tours=shuffle_tours,
            shuffle_episodes=shuffle_episodes,
        )
        got = [next(it).episode_id for _ in range(len(expected))]
        assert got == expected, (seed, shuffle_tours, shuffle_episodes)


def test_tours_stay_contiguous_and_sizes_counted():
    it = TourBasedEpisodeIterator(episodes=_make_episodes(), seed=3)
    seq = [next(it) for _ in range(10)]
    seen, last = set(), None
    for e in seq:
        if e.tour_id != last:
            assert e.tour_id not in seen, "tour split across the sequence"
            seen.add(e.tour_id)
            last = e.tour_id
    assert it.num_episodes_in_tour("2") == 4
    assert it.num_episodes_in_tour("7") == 1


def test_specified_order_pins_episodes_and_matches_reference():
    order = {"sceneA": [
        ["t0e2", "t0e0", "t0e1"],
        ["t2e3", "t2e1", "t2e0", "t2e2"],
        ["t5e1", "t5e0"],
        ["t7e0"],
    ]}
    random.seed(11)
    expected = _reference_oracle(
        _make_episodes(), True, True, episode_order=order, cycles=2
    )
    random.seed(11)
    it = TourBasedEpisodeIterator(
        episodes=_make_episodes(),
        shuffle_tours=True,
        shuffle_episodes=True,
        specify_episode_order=True,
        episode_order=order,
    )
    got = [next(it).episode_id for _ in range(len(expected))]
    assert got == expected
    # within every tour the pinned order holds
    pos = {eid: i for t in order["sceneA"] for i, eid in enumerate(t)}
    for tid in ("0", "2", "5"):
        tour_eps = [e for e in got[:10] if e.startswith(f"t{tid}")]
        assert [pos[e] for e in tour_eps] == sorted(pos[e] for e in tour_eps)


def test_unknown_episode_id_raises():
    order = {"sceneA": [["t0e0", "t0e1"]]}  # t0e2 and tours 2/5/7 missing
    with pytest.raises(AssertionError, match="not found in provided order"):
        TourBasedEpisodeIterator(
            episodes=_make_episodes(),
            shuffle_tours=False,
            shuffle_episodes=False,
            specify_episode_order=True,
            episode_order=order,
        )


def test_tour_spanning_two_ordered_lists_rejected():
    order = {"sceneA": [
        ["t0e0", "t0e1"], ["t0e2"],  # tour 0 split across two lists
        ["t2e0", "t2e1", "t2e2", "t2e3"], ["t5e0", "t5e1"], ["t7e0"],
    ]}
    with pytest.raises(ValueError, match="spans"):
        TourBasedEpisodeIterator(
            episodes=_make_episodes(),
            shuffle_tours=False,
            shuffle_episodes=False,
            specify_episode_order=True,
            episode_order=order,
        )


def test_no_cycle_stops():
    it = TourBasedEpisodeIterator(
        episodes=_make_episodes(), cycle=False,
        shuffle_tours=False, shuffle_episodes=False,
    )
    assert len(list(it)) == 10
