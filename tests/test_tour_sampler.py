"""TourSampler binpacking tests (reference tour_dataset.py:107-205)."""

import numpy as np

from ivlnce_tpu.trainers.tour_dataset import TourSampler


def test_sampler_keeps_all_full_batches():
    # two tours of 3 episodes, 2 lanes: 3 full batches, nothing dropped
    tours_to_idx = {"t1": [0, 1, 2], "t2": [3, 4, 5]}
    s = TourSampler(tours_to_idx, batch_size=2, shuffle=False)
    batches = list(s)
    assert len(batches) == 3
    assert all(len(b) == 2 for b in batches)
    assert sorted(sum(batches, [])) == list(range(6))


def test_sampler_drops_only_short_tail():
    # lanes of lengths 4 and 2 -> 2 full batches kept, 2 items dropped
    tours_to_idx = {"t1": [0, 1, 2, 3], "t2": [4, 5]}
    s = TourSampler(tours_to_idx, batch_size=2, shuffle=False)
    batches = list(s)
    assert len(batches) == 2
    assert all(len(b) == 2 for b in batches)


def test_consecutive_batches_continue_same_lane_tours():
    tours_to_idx = {"a": [10, 11, 12], "b": [20, 21, 22]}
    s = TourSampler(tours_to_idx, batch_size=2, shuffle=False)
    batches = list(s)
    # lane 0 follows one tour in order, lane 1 the other
    lane0 = [b[0] for b in batches]
    lane1 = [b[1] for b in batches]
    assert lane0 in ([10, 11, 12], [20, 21, 22])
    assert lane1 in ([10, 11, 12], [20, 21, 22])
    assert lane0 != lane1

    # the first episode of each tour is flagged as a tour start
    done = s.get_tour_done_idxs()
    assert done == {10, 20}
