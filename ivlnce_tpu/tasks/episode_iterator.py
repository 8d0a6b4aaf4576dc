"""Episode iterators (reference: habitat_extensions/episode_iterator.py +
habitat core EpisodeIterator semantics used by the plain datasets)."""

from __future__ import annotations

import random
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

from ivlnce_tpu.tasks.dataset import scene_from_scene_path


class EpisodeIterator:
    """Minimal habitat-style iterator: optional shuffle, group-by-scene,
    cycling."""

    def __init__(
        self,
        episodes: Sequence,
        cycle: bool = True,
        shuffle: bool = True,
        group_by_scene: bool = True,
        seed: Optional[int] = None,
        **kwargs,
    ):
        if seed is not None:
            random.seed(seed)
        self._cycle = cycle
        self._shuffle = shuffle
        self._group_by_scene = group_by_scene
        self.episodes = list(episodes)
        self._prepare()
        self._iterator = iter(self.episodes)

    def _prepare(self):
        if self._shuffle:
            random.shuffle(self.episodes)
        if self._group_by_scene:
            by_scene = defaultdict(list)
            for e in self.episodes:
                by_scene[e.scene_id].append(e)
            self.episodes = [e for g in by_scene.values() for e in g]

    def __iter__(self):
        return self

    def __next__(self):
        nxt = next(self._iterator, None)
        if nxt is None:
            if not self._cycle:
                raise StopIteration
            self._prepare()
            self._iterator = iter(self.episodes)
            nxt = next(self._iterator)
        return nxt


class TourBasedEpisodeIterator:
    """Orders episodes tour-by-tour (reference episode_iterator.py:11-101):
    optionally shuffles the tour order and episodes within tours, or sorts
    each tour by a fixed ordering from the tours file; cycles."""

    def __init__(
        self,
        episodes: Sequence,
        cycle: bool = True,
        seed: Optional[int] = None,
        shuffle_tours: bool = True,
        shuffle_episodes: bool = True,
        specify_episode_order: bool = False,
        episode_order: Optional[Dict[str, List[List[str]]]] = None,
        **kwargs,
    ):
        self._cycle = cycle
        self._shuffle_tours = shuffle_tours
        self._shuffle_episodes = shuffle_episodes
        self._specify_episode_order = specify_episode_order
        self._episode_order = episode_order

        if seed is not None:
            random.seed(seed)

        self.episodes = self._init_iterator(episodes)
        self._iterator = iter(self.episodes)
        self.tour_id_to_tour_size = self._compute_tour_sizes()

    def __iter__(self):
        return self

    def __next__(self):
        nxt = next(self._iterator, None)
        if nxt is None:
            if not self._cycle:
                raise StopIteration
            self.episodes = self._init_iterator(self.episodes)
            self._iterator = iter(self.episodes)
            nxt = next(self._iterator)
        return nxt

    def _init_iterator(self, episodes: Sequence) -> List:
        sparse_tours = [
            [] for _ in range(1 + max(int(e.tour_id) for e in episodes))
        ]
        for e in episodes:
            sparse_tours[int(e.tour_id)].append(e)
        tours = [t for t in sparse_tours if len(t)]

        if self._shuffle_tours:
            random.shuffle(tours)
        if self._shuffle_episodes:
            for t in tours:
                random.shuffle(t)
        if self._specify_episode_order:
            tours = [
                self._order_tour_episodes(t, self._episode_order)
                for t in tours
            ]
        return [e for t in tours for e in t]

    def _order_tour_episodes(self, tour, episode_order):
        ep_id = tour[0].episode_id
        scene = scene_from_scene_path(tour[0].scene_id)
        for ordered_t in episode_order[scene]:
            if ep_id in ordered_t:
                break
        else:
            raise AssertionError(
                f"episode ID {ep_id} not found in provided order."
            )
        eid_to_idx = {eid: i for i, eid in enumerate(ordered_t)}
        return [
            e
            for _, e in sorted(
                ((eid_to_idx[e.episode_id], e) for e in tour),
                key=lambda pair: pair[0],
            )
        ]

    def _compute_tour_sizes(self):
        sizes = defaultdict(int)
        for e in self.episodes:
            sizes[e.tour_id] += 1
        return sizes

    def num_episodes_in_tour(self, tour_id: str) -> int:
        return self.tour_id_to_tour_size[tour_id]
