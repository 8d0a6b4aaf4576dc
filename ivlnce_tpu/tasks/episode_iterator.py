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
    """Cycles episodes grouped into contiguous tours.

    Behavioral spec (reference habitat_extensions/episode_iterator.py:11-101,
    re-verified by the oracle in tests/test_episode_iterator.py):

    * episodes are grouped by ``int(tour_id)``; the base tour order is
      ascending tour id;
    * ``shuffle_tours`` permutes whole tours, ``shuffle_episodes`` permutes
      within each tour — the RNG draw sequence matches the reference's, so
      seeded runs reproduce its episode order exactly;
    * ``specify_episode_order`` pins each tour to the ordering recorded in
      the tours file (``episode_order[scene] = [[episode_id, ...], ...]``),
      overriding any within-tour shuffle (whose draws are still consumed);
    * exhausting the sequence reshuffles (``cycle``) or stops.

    Unlike the reference this resolves the tours-file ordering into one
    rank index up front (not per cycle) and rejects tours whose members
    span different ordered tour lists instead of crashing on a KeyError.
    """

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
        if seed is not None:
            random.seed(seed)
        self._cycle = cycle
        self._shuffle_tours = shuffle_tours
        self._shuffle_episodes = shuffle_episodes
        # (scene, episode_id) -> (index of the ordered tour within the
        # scene, position within that tour); None disables pinning
        self._rank: Optional[Dict] = (
            self._resolve_rank_index(episode_order)
            if specify_episode_order
            else None
        )
        if self._rank is not None:
            # tour membership is invariant, so validate ONCE here (a real
            # exception, not an assert: it must survive python -O) rather
            # than per cycle: every episode must appear in the tours
            # file, and one tour's members must share one ordered list
            groups: Dict[int, List] = defaultdict(list)
            for e in episodes:
                groups[int(e.tour_id)].append(e)
            for tid, tour in groups.items():
                whence = {self._pinned_rank(e)[0] for e in tour}
                if len(whence) != 1:
                    raise ValueError(
                        f"tour {tid} spans {len(whence)} ordered tours in "
                        "the tours file; its episodes cannot be totally "
                        "ordered"
                    )

        self.episodes: List = self._arrange(list(episodes))
        self._cursor = 0
        self.tour_id_to_tour_size: Dict = defaultdict(int)
        for e in self.episodes:
            self.tour_id_to_tour_size[e.tour_id] += 1

    # -- iteration ------------------------------------------------------------
    def __iter__(self):
        return self

    def __next__(self):
        if self._cursor >= len(self.episodes):
            if not self._cycle:
                raise StopIteration
            self.episodes = self._arrange(self.episodes)
            self._cursor = 0
        ep = self.episodes[self._cursor]
        self._cursor += 1
        return ep

    # -- ordering -------------------------------------------------------------
    def _arrange(self, episodes: Sequence) -> List:
        groups: Dict[int, List] = defaultdict(list)
        for e in episodes:
            groups[int(e.tour_id)].append(e)
        tour_ids = sorted(groups)

        # same RNG consumption as the reference: one shuffle over the
        # tour sequence, then one per tour in the (possibly shuffled)
        # tour order
        if self._shuffle_tours:
            random.shuffle(tour_ids)
        for tid in tour_ids:
            tour = groups[tid]
            if self._shuffle_episodes:
                random.shuffle(tour)
            if self._rank is not None:
                # membership validated once in __init__
                tour.sort(key=self._pinned_rank)
        return [e for tid in tour_ids for e in groups[tid]]

    def _resolve_rank_index(self, episode_order: Dict) -> Dict:
        rank = {}
        for scene, ordered_tours in episode_order.items():
            for ti, ordered in enumerate(ordered_tours):
                for pos, eid in enumerate(ordered):
                    rank[(scene, eid)] = (ti, pos)
        return rank

    def _pinned_rank(self, episode):
        key = (scene_from_scene_path(episode.scene_id), episode.episode_id)
        if key not in self._rank:
            raise AssertionError(
                f"episode ID {episode.episode_id} not found in provided "
                "order."
            )
        return self._rank[key]

    def num_episodes_in_tour(self, tour_id: str) -> int:
        return self.tour_id_to_tour_size[tour_id]
