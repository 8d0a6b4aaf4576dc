"""VLN-CE datasets and episode types (reference:
habitat_extensions/task.py).

Episodes are plain dataclasses (the reference uses attr + habitat's
Episode base). Loading keeps the exact JSON surface: gzipped
{split}.json.gz with "episodes" + "instruction_vocab", tours from
data/tours.json keyed by split -> scene -> list of episode-id tours.
"""

from __future__ import annotations

import gzip
import json
import os
import random
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

from ivlnce_tpu.utils.registry import registry

DEFAULT_SCENE_PATH_PREFIX = "data/scene_datasets/"
ALL_SCENES_MASK = "*"
ALL_LANGUAGES_MASK = "*"
ALL_ROLES_MASK = "*"
ALL_EPISODES_MASK = "*"


class VocabDict:
    """Minimal habitat VocabDict: word list with UNK handling."""

    UNK_TOKEN = "<unk>"
    PAD_TOKEN = "<pad>"

    def __init__(self, word_list: List[str]):
        self.word_list = list(word_list)
        self.word2idx_dict = {w: i for i, w in enumerate(self.word_list)}
        self.unk_index = self.word2idx_dict.get(self.UNK_TOKEN)

    def word2idx(self, word: str) -> int:
        if word in self.word2idx_dict:
            return self.word2idx_dict[word]
        if self.unk_index is not None:
            return self.unk_index
        raise KeyError(word)

    def __len__(self):
        return len(self.word_list)


@dataclass
class InstructionData:
    instruction_text: str = ""
    instruction_tokens: Optional[List[int]] = None
    # RxR extensions (task.py:24-35)
    instruction_id: Optional[str] = None
    language: Optional[str] = None
    annotator_id: Optional[str] = None
    edit_distance: Optional[float] = None
    timed_instruction: Optional[List[Dict[str, Union[float, str]]]] = None
    split: Optional[str] = None
    extra: Dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_json(cls, d: Dict) -> "InstructionData":
        known = {k: d[k] for k in cls.__dataclass_fields__ if k in d}
        extra = {
            k: v
            for k, v in d.items()
            if k not in cls.__dataclass_fields__
        }
        known.pop("extra", None)
        return cls(**known, extra=extra)


@dataclass
class NavigationGoal:
    position: List[float]
    radius: Optional[float] = None


@dataclass
class VLNExtendedEpisode:
    """reference task.py:38-46 (+ habitat VLNEpisode base fields)."""

    episode_id: str
    scene_id: str
    start_position: List[float]
    start_rotation: List[float]  # xyzw quaternion
    instruction: InstructionData = None
    goals: Optional[List[NavigationGoal]] = None
    reference_path: Optional[List[List[float]]] = None
    trajectory_id: Optional[str] = None
    tour_id: Optional[str] = None
    info: Dict[str, Any] = field(default_factory=dict)
    extra: Dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_json(cls, d: Dict) -> "VLNExtendedEpisode":
        d = dict(d)
        d["episode_id"] = str(d["episode_id"])
        if "trajectory_id" in d and d["trajectory_id"] is not None:
            d["trajectory_id"] = str(d["trajectory_id"])
        if "instruction" in d and isinstance(d["instruction"], dict):
            d["instruction"] = InstructionData.from_json(d["instruction"])
        if d.get("goals"):
            d["goals"] = [
                NavigationGoal(**g) if isinstance(g, dict) else g
                for g in d["goals"]
            ]
        known = {k: d[k] for k in cls.__dataclass_fields__ if k in d}
        extra = {k: v for k, v in d.items() if k not in cls.__dataclass_fields__}
        known.pop("extra", None)
        return cls(**known, extra=extra)


def scene_from_scene_path(scene_id: str) -> str:
    """Scene name as the dataset/task layer derives it (reference
    task.py:311: splitext keeps 'X.basis' for 'X.basis.glb')."""
    return os.path.splitext(os.path.basename(scene_id))[0]


def env_name_from_scene_path(scene_id: str) -> str:
    """Scene name as the EnvNameSensor derives it (reference
    sensors.py:357-360: first dot wins, 'X' for 'X.basis.glb').

    The two derivations differ for multi-dot scene filenames; anything
    KEYED for lookup by env_name observations (scene centers, known-map
    npz files) must use THIS one (ADVICE r4: splitext-keyed scene
    centers missed every env_name lookup on HM3D-style names)."""
    return os.path.basename(scene_id).split(".")[0]


@registry.register_dataset(name="VLN-CE-v1")
class VLNCEDatasetV1:
    """R2R VLN-CE dataset (task.py:49-128)."""

    def __init__(self, config=None):
        self.episodes: List[VLNExtendedEpisode] = []
        self.instruction_vocab: Optional[VocabDict] = None
        if config is None:
            return
        dataset_filename = config.DATA_PATH.format(split=config.SPLIT)
        with gzip.open(dataset_filename, "rt") as f:
            self.from_json(f.read(), scenes_dir=config.SCENES_DIR)

        if ALL_SCENES_MASK not in config.CONTENT_SCENES:
            scenes_to_load = set(config.CONTENT_SCENES)
            self.episodes = [
                e
                for e in self.episodes
                if scene_from_scene_path(e.scene_id) in scenes_to_load
            ]

    @staticmethod
    def check_config_paths_exist(config) -> bool:
        return os.path.exists(config.DATA_PATH.format(split=config.SPLIT))

    @classmethod
    def get_scenes_to_load(cls, config) -> List[str]:
        dataset = cls(config)
        return sorted(
            {scene_from_scene_path(e.scene_id) for e in dataset.episodes}
        )

    def from_json(self, json_str: str, scenes_dir: Optional[str] = None):
        deserialized = json.loads(json_str)
        if "instruction_vocab" in deserialized:
            self.instruction_vocab = VocabDict(
                word_list=deserialized["instruction_vocab"]["word_list"]
            )
        for ep_json in deserialized["episodes"]:
            episode = VLNExtendedEpisode.from_json(ep_json)
            if scenes_dir is not None:
                if episode.scene_id.startswith(DEFAULT_SCENE_PATH_PREFIX):
                    episode.scene_id = episode.scene_id[
                        len(DEFAULT_SCENE_PATH_PREFIX):
                    ]
                episode.scene_id = os.path.join(scenes_dir, episode.scene_id)
            self.episodes.append(episode)

    def get_episode_iterator(self, **kwargs):
        from ivlnce_tpu.tasks.episode_iterator import EpisodeIterator

        kwargs.pop("specify_episode_order", None)
        kwargs.pop("shuffle_tours", None)
        kwargs.pop("shuffle_episodes", None)
        return EpisodeIterator(self.episodes, **kwargs)


@registry.register_dataset(name="Iterative-VLN-CE")
class IterativeVLNCEDataset(VLNCEDatasetV1):
    """Tour-grouped dataset (task.py:131-205)."""

    def __init__(self, config=None):
        super().__init__(config)
        self.tours: Dict[str, List[List[str]]] = {}
        if config is not None:
            with open(config.TOURS_FILE, "r") as f:
                self.tours = self._cast_tours_to_str(
                    json.load(f)[config.SPLIT]
                )
            self._init_episodes_by_tour(
                config.MIN_TOUR_SIZE,
                config.NUM_TOURS_SAMPLE,
                config.EPISODES_PER_TOUR,
            )

    @staticmethod
    def _cast_tours_to_str(tours):
        return {
            k: [[str(eid) for eid in tour] for tour in v]
            for k, v in tours.items()
        }

    def _init_episodes_by_tour(
        self,
        min_tour_size: int = -1,
        num_tours_to_sample: int = -1,
        episodes_per_tour: int = -1,
    ) -> None:
        tours_flattened = [
            t for scene_tours in self.tours.values() for t in scene_tours
        ]
        eid_to_tid = {}
        for i, tour in enumerate(tours_flattened):
            for episode in tour:
                eid_to_tid[str(episode)] = str(i)

        tours = [[] for _ in range(len(tours_flattened))]
        for ep in self.episodes:
            if ep.episode_id in eid_to_tid:
                ep.tour_id = eid_to_tid[ep.episode_id]
                tours[int(ep.tour_id)].append(ep)

        if min_tour_size >= 0:
            tours = [t for t in tours if len(t) >= min_tour_size]
        if num_tours_to_sample >= 0:
            tours = random.sample(
                tours, k=min(num_tours_to_sample, len(tours))
            )
        if episodes_per_tour >= 0:
            tours = [
                random.sample(t, k=min(episodes_per_tour, len(t)))
                for t in tours
            ]
        self.episodes = [ep for t in tours for ep in t]

    def get_episode_iterator(self, **kwargs):
        from ivlnce_tpu.tasks.episode_iterator import (
            TourBasedEpisodeIterator,
        )

        return TourBasedEpisodeIterator(
            episodes=self.episodes, episode_order=self.tours, **kwargs
        )


@registry.register_dataset(name="RxR-VLN-CE-v1")
class RxRVLNCEDatasetV1(VLNCEDatasetV1):
    """RxR dataset with roles / languages / episode filters
    (task.py:208-315)."""

    annotation_roles: List[str] = ["guide", "follower"]
    languages: List[str] = ["en-US", "en-IN", "hi-IN", "te-IN"]

    def __init__(self, config=None):
        self.episodes = []
        self.instruction_vocab = None
        self.config = config
        if config is None:
            return

        for role in self.extract_roles_from_config(config):
            with gzip.open(
                config.DATA_PATH.format(split=config.SPLIT, role=role), "rt"
            ) as f:
                self._split = config.SPLIT
                self.from_json(f.read(), scenes_dir=config.SCENES_DIR)

        if ALL_SCENES_MASK not in config.CONTENT_SCENES:
            scenes_to_load = set(config.CONTENT_SCENES)
            self.episodes = [
                e
                for e in self.episodes
                if scene_from_scene_path(e.scene_id) in scenes_to_load
            ]
        if ALL_LANGUAGES_MASK not in config.LANGUAGES:
            langs = set(config.LANGUAGES)
            self.episodes = [
                e for e in self.episodes if e.instruction.language in langs
            ]
        if ALL_EPISODES_MASK not in config.EPISODES_ALLOWED:
            ep_ids_before = {e.episode_id for e in self.episodes}
            purge = ep_ids_before - set(
                str(i) for i in config.EPISODES_ALLOWED
            )
            self.episodes = [
                e for e in self.episodes if e.episode_id not in purge
            ]

    @classmethod
    def extract_roles_from_config(cls, config) -> List[str]:
        if ALL_ROLES_MASK in config.ROLES:
            return cls.annotation_roles
        assert set(config.ROLES).issubset(set(cls.annotation_roles))
        return list(config.ROLES)

    @classmethod
    def check_config_paths_exist(cls, config) -> bool:
        return all(
            os.path.exists(
                config.DATA_PATH.format(split=config.SPLIT, role=role)
            )
            for role in cls.extract_roles_from_config(config)
        )

    def from_json(self, json_str: str, scenes_dir: Optional[str] = None):
        deserialized = json.loads(json_str)
        for ep_json in deserialized["episodes"]:
            episode = VLNExtendedEpisode.from_json(ep_json)
            if scenes_dir is not None:
                if episode.scene_id.startswith(DEFAULT_SCENE_PATH_PREFIX):
                    episode.scene_id = episode.scene_id[
                        len(DEFAULT_SCENE_PATH_PREFIX):
                    ]
                episode.scene_id = os.path.join(scenes_dir, episode.scene_id)
            episode.instruction.split = getattr(self, "_split", None)
            self.episodes.append(episode)


def make_dataset(name: str, config=None):
    return registry.get_dataset(name)(config)
