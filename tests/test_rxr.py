"""RxR dataset + instruction-feature sensor (reference task.py:208-315,
sensors.py:118-158) on generated fixtures."""

import gzip
import json
import os

import numpy as np
import pytest

from ivlnce_tpu.tasks.dataset import make_dataset
from ivlnce_tpu.tasks.sensors import RxRInstructionSensor


class _Cfg(dict):
    __getattr__ = dict.__getitem__

    def __contains__(self, k):
        return dict.__contains__(self, k)


def _write_split(tmp_path, role, episodes):
    path = str(tmp_path / f"train_{role}.json.gz")
    with gzip.open(path, "wt") as f:
        json.dump({"episodes": episodes}, f)
    return path


def _episode(eid, lang, iid):
    return {
        "episode_id": str(eid),
        "trajectory_id": str(eid),
        "scene_id": "mp3d/sceneA/sceneA.glb",
        "start_position": [0, 0, 0],
        "start_rotation": [0, 0, 0, 1],
        "goals": [{"position": [1, 0, 1], "radius": 3.0}],
        "instruction": {
            "instruction_text": f"instruction {eid}",
            "instruction_id": str(iid),
            "language": lang,
        },
        "reference_path": [[0, 0, 0], [1, 0, 1]],
        "info": {},
    }


def test_rxr_dataset_role_and_language_filters(tmp_path):
    guide = [
        _episode(1, "en-US", 101),
        _episode(2, "hi-IN", 102),
        _episode(3, "te-IN", 103),
    ]
    follower = [_episode(4, "en-IN", 104)]
    data_path = str(tmp_path / "train_{role}.json.gz")
    _write_split(tmp_path, "guide", guide)
    _write_split(tmp_path, "follower", follower)

    config = _Cfg(
        DATA_PATH=data_path,
        SPLIT="train",
        SCENES_DIR="data/scene_datasets/",
        CONTENT_SCENES=["*"],
        ROLES=["guide"],
        LANGUAGES=["en-US", "hi-IN"],
        EPISODES_ALLOWED=["*"],
    )
    ds = make_dataset("RxR-VLN-CE-v1", config)
    assert sorted(e.episode_id for e in ds.episodes) == ["1", "2"]

    config = _Cfg(config, ROLES=["*"], LANGUAGES=["*"])
    ds = make_dataset("RxR-VLN-CE-v1", config)
    assert len(ds.episodes) == 4

    config = _Cfg(config, EPISODES_ALLOWED=[1, 4])
    ds = make_dataset("RxR-VLN-CE-v1", config)
    assert sorted(e.episode_id for e in ds.episodes) == ["1", "4"]


def test_rxr_instruction_sensor_pads_features(tmp_path):
    feat_dir = tmp_path / "text_features"
    os.makedirs(feat_dir)
    feats = np.random.default_rng(0).normal(size=(37, 768)).astype(
        np.float32
    )
    np.savez(
        str(feat_dir / "rxr_train_000101_en.npz"), features=feats
    )

    sensor_cfg = _Cfg(
        features_path=str(feat_dir) + "/rxr_{split}_{id:06}_{lang}.npz"
    )
    sensor = RxRInstructionSensor(config=sensor_cfg)

    ep_json = _episode(1, "en-US", 101)
    from ivlnce_tpu.tasks.dataset import VLNExtendedEpisode

    ep = VLNExtendedEpisode.from_json(ep_json)
    ep.instruction.split = "train"
    obs = sensor.get_observation({}, ep)
    assert obs.shape == (512, 768)
    np.testing.assert_allclose(obs[:37], feats)
    assert (obs[37:] == 0).all()
