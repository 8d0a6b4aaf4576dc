"""Dropped-point telemetry (VERDICT r3 weak #4/#5).

No map geometry may be lost silently anywhere in the system:
(a) known-map preloads larger than the TPU.known_map_max_points cap must
    warn and be countable (the reference loads whole npz files,
    mapper.py:283-294);
(b) DAgger collection must surface grid-extent drops before truncated
    maps enter the training store (reference's cloud is unbounded,
    mapper.py:297-326).
"""

import logging
import os

import numpy as np
import pytest

import ivlnce_tpu.envs.env  # noqa: F401 — registration side effects
import ivlnce_tpu.models  # noqa: F401
import ivlnce_tpu.tasks  # noqa: F401
import ivlnce_tpu.trainers  # noqa: F401
from ivlnce_tpu.config import get_config
from ivlnce_tpu.mapping.camera import (
    CameraParameters,
    vertical_fov_radians,
)
from ivlnce_tpu.mapping.obs_transforms import GTSemanticsKnownMapper
from ivlnce_tpu.ops.geometry import MapDims
from ivlnce_tpu.utils.registry import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _known_mapper(tmp_path, cap):
    hw = 32
    return GTSemanticsKnownMapper(
        camera_parameters=CameraParameters(
            vertical_fov_radians=vertical_fov_radians(90.0, hw, hw),
            features_spatial_dimensions=(hw, hw),
            height_clip=0.1,
        ),
        map_dimensions=MapDims(6.4, 6.4, 0.1),
        grid_cells=256,
        maps_location=str(tmp_path),
        known_map_max_points=cap,
    )


def _write_npz(tmp_path, name, n, rng):
    xyz = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    xyz[:, 1] = rng.uniform(0.5, 1.8, n)
    np.savez(
        tmp_path / f"{name}.npz",
        xyz=xyz,
        semantics=rng.integers(1, 13, n).astype(np.uint8),
    )


def test_known_map_preload_cap_warns_and_counts(tmp_path, caplog):
    rng = np.random.default_rng(0)
    _write_npz(tmp_path, "big_scene", 500, rng)
    mapper = _known_mapper(tmp_path, cap=128)
    mapper._ensure_state(1)

    obs = {
        "env_name": ["big_scene"],
        "world_robot_pose": np.zeros((1, 3), np.float32),
    }
    with caplog.at_level(logging.WARNING, logger="ivlnce_tpu"):
        mapper.host_prepare(obs, masks=np.zeros((1,), np.uint8))
    assert mapper.preload_truncated_count() == 500 - 128
    assert any(
        "preload cap" in r.message and "big_scene" in r.message
        for r in caplog.records
    )

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="ivlnce_tpu"):
        total = mapper.warn_if_dropped("known-maps eval")
    assert total >= 500 - 128
    assert any("preload cap" in r.message for r in caplog.records)


def test_known_map_preload_under_cap_is_silent(tmp_path, caplog):
    rng = np.random.default_rng(1)
    _write_npz(tmp_path, "small_scene", 100, rng)
    mapper = _known_mapper(tmp_path, cap=128)
    mapper._ensure_state(1)
    obs = {
        "env_name": ["small_scene"],
        "world_robot_pose": np.zeros((1, 3), np.float32),
    }
    with caplog.at_level(logging.WARNING, logger="ivlnce_tpu"):
        mapper.host_prepare(obs, masks=np.zeros((1,), np.uint8))
    assert mapper.preload_truncated_count() == 0
    assert not any("preload cap" in r.message for r in caplog.records)


def test_from_config_wires_known_map_cap():
    os.chdir(REPO)
    config = get_config("configs/fake/map_cma_train_tf.yaml").clone()
    config.defrost()
    config.TPU.known_map_max_points = 4096
    config.freeze()
    mapper = GTSemanticsKnownMapper.from_config(config)
    assert mapper.known_map_max_points == 4096


def test_dagger_collection_warns_on_grid_extent_drops(tmp_path, caplog):
    """An out-of-extent walk during collection must be surfaced: with a
    12.8 m world grid and 10 m-range depth frames, points fall outside
    the bounded extent and the collection summary must say so
    (VERDICT r3 weak #5)."""
    os.chdir(REPO)
    config = get_config("configs/fake/map_cma_train_tf.yaml").clone()
    config.defrost()
    config.TRAINER_NAME = "dagger"
    config.ENV_NAME = "VLNCEDaggerEnv"
    config.NUM_ENVIRONMENTS = 2
    config.CHECKPOINT_FOLDER = str(tmp_path / "ckpts")
    config.TENSORBOARD_DIR = str(tmp_path / "tb")
    config.RESULTS_DIR = str(tmp_path / "results")
    config.LOG_FILE = str(tmp_path / "log")
    config.VIDEO_OPTION = []
    config.IL.epochs = 0  # collection only
    config.IL.batch_size = 2
    config.IL.DAGGER.iterations = 1
    config.IL.DAGGER.update_size = 2
    config.IL.DAGGER.lmdb_features_dir = str(tmp_path / "traj")
    t = config.TASK_CONFIG
    t.ENVIRONMENT.MAX_EPISODE_STEPS = 10
    t.ENVIRONMENT.ITERATIVE.ENABLED = False
    t.SIMULATOR.DEPTH_SENSOR.HEIGHT = 64
    t.SIMULATOR.DEPTH_SENSOR.WIDTH = 64
    t.SIMULATOR.RGB_SENSOR.HEIGHT = 64
    t.SIMULATOR.RGB_SENSOR.WIDTH = 64
    # 256 cells x 0.05 m = 12.8 m extent (+-6.4 m around the episode
    # start) vs the 10 m depth range: guaranteed out-of-extent points
    config.TPU.world_grid_cells = 256
    config.freeze()

    trainer = registry.get_trainer(config.TRAINER_NAME)(config)
    with caplog.at_level(logging.INFO, logger="ivlnce_tpu"):
        trainer.train()

    warned = [
        r.message
        for r in caplog.records
        if "fell outside" in r.message and "dagger collection" in r.message
    ]
    assert warned, "grid-extent drops were not surfaced during collection"
    summary = [
        r.message
        for r in caplog.records
        if "dropped_map_points=" in r.message
    ]
    assert summary and not any(
        "dropped_map_points=0)" in m for m in summary
    )
