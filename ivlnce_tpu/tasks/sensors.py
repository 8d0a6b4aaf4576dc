"""Task sensors (reference: habitat_extensions/sensors.py).

Sensors compute per-step observation entries from the simulator + current
episode. The camera offset (depth sensor POSITION [0, 1.25, 0]) matches
the task YAMLs; WorldRobotPose/Orientation report the depth CAMERA state
like the reference (sensors.py:196-250).
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, List, Optional

import numpy as np

from ivlnce_tpu.envs.shortest_path import ShortestPathFollower
from ivlnce_tpu.envs.sim_api import SimActions, heading_from_quat
from ivlnce_tpu.utils.registry import registry

CAMERA_OFFSET_Y = 1.25


class Sensor:
    cls_uuid = ""

    def __init__(self, sim=None, config=None, **kwargs):
        self._sim = sim
        self._config = config

    @property
    def uuid(self):
        return self.cls_uuid

    def get_observation(self, observations, episode, **kwargs):
        raise NotImplementedError


@registry.register_sensor(name="GlobalGPSSensor")
class GlobalGPSSensor(Sensor):
    cls_uuid = "globalgps"

    def get_observation(self, observations, episode, **kwargs):
        pos = np.asarray(self._sim.get_agent_state().position)
        dim = self._config.DIMENSIONALITY if self._config else 3
        if dim == 2:
            pos = np.array([pos[0], pos[2]])
        return pos.astype(np.float32)


@registry.register_sensor(name="VLNOracleProgressSensor")
class VLNOracleProgressSensor(Sensor):
    cls_uuid = "progress"

    def get_observation(self, observations, episode, **kwargs):
        d = self._sim.geodesic_distance(
            list(np.asarray(self._sim.get_agent_state().position)),
            episode.goals[0].position,
        )
        if not np.isfinite(d):
            return np.array([0.0], np.float32)
        start = episode.info["geodesic_distance"]
        return np.array([(start - d) / start], np.float32)


@registry.register_sensor(name="ShortestPathSensor")
class ShortestPathSensor(Sensor):
    cls_uuid = "shortest_path_sensor"

    def __init__(self, sim=None, config=None, **kwargs):
        super().__init__(sim=sim, config=config)
        radius = config.GOAL_RADIUS if config else 0.5
        self.follower = ShortestPathFollower(
            sim, radius, return_one_hot=False
        )

    def get_observation(self, observations, episode, **kwargs):
        try:
            best = self.follower.get_next_action(episode.goals[0].position)
        except Exception:
            best = None
        if best is None:
            best = SimActions.STOP
        return np.array([best])


@registry.register_sensor(name="RxRInstructionSensor")
class RxRInstructionSensor(Sensor):
    cls_uuid = "rxr_instruction"

    def get_observation(self, observations, episode, **kwargs):
        features = np.load(
            self._config.features_path.format(
                split=episode.instruction.split,
                id=int(episode.instruction.instruction_id),
                lang=episode.instruction.language.split("-")[0],
            )
        )
        feats = np.zeros((512, 768), np.float32)
        s = features["features"].shape
        feats[: s[0], : s[1]] = features["features"]
        return feats


@registry.register_sensor(name="WorldRobotPoseSensor")
class WorldRobotPoseSensor(Sensor):
    """Depth-camera world position (sensors.py:196-202)."""

    cls_uuid = "world_robot_pose"

    def get_observation(self, observations, episode, **kwargs):
        pos = np.asarray(
            self._sim.get_agent_state().position, np.float32
        ).copy()
        pos[1] += CAMERA_OFFSET_Y
        return pos


@registry.register_sensor(name="WorldRobotOrientationSensor")
class WorldRobotOrientationSensor(Sensor):
    """(elevation, heading) = first two components of the camera
    quaternion's ROTATION VECTOR (axis * angle; sensors.py:239-250 via
    scipy as_rotvec — not Euler angles despite the name)."""

    cls_uuid = "world_robot_orientation"

    @staticmethod
    def rotvec_from_quat(q: np.ndarray) -> np.ndarray:
        x, y, z, w = q
        norm = math.sqrt(x * x + y * y + z * z)
        if norm < 1e-12:
            return np.zeros(3)
        angle = 2.0 * math.atan2(norm, w)
        # wrap to (-pi, pi]
        if angle > math.pi:
            angle -= 2 * math.pi
        return np.array([x, y, z]) / norm * angle

    def get_observation(self, observations, episode, **kwargs):
        q = np.asarray(self._sim.get_agent_state().rotation, np.float64)
        rv = self.rotvec_from_quat(q)
        return np.array([rv[0], rv[1]], np.float32)


@registry.register_sensor(name="Semantic12Sensor")
class Semantic12Sensor(Sensor):
    """12-class whitelist semantics (reference sensors.py:253-329).

    Three sources, in order: (1) the sim already emits ``semantic12``
    (FakeSim, and HabitatSimAdapter which maps per scene); (2) the obs
    carry a raw instance-id ``semantic`` frame and the sim exposes
    ``semantic_annotations()`` — map through mpcat40/raw category names
    with a per-scene LUT; (3) neither -> error."""

    cls_uuid = "semantic12"

    object_whitelist = [
        "shelving", "chest_of_drawers", "bed", "cushion", "fireplace",
        "sofa", "table", "chair", "cabinet", "plant", "counter", "sink",
    ]

    def __init__(self, sim=None, config=None, **kwargs):
        super().__init__(sim=sim, config=config, **kwargs)
        self._mapping = None
        self._mapping_scene = None

    def get_observation(self, observations, episode, **kwargs):
        if "semantic12" in observations:
            return observations["semantic12"]
        if "semantic" in observations and hasattr(
            self._sim, "semantic_annotations"
        ):
            from ivlnce_tpu.envs.habitat_backend import Semantic12Mapping

            scene = getattr(episode, "scene_id", None)
            if self._mapping is None or self._mapping_scene != scene:
                self._mapping = Semantic12Mapping(
                    self._sim.semantic_annotations()
                )
                self._mapping_scene = scene
            return self._mapping(observations["semantic"])
        raise RuntimeError(
            "Semantic12Sensor requires a sim emitting semantic12 frames or "
            "a habitat semantic sensor + annotations."
        )


@registry.register_sensor(name="EnvNameSensor")
class EnvNameSensor(Sensor):
    cls_uuid = "env_name"

    def get_observation(self, observations, episode, **kwargs):
        from ivlnce_tpu.tasks.dataset import env_name_from_scene_path

        return env_name_from_scene_path(episode.scene_id)


SENSOR_TYPE_TO_CONFIG_KEY = {
    "GlobalGPSSensor": "GLOBAL_GPS_SENSOR",
    "VLNOracleProgressSensor": "VLN_ORACLE_PROGRESS_SENSOR",
    "ShortestPathSensor": "SHORTEST_PATH_SENSOR",
    "RxRInstructionSensor": "RXR_INSTRUCTION_SENSOR",
    "WorldRobotPoseSensor": "WORLD_ROBOT_POSE_SENSOR",
    "WorldRobotOrientationSensor": "WORLD_ROBOT_ORIENTATION_SENSOR",
    "Semantic12Sensor": "SEMANTIC12_SENSOR",
    "EnvNameSensor": "ENV_NAME_SENSOR",
}


def build_sensors(sensor_names: List[str], sim, task_config) -> List[Sensor]:
    """Instantiate TASK.SENSORS (config-key names like the task YAMLs)."""
    key_to_type = {v: k for k, v in SENSOR_TYPE_TO_CONFIG_KEY.items()}
    sensors = []
    for name in sensor_names:
        type_name = name
        cfg = None
        if name in key_to_type:
            cfg = task_config.TASK.get(name)
            type_name = (
                cfg.TYPE if cfg is not None and "TYPE" in cfg
                else key_to_type[name]
            )
        cls = registry.get_sensor(type_name)
        sensors.append(cls(sim=sim, config=cfg))
    return sensors


class InstructionSensor:
    """Tokenized instruction from the episode (habitat VLN task's
    InstructionSensor: returns the dict {text, tokens, trajectory_id};
    the trainers then extract 'tokens',
    ivlnce_baselines/common/utils.py:12-35)."""

    cls_uuid = "instruction"
    uuid = "instruction"

    def __init__(self, max_length: int = 200, **kwargs):
        self.max_length = max_length

    def get_observation(self, observations, episode, **kwargs):
        return {
            "text": episode.instruction.instruction_text,
            "tokens": episode.instruction.instruction_tokens,
            "trajectory_id": episode.trajectory_id,
        }
