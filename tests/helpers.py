"""Shared test fixtures: synthetic tour datasets over FakeSim scenes."""

import math

import numpy as np

from ivlnce_tpu.config import get_config
from ivlnce_tpu.envs.fake_sim import FakeSim, SceneGeometry
from ivlnce_tpu.envs.sim_api import quat_from_heading
from ivlnce_tpu.tasks.dataset import (
    InstructionData,
    NavigationGoal,
    VLNExtendedEpisode,
)


def nav_points(scene_id: str, n: int, seed: int = 0):
    """n well-separated navigable points in the scene."""
    geo = SceneGeometry(scene_id)
    rng = np.random.default_rng(seed)
    pts = []
    h = geo.extent / 2 - 1.0
    while len(pts) < n:
        x, z = rng.uniform(-h, h, 2)
        if geo.is_navigable_xz(x, z, margin=0.3):
            pts.append([float(x), 0.0, float(z)])
    return pts


def make_episode(
    episode_id: str,
    scene_id: str,
    start,
    goal,
    tour_id=None,
    heading: float = 0.0,
    tokens=None,
):
    return VLNExtendedEpisode(
        episode_id=str(episode_id),
        scene_id=f"data/scene_datasets/mp3d/{scene_id}/{scene_id}.glb",
        start_position=list(start),
        start_rotation=[float(q) for q in quat_from_heading(heading)],
        instruction=InstructionData(
            instruction_text="walk forward and stop",
            instruction_tokens=(tokens or [5, 9, 2, 17, 3] + [0] * 195),
        ),
        goals=[NavigationGoal(position=list(goal), radius=3.0)],
        reference_path=[list(start), list(goal)],
        trajectory_id=str(episode_id),
        tour_id=tour_id,
    )


def make_tour_episodes(
    scene_id="sceneA", n_tours=2, eps_per_tour=3, seed=0, max_geo=4.0
):
    """Tour episodes with starts/goals within max_geo meters (so the
    expert finishes well inside small step limits)."""
    sim = FakeSim(scene_id=scene_id)
    geo = SceneGeometry(scene_id)
    rng = np.random.default_rng(seed)
    h = geo.extent / 2 - 1.0

    def sample_pair():
        for _ in range(500):
            x, z = rng.uniform(-h, h, 2)
            if not geo.is_navigable_xz(x, z, margin=0.3):
                continue
            start = [float(x), 0.0, float(z)]
            gx, gz = x + rng.uniform(-3, 3), z + rng.uniform(-3, 3)
            if not geo.is_navigable_xz(gx, gz, margin=0.3):
                continue
            goal = [float(gx), 0.0, float(gz)]
            d = sim.geodesic_distance(start, goal)
            if 1.0 < d < max_geo:
                return start, goal
        raise RuntimeError("could not sample episode pair")

    episodes = []
    for t in range(n_tours):
        for _ in range(eps_per_tour):
            start, goal = sample_pair()
            episodes.append(
                make_episode(
                    episode_id=str(len(episodes)),
                    scene_id=scene_id,
                    start=start,
                    goal=goal,
                    tour_id=str(t),
                    heading=0.0,
                )
            )
    return episodes


class ListDataset:
    """Dataset stub over a fixed episode list."""

    def __init__(self, episodes):
        self.episodes = episodes

    def get_episode_iterator(self, **kwargs):
        from ivlnce_tpu.tasks.episode_iterator import TourBasedEpisodeIterator

        kwargs.setdefault("shuffle_tours", False)
        kwargs.setdefault("shuffle_episodes", False)
        kwargs.pop("shuffle", None)
        kwargs.pop("group_by_scene", None)
        return TourBasedEpisodeIterator(episodes=self.episodes, **kwargs)


def tiny_task_config(**overrides):
    cfg = get_config()
    task = cfg.TASK_CONFIG.clone()
    task.ENVIRONMENT.MAX_EPISODE_STEPS = 50
    task.SIMULATOR.TYPE = "FakeSim-v0"
    task.SIMULATOR.DEPTH_SENSOR.HEIGHT = 32
    task.SIMULATOR.DEPTH_SENSOR.WIDTH = 32
    task.SIMULATOR.RGB_SENSOR.HEIGHT = 32
    task.SIMULATOR.RGB_SENSOR.WIDTH = 32
    task.TASK.SENSORS = [
        "SHORTEST_PATH_SENSOR",
        "VLN_ORACLE_PROGRESS_SENSOR",
        "WORLD_ROBOT_POSE_SENSOR",
        "WORLD_ROBOT_ORIENTATION_SENSOR",
        "SEMANTIC12_SENSOR",
        "ENV_NAME_SENSOR",
        "GLOBAL_GPS_SENSOR",
    ]
    task.TASK.MEASUREMENTS = [
        "DISTANCE_TO_GOAL",
        "SUCCESS",
        "SPL",
        "PATH_LENGTH",
        "ORACLE_SUCCESS",
        "STEPS_TAKEN",
    ]
    for k, v in overrides.items():
        node = task
        parts = k.split(".")
        for part in parts[:-1]:
            node = node[part]
        node[parts[-1]] = v
    task.freeze()
    exp = cfg.clone()
    exp.TASK_CONFIG = task
    exp.freeze()
    return exp
