#!/usr/bin/env python3
"""Generate a synthetic VLN-CE dataset over FakeSim procedural scenes.

Produces the exact file surface the reference consumes:
- data/datasets/fake/{split}/{split}.json.gz   episodes + instruction_vocab
- data/datasets/fake/tours.json                split -> scene -> tours
- data/datasets/fake/{split}/{split}_gt.json.gz   nDTW GT locations
- data/datasets/fake/gt_ndtw.json              iterative GT paths (t-nDTW)
- data/datasets/fake/embeddings.json.gz        vocab x 50 embeddings

The GT iterative paths are produced by rolling the shortest-path expert
through the iterative env so t-nDTW has faithful per-phase step records.
"""

import argparse
import gzip
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ivlnce_tpu.envs.fake_sim import FakeSim, SceneGeometry  # noqa: E402
from ivlnce_tpu.envs.sim_api import quat_from_heading  # noqa: E402

VOCAB = 200
WORDS = [
    "walk", "turn", "left", "right", "forward", "stop", "past", "the",
    "chair", "table", "sofa", "bed", "door", "room", "hall", "around",
    "toward", "near", "into", "exit", "then", "and", "at", "of", "to",
]


def sample_episode(sim, geo, rng, max_geo=8.0, min_geo=2.0):
    h = geo.extent / 2 - 1.0
    for _ in range(1000):
        x, z = rng.uniform(-h, h, 2)
        if not geo.is_navigable_xz(x, z, margin=0.3):
            continue
        gx, gz = rng.uniform(-h, h, 2)
        if not geo.is_navigable_xz(gx, gz, margin=0.3):
            continue
        start = [float(x), 0.0, float(z)]
        goal = [float(gx), 0.0, float(gz)]
        d = sim.geodesic_distance(start, goal)
        if min_geo < d < max_geo:
            return start, goal, d
    raise RuntimeError("sampling failed")


def make_instruction(rng):
    n = rng.integers(6, 18)
    words = [WORDS[rng.integers(0, len(WORDS))] for _ in range(n)]
    tokens = [WORDS.index(w) + 2 for w in words]  # 0 pad, 1 unk
    return " ".join(words), tokens


def expert_rollout(sim, start, start_rot, goal):
    """Greedy expert path for GT locations."""
    from ivlnce_tpu.envs.shortest_path import ShortestPathFollower

    sim.set_agent_state(start, start_rot)
    follower = ShortestPathFollower(sim, goal_radius=0.5)
    locations = [list(map(float, sim.get_agent_state().position))]
    actions = []
    for _ in range(200):
        a = follower.get_next_action(goal)
        actions.append(int(a))
        if a == 0:
            break
        sim.step(a)
        locations.append(list(map(float, sim.get_agent_state().position)))
    return locations, actions


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="data/datasets/fake")
    parser.add_argument("--scenes", type=int, default=3)
    parser.add_argument("--tours-per-scene", type=int, default=2)
    parser.add_argument("--episodes-per-tour", type=int, default=4)
    parser.add_argument("--splits", nargs="+",
                        default=["train", "val_seen", "val_unseen"])
    parser.add_argument("--seed", type=int, default=7)
    args = parser.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)

    tours_json = {}
    gt_ndtw_iterative = {}
    for si, split in enumerate(args.splits):
        episodes = []
        split_tours = {}
        gt_paths = {}
        ep_id = 0
        tour_counter = 0
        for sc in range(args.scenes):
            scene = f"fake{split}{sc}"
            sim = FakeSim(scene_id=scene)
            geo = sim.scene
            scene_tours = []
            for _t in range(args.tours_per_scene):
                tour_eids = []
                for _e in range(args.episodes_per_tour):
                    start, goal, d = sample_episode(sim, geo, rng)
                    heading = float(rng.uniform(0, 2 * math.pi))
                    text, tokens = make_instruction(rng)
                    locations, _ = expert_rollout(
                        sim, start, quat_from_heading(heading).tolist(), goal
                    )
                    episodes.append(
                        {
                            "episode_id": str(ep_id),
                            "trajectory_id": str(ep_id),
                            "scene_id": f"mp3d/{scene}/{scene}.glb",
                            "start_position": start,
                            "start_rotation": [
                                float(v) for v in quat_from_heading(heading)
                            ],
                            "info": {"geodesic_distance": d},
                            "goals": [{"position": goal, "radius": 3.0}],
                            "instruction": {
                                "instruction_text": text,
                                "instruction_tokens": tokens,
                            },
                            "reference_path": locations,
                        }
                    )
                    gt_paths[str(ep_id)] = {"locations": locations}
                    tour_eids.append(str(ep_id))
                    ep_id += 1
                scene_tours.append(tour_eids)
                tour_counter += 1
            split_tours[scene] = scene_tours

        os.makedirs(os.path.join(args.out, split), exist_ok=True)
        with gzip.open(
            os.path.join(args.out, split, f"{split}.json.gz"), "wt"
        ) as f:
            json.dump(
                {
                    "episodes": episodes,
                    "instruction_vocab": {
                        "word_list": ["<pad>", "<unk>"] + WORDS
                    },
                },
                f,
            )
        with gzip.open(
            os.path.join(args.out, split, f"{split}_gt.json.gz"), "wt"
        ) as f:
            json.dump(gt_paths, f)
        tours_json[split] = split_tours

        # iterative GT paths: expert tours through the iterative env
        gt_ndtw_iterative[split] = make_iterative_gt(
            args.out, split, episodes, split_tours
        )

    with open(os.path.join(args.out, "tours.json"), "w") as f:
        json.dump(tours_json, f)
    with open(os.path.join(args.out, "gt_ndtw.json"), "w") as f:
        json.dump(gt_ndtw_iterative, f)

    emb = np.random.default_rng(0).normal(
        0, 0.3, (len(WORDS) + 2, 50)
    ).astype(np.float64)
    emb[0] = 0.0
    emb[1] = emb[2:].mean(0)
    with gzip.open(os.path.join(args.out, "embeddings.json.gz"), "wt") as f:
        json.dump(emb.tolist(), f)

    print(f"wrote fake dataset to {args.out}")


def make_iterative_gt(out_dir, split, episodes, split_tours):
    """Roll the expert through the iterative env to record per-phase GT
    tour paths for t-nDTW."""
    from ivlnce_tpu.config import get_config
    from ivlnce_tpu.tasks.dataset import VLNExtendedEpisode

    cfg = get_config()
    task = cfg.TASK_CONFIG.clone()
    task.SIMULATOR.TYPE = "FakeSim-v0"
    task.SIMULATOR.DEPTH_SENSOR.HEIGHT = 32
    task.SIMULATOR.DEPTH_SENSOR.WIDTH = 32
    task.SIMULATOR.RGB_SENSOR.HEIGHT = 32
    task.SIMULATOR.RGB_SENSOR.WIDTH = 32
    task.ENVIRONMENT.MAX_EPISODE_STEPS = 200
    task.ENVIRONMENT.ITERATIVE.ENABLED = True
    task.TASK.SENSORS = ["SHORTEST_PATH_SENSOR"]
    task.TASK.MEASUREMENTS = ["DISTANCE_TO_GOAL", "SUCCESS"]
    task.freeze()
    exp = cfg.clone()
    exp.TASK_CONFIG = task
    exp.freeze()

    ep_by_id = {}
    for e in episodes:
        ep = VLNExtendedEpisode.from_json(dict(e))
        ep_by_id[ep.episode_id] = ep

    gt = {}
    tour_global = 0
    for scene, tours in split_tours.items():
        for tour in tours:
            eps = []
            for eid in tour:
                ep = ep_by_id[eid]
                ep.tour_id = str(tour_global)
                eps.append(ep)

            gt[str(tour_global)] = _collect_tour_dtw(exp, eps)
            tour_global += 1
    return gt


def _collect_tour_dtw(exp, eps):
    """Re-run the expert over a tour, concatenating per-episode dtw_data
    (the eval loop extends per sim_done, base_il_trainer.py:799-803)."""
    from ivlnce_tpu.envs.env import VLNCEIterativeEnv

    class _DS:
        def __init__(self, eps):
            self.episodes = eps

        def get_episode_iterator(self, **kwargs):
            from ivlnce_tpu.tasks.episode_iterator import (
                TourBasedEpisodeIterator,
            )

            return TourBasedEpisodeIterator(
                episodes=self.episodes,
                shuffle_tours=False,
                shuffle_episodes=False,
            )

    env = VLNCEIterativeEnv(exp, _DS(eps))
    obs, _, produce_action = env.reset()
    collected = []
    done_eps = 0
    for _ in range(20000):
        a = int(obs["shortest_path_sensor"][0]) if produce_action else 0
        obs, _, _, sim_done, _, produce_action, info = env.step(a)
        if sim_done:
            if "dtw_data" in info:
                collected.extend(info["dtw_data"])
            done_eps += 1
            if done_eps >= len(eps):
                break
            obs, _, produce_action = env.reset()
    return collected


if __name__ == "__main__":
    main()
