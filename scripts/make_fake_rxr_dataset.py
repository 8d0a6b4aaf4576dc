#!/usr/bin/env python3
"""Generate a synthetic RxR-VLN-CE dataset over FakeSim procedural scenes.

Produces the exact RxR file surface the reference consumes
(habitat_extensions/task.py:208-315, sensors.py:118-158):
- data/datasets/fake_rxr/{split}/{split}_{role}.json.gz   episodes per role
- data/datasets/fake_rxr/{split}/{split}_gt.json.gz       nDTW GT locations
- data/datasets/fake_rxr/text_features/rxr_{split}/
      {id:06}_{lang}_text_features.npz                    BERT-style features

RxR episodes carry NO instruction tokens — instructions ship as
precomputed per-token features of shape (T, 768), padded by the sensor
to (512, 768).
"""

import argparse
import gzip
import json
import math
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from ivlnce_tpu.envs.fake_sim import FakeSim  # noqa: E402
from ivlnce_tpu.envs.sim_api import quat_from_heading  # noqa: E402
from make_fake_dataset import (  # noqa: E402
    expert_rollout,
    sample_episode,
)

LANGUAGES = ["en-US", "hi-IN"]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="data/datasets/fake_rxr")
    parser.add_argument("--scenes", type=int, default=2)
    parser.add_argument("--episodes-per-scene", type=int, default=2)
    parser.add_argument("--splits", nargs="+",
                        default=["train", "val_seen"])
    parser.add_argument("--roles", nargs="+", default=["guide"])
    parser.add_argument("--feature-tokens", type=int, default=12)
    parser.add_argument("--seed", type=int, default=11)
    args = parser.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    iid = 0
    for split in args.splits:
        feat_dir = os.path.join(
            args.out, "text_features", f"rxr_{split}"
        )
        os.makedirs(feat_dir, exist_ok=True)
        os.makedirs(os.path.join(args.out, split), exist_ok=True)
        gt_paths = {}
        ep_id = 0
        for role in args.roles:
            episodes = []
            for sc in range(args.scenes):
                scene = f"fake{split}{sc}"
                sim = FakeSim(scene_id=scene)
                geo = sim.scene
                for _e in range(args.episodes_per_scene):
                    start, goal, d = sample_episode(sim, geo, rng)
                    heading = float(rng.uniform(0, 2 * math.pi))
                    lang = LANGUAGES[iid % len(LANGUAGES)]
                    locations, _ = expert_rollout(
                        sim, start,
                        quat_from_heading(heading).tolist(), goal,
                    )
                    # per-token BERT-style features: T real rows, the
                    # sensor zero-pads to (512, 768)
                    t = int(rng.integers(4, args.feature_tokens + 1))
                    feats = rng.normal(0, 0.3, (t, 768)).astype(np.float32)
                    np.savez(
                        os.path.join(
                            feat_dir,
                            f"{iid:06}_{lang.split('-')[0]}"
                            "_text_features.npz",
                        ),
                        features=feats,
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
                                "instruction_text": f"rxr instruction {iid}",
                                "instruction_id": str(iid),
                                "language": lang,
                                "annotator_id": "0",
                                "edit_distance": 0.0,
                            },
                            "reference_path": locations,
                        }
                    )
                    gt_paths[str(ep_id)] = {"locations": locations}
                    ep_id += 1
                    iid += 1
            with gzip.open(
                os.path.join(args.out, split, f"{split}_{role}.json.gz"),
                "wt",
            ) as f:
                json.dump({"episodes": episodes}, f)
        with gzip.open(
            os.path.join(args.out, split, f"{split}_gt.json.gz"), "wt"
        ) as f:
            json.dump(gt_paths, f)

    print(f"wrote fake RxR dataset to {args.out}")


if __name__ == "__main__":
    main()
