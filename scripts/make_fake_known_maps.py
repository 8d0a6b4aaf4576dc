#!/usr/bin/env python3
"""Generate per-scene known-map point clouds for the synthetic dataset.

Reference known maps are pre-scanned per-scene npz files
{xyz (N, 3) float32, semantics (N,) uint8} loaded into the world point
cloud at episode start (reference mapper.py:283-294, 851-881;
data/known_maps/{gt,pred}_semantics/{scene}.npz).

For FakeSim procedural scenes we sample the scene geometry directly: box
obstacle surfaces at several heights (with their semantic labels) and the
boundary walls (label 0 = void; contributes occupancy only).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ivlnce_tpu.envs.fake_sim import SceneGeometry

HEIGHTS = [0.2, 0.5, 0.8, 1.1]
SPACING = 0.05


def scene_points(scene_id: str):
    geo = SceneGeometry(scene_id)
    xyz, sem = [], []

    def add_segment(x0, z0, x1, z1, label):
        length = max(abs(x1 - x0), abs(z1 - z0))
        n = max(2, int(length / SPACING))
        xs = np.linspace(x0, x1, n)
        zs = np.linspace(z0, z1, n)
        for y in HEIGHTS:
            xyz.append(np.stack([xs, np.full(n, y), zs], 1))
            sem.append(np.full(n, label, np.uint8))

    for (x0, z0, x1, z1, label) in geo.boxes:
        add_segment(x0, z0, x1, z0, label)
        add_segment(x1, z0, x1, z1, label)
        add_segment(x1, z1, x0, z1, label)
        add_segment(x0, z1, x0, z0, label)

    h = geo.extent / 2
    for (x0, z0, x1, z1) in [
        (-h, -h, h, -h), (h, -h, h, h), (h, h, -h, h), (-h, h, -h, -h),
    ]:
        add_segment(x0, z0, x1, z1, 0)

    return (
        np.concatenate(xyz).astype(np.float32),
        np.concatenate(sem),
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--out", default="data/known_maps/gt_semantics", type=str
    )
    parser.add_argument("--scenes", type=int, default=3)
    parser.add_argument(
        "--splits", nargs="+", default=["train", "val_seen", "val_unseen"]
    )
    args = parser.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for split in args.splits:
        for sc in range(args.scenes):
            scene = f"fake{split}{sc}"
            xyz, sem = scene_points(scene)
            np.savez_compressed(
                os.path.join(args.out, f"{scene}.npz"),
                xyz=xyz,
                semantics=sem,
            )
            print(f"{scene}: {len(xyz)} points")


if __name__ == "__main__":
    main()
