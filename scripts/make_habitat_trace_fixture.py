#!/usr/bin/env python3
"""Author the habitat-sim trace-replay fixture (VERDICT r2 item 9).

habitat-sim cannot run in this environment, so the adapter
(`ivlnce_tpu/envs/habitat_backend.py`) is validated against a trace
authored AT THE habitat-sim API LEVEL: raw sensor frames exactly as the
simulator returns them (RGBA uint8, depth in meters, semantic instance
ids) plus agent states (position, quaternion), with golden expected
outputs computed here from the REFERENCE's own conventions:

- orientation goldens come from scipy Rotation.as_rotvec — the exact
  call the reference makes (habitat_extensions/sensors.py:239-250) —
  so the repo's scipy-free reimplementation is pinned cross-library;
- depth/rgb/semantic postprocessing goldens follow habitat-lab's sensor
  postprocess (clip to [MIN,MAX], normalize, strip alpha) and the
  Semantic12 whitelist (sensors.py:253-329);
- follower cases give navmesh-style straight waypoint paths and the
  expected steering action of habitat's waypoint-following
  GreedyGeodesicFollower model.

Output: data/fixtures/habitat_trace.npz, replayed by
tests/test_habitat_trace_replay.py without scipy.
"""

import json
import os
import sys

import numpy as np
from scipy.spatial.transform import Rotation as R

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "fixtures", "habitat_trace.npz",
)

rng = np.random.default_rng(7)
H = W = 8

# --- agent-state trace: yaw-only, pitched, and composed rotations ----------
quats = []  # xyzw, habitat convention (rotation about +y = yaw of -z)
for yaw_deg in (0.0, 30.0, -30.0, 90.0, -90.0, 179.0):
    quats.append(R.from_euler("y", yaw_deg, degrees=True).as_quat())
# pitch (elevation) only, and yaw*pitch compositions as habitat composes
# sensor orientation: R_yaw @ R_pitch
for yaw_deg, pitch_deg in ((0.0, -20.0), (45.0, 15.0), (-120.0, -10.0)):
    quats.append(
        (
            R.from_euler("y", yaw_deg, degrees=True)
            * R.from_euler("x", pitch_deg, degrees=True)
        ).as_quat()
    )
quats = np.asarray(quats, np.float64)

# golden (elevation, heading) = rotvec[:2], the reference's exact math
rotvecs = np.stack([R.from_quat(q).as_rotvec() for q in quats])
golden_elev_heading = rotvecs[:, :2].astype(np.float64)

positions = rng.uniform(-5, 5, size=(len(quats), 3)).astype(np.float64)
positions[:, 1] = 0.0

# --- raw frames + postprocess goldens --------------------------------------
# depth in meters spanning below MIN, inside, above MAX (habitat clip
# range [0, 10] with NORMALIZE_DEPTH -> /10)
depth_raw = np.stack(
    [
        np.full((H, W), 5.0, np.float32),
        np.linspace(-1.0, 12.0, H * W, dtype=np.float32).reshape(H, W),
    ]
)
MIN_D, MAX_D = 0.0, 10.0
depth_expected = (
    np.clip(depth_raw, MIN_D, MAX_D) - MIN_D
) / (MAX_D - MIN_D)

rgba_raw = rng.integers(0, 256, size=(2, H, W, 4)).astype(np.uint8)
rgb_expected = rgba_raw[..., :3]

# semantic instance frames through a scene annotation table
annotations = [
    # (instance id string, mpcat40 name, raw name)
    ("0_0_0", "wall", "wall"),
    ("0_0_1", "bed", "bed"),
    ("0_0_2", "chair", "chair"),
    ("0_0_3", "furniture", "table"),  # use_fine -> raw 'table'
    ("0_0_4", "appliances", "oven"),  # fine name not whitelisted
    ("0_0_5", "plant", "plant"),
]
whitelist = [
    "shelving", "chest_of_drawers", "bed", "cushion", "fireplace",
    "sofa", "table", "chair", "cabinet", "plant", "counter", "sink",
]
use_fine = ["furniture", "appliances"]
sem_raw = rng.integers(0, len(annotations), size=(2, H, W)).astype(np.int32)
label_of = {}
for inst, mpcat40, raw in annotations:
    oid = int(inst.split("_")[-1])
    name = raw if mpcat40 in use_fine else mpcat40
    label_of[oid] = whitelist.index(name) + 1 if name in whitelist else 0
sem_expected = np.vectorize(label_of.get)(sem_raw).astype(np.uint8)

# --- semantic edge-case scene (VERDICT r4 item 10) --------------------------
# sparse high instance ids, use_fine indirection, null categories,
# non-numeric ids, and frame ids with no annotation at all — everything
# the Semantic12 LUT must survive that the dense scene above doesn't hit.
# annotation rows: (instance id string, mpcat40 name, raw name); None
# names mean a null category object (habitat scenes contain them).
edge_annotations = [
    ("0_0_3", "chair", "chair"),  # sparse: ids 0..2 unannotated
    ("1_2_97", "furniture", "table"),  # high id via region path, use_fine
    ("0_0_40", "misc", "misc"),  # not whitelisted -> void
    ("0_0_55", None, None),  # null category -> void
    ("junk", "bed", "bed"),  # non-numeric id -> skipped entirely
]
# frame covers: unannotated low id, each annotated id, and an id beyond
# the LUT (-> void, never the last entry's label)
edge_sem_raw = np.array(
    [[0, 3, 97, 40], [55, 3, 97, 8000]], np.int32
).reshape(1, 2, 4)
edge_sem_expected = np.array(
    [
        [0, whitelist.index("chair") + 1, whitelist.index("table") + 1, 0],
        [0, whitelist.index("chair") + 1, whitelist.index("table") + 1, 0],
    ],
    np.uint8,
).reshape(1, 2, 4)

# --- collision step sequence (VERDICT r4 item 10) ----------------------------
# authored at the habitat-sim API level: each step gives the action, the
# raw step obs ("collided" present or absent — habitat-lab's
# previous_step_collided reads _prev_sim_obs.get("collided")), the agent
# displacement the mock applies, and the golden previous_step_collided
# AFTER the step (habitat_backend.py step()).
MOVE_FWD_M = 0.25
STOP_A, FWD_A, LEFT_A = 0, 1, 2
collision_steps = [
    # habitat-sim reports the flag directly
    dict(action=FWD_A, collided=True, moved=0.0, expected=True),
    dict(action=FWD_A, collided=False, moved=MOVE_FWD_M, expected=False),
    # ALLOW_SLIDING: collided=True even though the agent slid most of a
    # step — the flag must win over any distance heuristic
    dict(action=FWD_A, collided=True, moved=0.2, expected=True),
    # no "collided" key in the raw obs (older habitat-sim): distance
    # heuristic — blocked forward step
    dict(action=FWD_A, collided=None, moved=0.0, expected=True),
    # heuristic: full forward step -> no collision
    dict(action=FWD_A, collided=None, moved=MOVE_FWD_M, expected=False),
    # heuristic applies to MOVE_FORWARD only: turning in place with no
    # displacement is not a collision
    dict(action=LEFT_A, collided=None, moved=0.0, expected=False),
    # a collision record survives until the next step...
    dict(action=FWD_A, collided=True, moved=0.0, expected=True),
    # ...and STOP clears it without consulting the sim
    dict(action=STOP_A, collided=None, moved=0.0, expected=False),
]

# --- follower scenarios -----------------------------------------------------
# each: agent (pos, quat), goal, waypoint polyline (navmesh-style straight
# segments), expected steering action (habitat GreedyGeodesicFollower
# model: STOP in radius 0.25; forward when aligned within TURN_ANGLE/2
# = 7.5 deg to the next waypoint; else turn toward it)
STOP, FWD, LEFT, RIGHT = 0, 1, 2, 3


def yawq(deg):
    return R.from_euler("y", deg, degrees=True).as_quat()


follower_cases = [
    # aligned straight run: goal 2 m ahead at heading 0 (-z)
    dict(pos=[0, 0, 0], quat=yawq(0), goal=[0, 0, -2],
         waypoints=[[0, 0, 0], [0, 0, -2]], expected=FWD),
    # goal to the left (+x at heading 0 is agent's left? heading of -z;
    # desired heading to (-2,0,0) is atan2(2,0)=+90 deg -> delta +90 -> LEFT
    dict(pos=[0, 0, 0], quat=yawq(0), goal=[-2, 0, 0],
         waypoints=[[0, 0, 0], [-2, 0, 0]], expected=LEFT),
    # goal to the right: (+2,0,0) -> desired -90 -> RIGHT
    dict(pos=[0, 0, 0], quat=yawq(0), goal=[2, 0, 0],
         waypoints=[[0, 0, 0], [2, 0, 0]], expected=RIGHT),
    # within goal radius -> STOP regardless of waypoints
    dict(pos=[0, 0, 0], quat=yawq(40), goal=[0.1, 0, -0.1],
         waypoints=[[0, 0, 0], [0.1, 0, -0.1]], expected=STOP),
    # dog-leg path: first segment bends left around a corner at (0,0,-1),
    # next waypoint (-1,0,-1); from origin the first waypoint beyond the
    # lookahead lies on the segment toward (0,0,-1) -> aligned -> FWD
    dict(pos=[0, 0, 0], quat=yawq(0), goal=[-1, 0, -1],
         waypoints=[[0, 0, 0], [0, 0, -1], [-1, 0, -1]], expected=FWD),
    # slight misalignment beyond tolerance: heading 20 deg, goal ahead
    dict(pos=[0, 0, 0], quat=yawq(20), goal=[0, 0, -2],
         waypoints=[[0, 0, 0], [0, 0, -2]], expected=RIGHT),
    # slight misalignment within tolerance (5 deg < 7.5) -> FWD
    dict(pos=[0, 0, 0], quat=yawq(5), goal=[0, 0, -2],
         waypoints=[[0, 0, 0], [0, 0, -2]], expected=FWD),
]

os.makedirs(os.path.dirname(OUT), exist_ok=True)
np.savez_compressed(
    OUT,
    quats=quats,
    positions=positions,
    golden_elev_heading=golden_elev_heading,
    depth_raw=depth_raw,
    depth_expected=depth_expected,
    rgba_raw=rgba_raw,
    rgb_expected=rgb_expected,
    sem_raw=sem_raw,
    sem_expected=sem_expected,
    annotations=json.dumps(annotations),
    edge_annotations=json.dumps(edge_annotations),
    edge_sem_raw=edge_sem_raw,
    edge_sem_expected=edge_sem_expected,
    collision_steps=json.dumps(collision_steps),
    follower_cases=json.dumps(
        [
            {
                k: (v if isinstance(v, (int, list)) else np.asarray(v).tolist())
                for k, v in c.items()
            }
            for c in follower_cases
        ]
    ),
)
print(f"wrote {OUT}")
print("golden elev/heading rows:")
for q, eh in zip(quats, golden_elev_heading):
    print(f"  q={np.round(q, 4)} -> elev={eh[0]:+.6f} heading={eh[1]:+.6f}")
