"""Simulator interface.

The framework treats the simulator as an external host-side boundary
(SURVEY.md: habitat-sim is C++/OpenGL and stays off-TPU). Any backend
implementing this protocol plugs into the env layer:

- FakeSim (envs/fake_sim.py): deterministic procedural scenes — the test
  and benchmark backend for this environment (no habitat/MP3D data).
- HabitatSim (envs/habitat_backend.py): adapter over habitat-sim when the
  habitat stack is installed.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Protocol, Sequence

import numpy as np


@dataclass
class AgentState:
    position: np.ndarray  # (3,) world x, y, z (y up)
    rotation: np.ndarray  # (4,) quaternion x, y, z, w


def quat_from_heading(heading: float) -> np.ndarray:
    """Quaternion for a pure yaw about +y (habitat convention: heading is
    the angle of -z rotated about y)."""
    return np.array(
        [0.0, math.sin(heading / 2), 0.0, math.cos(heading / 2)], np.float64
    )


def heading_from_quat(q: Sequence[float]) -> float:
    from ivlnce_tpu.ops.geometry import heading_from_quaternion

    return heading_from_quaternion(q[0], q[1], q[2], q[3])


class Simulator(Protocol):
    def reconfigure(self, scene_id: str) -> None: ...

    def reset(self) -> Dict[str, np.ndarray]: ...

    def step(self, action: int) -> Dict[str, np.ndarray]: ...

    def get_agent_state(self) -> AgentState: ...

    def set_agent_state(
        self,
        position: Sequence[float],
        rotation: Sequence[float],
        reset_sensors: bool = True,
    ) -> None: ...

    def geodesic_distance(
        self, position_a, position_b, episode=None
    ) -> float: ...

    def is_navigable(self, position) -> bool: ...

    def sample_navigable_point(self) -> List[float]: ...


class SimActions:
    """Habitat action ids (habitat-lab HabitatSimActions)."""

    STOP = 0
    MOVE_FORWARD = 1
    TURN_LEFT = 2
    TURN_RIGHT = 3


class GreedyFollowerError(RuntimeError):
    """Raised when the shortest-path follower cannot make progress
    (habitat_sim.errors.GreedyFollowerError equivalent,
    environments.py:168)."""
