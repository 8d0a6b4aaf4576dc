"""Greedy shortest-path follower over the Simulator protocol.

Equivalent role to habitat's ShortestPathFollower (used by the reference
for oracle phases, environments.py:49-54, and the expert action sensor,
sensors.py:88-115): pick the action whose simulated outcome minimizes
geodesic distance to the goal; STOP within the goal radius.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np

from ivlnce_tpu.envs.sim_api import GreedyFollowerError, SimActions


class ShortestPathFollower:
    def __init__(
        self,
        sim,
        goal_radius: float,
        return_one_hot: bool = False,
        stop_on_error: bool = False,
    ):
        assert not return_one_hot
        self._sim = sim
        self._goal_radius = goal_radius
        self._stop_on_error = stop_on_error

    def get_next_action(self, goal_pos: Sequence[float]) -> Optional[int]:
        state = self._sim.get_agent_state()
        current = self._sim.geodesic_distance(state.position, goal_pos)
        euclid = float(
            np.linalg.norm(
                np.asarray(state.position, float)[[0, 2]]
                - np.asarray(goal_pos, float)[[0, 2]]
            )
        )
        if min(current, euclid) <= self._goal_radius:
            return SimActions.STOP
        if not math.isfinite(current):
            if self._stop_on_error:
                return SimActions.STOP
            raise GreedyFollowerError(
                f"goal {goal_pos} unreachable from {state.position}"
            )

        best_action, best_cost = None, np.inf
        for action, steps in (
            (SimActions.MOVE_FORWARD, 1),
            (SimActions.TURN_LEFT, 1),
            (SimActions.TURN_RIGHT, 1),
        ):
            cost = self._simulate_cost(action, goal_pos)
            if cost < best_cost - 1e-9:
                best_cost = cost
                best_action = action

        if best_action is None or best_cost >= current + 1e-6:
            # no single action helps: try turning toward the goal
            best_action = self._turn_toward(goal_pos)
        return best_action

    def _simulate_cost(self, action: int, goal_pos) -> float:
        """Cost after taking `action` (forward = geodesic after the move;
        turns = geodesic after turn + one forward, so turning toward a
        better direction scores well)."""
        sim = self._sim
        saved_state = sim.get_agent_state()
        try:
            sim.step(action)
            if action != SimActions.MOVE_FORWARD:
                sim.step(SimActions.MOVE_FORWARD)
            pos = sim.get_agent_state().position
            d = sim.geodesic_distance(pos, goal_pos)
            # prefer actions that move (penalize collisions slightly)
            if action == SimActions.MOVE_FORWARD and np.allclose(
                pos, saved_state.position
            ):
                d = np.inf
            # count extra steps so forward wins ties
            steps = 1 if action == SimActions.MOVE_FORWARD else 2
            return d + steps * 1e-3
        finally:
            sim.set_agent_state(saved_state.position, saved_state.rotation)

    def _turn_toward(self, goal_pos) -> int:
        from ivlnce_tpu.envs.sim_api import heading_from_quat

        state = self._sim.get_agent_state()
        desired = math.atan2(
            -(goal_pos[0] - state.position[0]),
            -(goal_pos[2] - state.position[2]),
        )
        current = heading_from_quat(state.rotation)
        delta = ((desired - current + math.pi) % (2 * math.pi)) - math.pi
        return SimActions.TURN_LEFT if delta > 0 else SimActions.TURN_RIGHT
