"""Core environment: episode management + task stepping + the iterative
tour phase machine.

Env plays habitat.Env's role (episode iterator, step limits, sensors,
measurements); VLNCEDaggerEnv and VLNCEIterativeEnv mirror the reference's
RLEnv wrappers (ivlnce_baselines/common/environments.py). The phase
machine's invariants (SURVEY.md section 3.4) are preserved exactly:

- reset() returns (obs, tour_done, produce_action); tour_done compares
  consecutive episodes' tour_id; same-tour resets restore the previous end
  pose and start oracle_start navigation;
- step() returns the 7-tuple (obs, reward, agent_episode_done,
  sim_episode_done, tour_done, produce_action, info);
- dtw_data records (position, phase, episode_id) BEFORE acting;
- ORACLE_PHASES=False teleports between episodes;
- oracle failures warn + STOP + optionally teleport (only toward starts).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ivlnce_tpu.envs.fake_sim import FakeSim
from ivlnce_tpu.envs.shortest_path import ShortestPathFollower
from ivlnce_tpu.envs.sim_api import (
    GreedyFollowerError,
    SimActions,
    heading_from_quat,
    quat_from_heading,
)
from ivlnce_tpu.tasks.dataset import make_dataset
from ivlnce_tpu.tasks.measures import build_measurements
from ivlnce_tpu.tasks.sensors import InstructionSensor, build_sensors
from ivlnce_tpu.utils.registry import registry

logger = logging.getLogger("ivlnce_tpu")


def make_sim(task_config, scene_id: str = "fake_scene"):
    """Simulator factory: habitat-sim if available and requested, else the
    deterministic FakeSim."""
    sim_type = task_config.SIMULATOR.TYPE
    if sim_type in ("Sim-v0", "HabitatSim-v0"):
        try:
            from ivlnce_tpu.envs.habitat_backend import HabitatSimAdapter

            return HabitatSimAdapter(task_config.SIMULATOR, scene_id)
        except ImportError:
            logger.debug(
                "habitat-sim unavailable; using FakeSim-v0 (deterministic "
                "procedural scenes)"
            )
    return FakeSim(task_config.SIMULATOR, scene_id)


class Env:
    """Episode-managing environment over a Simulator."""

    def __init__(self, config, dataset=None):
        self._config = config  # a TASK_CONFIG tree
        if dataset is None:
            dataset = make_dataset(config.DATASET.TYPE, config.DATASET)
        self._dataset = dataset
        iter_opts = {
            k.lower(): v
            for k, v in config.ENVIRONMENT.ITERATOR_OPTIONS.items()
        }
        self.episode_iterator = dataset.get_episode_iterator(
            seed=config.SEED, **iter_opts
        )
        self.sim = make_sim(config)
        self.sensors = build_sensors(
            list(config.TASK.SENSORS), self.sim, config
        )
        # the tokenized-instruction sensor belongs to the R2R task only;
        # RxR tasks read TASK.INSTRUCTION_SENSOR_UUID=rxr_instruction and
        # ship precomputed BERT features instead (RxR episodes carry no
        # token lists, reference task.py:24-35 / sensors.py:118-158)
        if config.TASK.INSTRUCTION_SENSOR_UUID == "instruction":
            self.sensors.append(InstructionSensor())
        self.measurements = build_measurements(
            list(config.TASK.MEASUREMENTS), self.sim, config
        )
        self._current_episode = None
        self._elapsed_steps = 0
        self._episode_over = False
        self._called_stop = False
        self._max_episode_steps = config.ENVIRONMENT.MAX_EPISODE_STEPS

    @property
    def current_episode(self):
        assert self._current_episode is not None
        return self._current_episode

    @property
    def episode_over(self) -> bool:
        return self._episode_over

    @property
    def episodes(self):
        return self._dataset.episodes

    def _build_observations(self, sim_obs) -> Dict[str, Any]:
        obs = dict(sim_obs)
        for sensor in self.sensors:
            obs[sensor.uuid] = sensor.get_observation(
                observations=obs, episode=self._current_episode
            )
        return obs

    def reset(self) -> Dict[str, Any]:
        self._current_episode = next(self.episode_iterator)
        ep = self._current_episode
        self.sim.reconfigure(ep.scene_id)
        self.sim.set_agent_state(ep.start_position, ep.start_rotation)
        self._elapsed_steps = 0
        self._episode_over = False
        self._called_stop = False
        if "geodesic_distance" not in ep.info:
            ep.info["geodesic_distance"] = self.sim.geodesic_distance(
                ep.start_position, [g.position for g in ep.goals]
            )
        sim_obs = self.sim.reset()
        obs = self._build_observations(sim_obs)
        self.measurements.reset_measures(
            episode=ep, called_stop=False
        )
        return obs

    def step(self, action) -> Dict[str, Any]:
        if isinstance(action, dict):
            action = action["action"]
        action = int(action)
        assert not self._episode_over, "step() called after episode end"

        if action == SimActions.STOP:
            self._called_stop = True
            self._episode_over = True
            sim_obs = self.sim.render_observations()
        else:
            sim_obs = self.sim.step(action)

        self._elapsed_steps += 1
        if self._elapsed_steps >= self._max_episode_steps:
            self._episode_over = True

        obs = self._build_observations(sim_obs)
        self.measurements.update_measures(
            episode=self._current_episode, called_stop=self._called_stop
        )
        return obs

    def get_metrics(self) -> Dict[str, Any]:
        return self.measurements.get_metrics()


class RLEnv:
    def __init__(self, config, dataset=None):
        self._env = Env(config, dataset)

    @property
    def habitat_env(self):
        return self._env

    @property
    def current_episode(self):
        return self._env.current_episode

    def current_episode_info(self):
        """Pipe-friendly episode identity (the trainers only consume
        episode_id / tour_id / instruction text from current_episodes)."""
        ep = self._env.current_episode
        return {
            "episode_id": ep.episode_id,
            "tour_id": ep.tour_id,
            "instruction_text": (
                ep.instruction.instruction_text if ep.instruction else ""
            ),
        }

    def reset(self):
        return self._env.reset()

    def close(self):
        pass


@registry.register_env(name="VLNCEDaggerEnv")
class VLNCEDaggerEnv(RLEnv):
    """Plain episodic env (environments.py:16-33): zero reward, done at
    episode end, info = metrics."""

    def __init__(self, config, dataset=None):
        super().__init__(config.TASK_CONFIG, dataset)

    def get_reward(self, observations) -> float:
        return 0.0

    def get_done(self, observations) -> bool:
        return self._env.episode_over

    def get_info(self, observations) -> Dict[str, Any]:
        return self._env.get_metrics()

    def step(self, action):
        obs = self._env.step(action)
        return (
            obs,
            self.get_reward(obs),
            self.get_done(obs),
            self.get_info(obs),
        )


@registry.register_env(name="VLNCEIterativeEnv")
class VLNCEIterativeEnv(RLEnv):
    """Tour phase machine (environments.py:36-359)."""

    is_iterative: bool = True

    def __init__(self, config, dataset=None):
        super().__init__(config.TASK_CONFIG, dataset)
        self._task_config = config.TASK_CONFIG
        self._phase = ""
        self._progress_check_steps = 0
        self.shortest_path_follower = ShortestPathFollower(
            self._env.sim,
            config.TASK_CONFIG.SIMULATOR.FORWARD_STEP_SIZE,
            return_one_hot=False,
            stop_on_error=(
                config.TASK_CONFIG.ENVIRONMENT.ITERATIVE.ORACLE_STOP_ON_ERROR
            ),
        )
        self.dtw_data: List[Dict] = []

    # -- helpers ---------------------------------------------------------------
    def _next_phase(self) -> None:
        assert self._phase in ["agent", "oracle_goal", "oracle_start"]
        self._phase = {
            "agent": "oracle_goal",
            "oracle_goal": "oracle_start",
            "oracle_start": "agent",
        }[self._phase]
        self._progress_check_steps = 0

    def get_reward(self, observations) -> float:
        return 0.0

    def get_done(self, observations) -> bool:
        return self._env.episode_over

    def get_info(self, observations) -> Dict[str, Any]:
        return self._env.get_metrics()

    def append_dtw_step(self):
        self.dtw_data.append(
            {
                "position": list(
                    np.asarray(
                        self._env.sim.get_agent_state().position
                    ).tolist()
                ),
                "phase": self._phase,
                "episode_id": self._env.current_episode.episode_id,
            }
        )

    # -- reset -------------------------------------------------------------------
    def reset(self) -> Tuple[Dict, bool, bool]:
        self._phase = "agent"
        produce_action = True
        tour_done = True
        self._progress_check_steps = 0
        self.dtw_data = []

        prev_episode = self._env._current_episode
        if prev_episode is None:
            return self._env.reset(), tour_done, produce_action

        prev_agent_state = self._env.sim.get_agent_state()
        prev_tour_id = prev_episode.tour_id
        observations = self._env.reset()
        tour_done = prev_tour_id != self._env.current_episode.tour_id

        if tour_done:
            return observations, tour_done, produce_action

        if self._task_config.ENVIRONMENT.ITERATIVE.ORACLE_PHASES:
            # move agent back to the previous episode's ending pose
            self._phase = "oracle_start"
            self._env.sim.set_agent_state(
                position=prev_agent_state.position,
                rotation=prev_agent_state.rotation,
                reset_sensors=True,
            )
            action, _ = self._get_next_action_safe(
                position_to=self._env.current_episode.start_position,
                heading_to=self._env.current_episode.start_rotation,
                teleport_on_failure=True,
            )
            if action == SimActions.STOP:
                self._next_phase()
            else:
                produce_action = False

        return observations, tour_done, produce_action

    # -- oracle machinery -------------------------------------------------------
    def _get_next_action_safe(
        self,
        position_to,
        heading_to=None,
        teleport_on_failure: bool = False,
    ) -> Tuple[int, bool]:
        try:
            next_action = self._get_next_action(position_to, heading_to)
            step_limit = (
                self._task_config.ENVIRONMENT.ITERATIVE.ORACLE_STEP_ERROR_LIMIT
            )
            assert (
                self._progress_check_steps < step_limit or step_limit < 0
            ), "Too many oracle steps."
            return next_action, True
        except (GreedyFollowerError, AssertionError) as e:
            reason = (
                "too many steps"
                if isinstance(e, AssertionError)
                else "GreedyFollowerError"
            )
            logger.warning(
                "Oracle _get_next_action() failed. Reason: %s."
                " Episode: %s Position: %s Attempted Goal: %s Phase: %s",
                reason,
                self._env.current_episode.episode_id,
                self._env.sim.get_agent_state().position,
                position_to,
                self._phase,
            )
            if teleport_on_failure:
                if heading_to is None:
                    heading_to = self._env.sim.get_agent_state().rotation
                self._env.sim.set_agent_state(
                    position=position_to,
                    rotation=heading_to,
                    reset_sensors=True,
                )
            return SimActions.STOP, False

    def _get_next_action(self, position_to, heading_to=None) -> int:
        """Oracle action; once at the goal, align heading to within
        TURN_ANGLE/2 (environments.py:195-232)."""
        action = self.shortest_path_follower.get_next_action(position_to)
        if action == SimActions.STOP and heading_to is not None:
            start_rot = np.rad2deg(
                heading_from_quat(np.asarray(heading_to, np.float64))
            )
            current_rot = np.rad2deg(
                heading_from_quat(
                    np.asarray(
                        self._env.sim.get_agent_state().rotation, np.float64
                    )
                )
            )
            delta = ((((start_rot - current_rot) % 360) + 540) % 360) - 180
            if abs(delta) >= self._task_config.SIMULATOR.TURN_ANGLE / 2:
                action = (
                    SimActions.TURN_RIGHT
                    if delta < 0
                    else SimActions.TURN_LEFT
                )
        return action

    def _oracle_target(self):
        if self._phase == "oracle_goal":
            return self._env.current_episode.goals[0].position, None
        return (
            self._env.current_episode.start_position,
            self._env.current_episode.start_rotation,
        )

    def _step_oracle(self) -> Dict:
        assert self._phase in ["oracle_goal", "oracle_start"]
        position_to, heading_to = self._oracle_target()
        action = self._get_next_action(position_to, heading_to)
        # oracle steps bypass episode-over bookkeeping: act on the sim,
        # refresh sensors (habitat task.step equivalent)
        if action != SimActions.STOP:
            sim_obs = self._env.sim.step(action)
        else:
            sim_obs = self._env.sim.render_observations()
        observations = self._env._build_observations(sim_obs)

        position_to, heading_to = self._oracle_target()
        next_action, _ = self._get_next_action_safe(
            position_to,
            heading_to,
            teleport_on_failure=self._phase == "oracle_start",
        )
        if next_action == SimActions.STOP:
            if (
                self._phase == "oracle_start"
                and self._task_config.ENVIRONMENT.ITERATIVE.PRECISE_EPISODE_START
            ):
                self._env.sim.set_agent_state(
                    position=position_to,
                    rotation=heading_to,
                    reset_sensors=True,
                )
            self._next_phase()
        self._progress_check_steps += 1
        return observations

    # -- step ----------------------------------------------------------------------
    def step(self, *args, **kwargs):
        observations: Dict = {}
        reward = 0.0
        agent_episode_done = True
        sim_episode_done = False
        tour_done = False
        produce_action = False
        info: Dict = {}

        self.append_dtw_step()
        iterative_cfg = self._task_config.ENVIRONMENT.ITERATIVE

        if self._phase == "agent":
            observations = self._env.step(*args, **kwargs)
            reward = self.get_reward(observations)
            agent_episode_done = self.get_done(observations)
            produce_action = True
            info = self.get_info(observations)

            if agent_episode_done:
                self._next_phase()
                produce_action = False

                if not iterative_cfg.ORACLE_PHASES:
                    self._phase = "agent"
                    sim_episode_done = True
                else:
                    next_action, _ = self._get_next_action_safe(
                        self._env.current_episode.goals[0].position
                    )
                    if (
                        next_action == SimActions.STOP
                        or not iterative_cfg.ORACLE_GOAL_PHASE
                    ):
                        self._next_phase()
                        sim_episode_done = True

        elif self._phase == "oracle_goal":
            observations = self._step_oracle()
            if self._phase == "oracle_start":
                sim_episode_done = True

        elif self._phase == "oracle_start":
            observations = self._step_oracle()
            if self._phase == "agent":
                produce_action = True

        if agent_episode_done or sim_episode_done:
            info["dtw_data"] = self.dtw_data

        return (
            observations,
            reward,
            agent_episode_done,
            sim_episode_done,
            tour_done,
            produce_action,
            info,
        )
