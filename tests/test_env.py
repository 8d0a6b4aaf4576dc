"""Tests for the env layer: FakeSim determinism, shortest-path follower,
episodic env, and the iterative 7-tuple phase machine (reference protocol
invariants, SURVEY.md section 3.4)."""

import numpy as np
import pytest

from ivlnce_tpu.envs.env import VLNCEDaggerEnv, VLNCEIterativeEnv
from ivlnce_tpu.envs.fake_sim import FakeSim
from ivlnce_tpu.envs.shortest_path import ShortestPathFollower
from ivlnce_tpu.envs.sim_api import SimActions

from .helpers import ListDataset, make_tour_episodes, tiny_task_config


def test_fake_sim_deterministic():
    s1 = FakeSim(scene_id="sceneA")
    s2 = FakeSim(scene_id="sceneA")
    for s in (s1, s2):
        s.set_agent_state([1.0, 0.0, 2.0], [0, 0, 0, 1])
    o1, o2 = s1.render_observations(), s2.render_observations()
    np.testing.assert_array_equal(o1["depth"], o2["depth"])
    np.testing.assert_array_equal(o1["rgb"], o2["rgb"])
    np.testing.assert_array_equal(o1["semantic12"], o2["semantic12"])
    # different scenes differ
    s3 = FakeSim(scene_id="sceneB")
    s3.set_agent_state([1.0, 0.0, 2.0], [0, 0, 0, 1])
    assert not np.array_equal(
        s3.render_observations()["depth"], o1["depth"]
    )


def test_fake_sim_motion_geometry():
    sim = FakeSim(scene_id="sceneA")
    sim.set_agent_state([0.0, 0.0, 0.0], [0, 0, 0, 1])
    sim.step(SimActions.MOVE_FORWARD)
    pos = sim.get_agent_state().position
    # heading 0 faces -z
    np.testing.assert_allclose(pos, [0.0, 0.0, -0.25], atol=1e-6)
    for _ in range(6):  # 90 degrees left
        sim.step(SimActions.TURN_LEFT)
    sim.step(SimActions.MOVE_FORWARD)
    pos = sim.get_agent_state().position
    np.testing.assert_allclose(pos, [-0.25, 0.0, -0.25], atol=1e-5)


def test_follower_reaches_goal():
    sim = FakeSim(scene_id="sceneA")
    start = sim.sample_navigable_point()
    sim.set_agent_state(start, [0, 0, 0, 1])
    goal = [start[0] + 3.0, 0.0, start[2]]
    if not sim.is_navigable(goal):
        goal = sim.sample_navigable_point()
    follower = ShortestPathFollower(sim, goal_radius=0.25)
    for _ in range(300):
        a = follower.get_next_action(goal)
        if a == SimActions.STOP:
            break
        sim.step(a)
    assert sim.geodesic_distance(sim.get_agent_state().position, goal) <= 0.5


def test_episodic_env_runs_expert_to_success():
    cfg = tiny_task_config()
    env = VLNCEDaggerEnv(cfg, ListDataset(make_tour_episodes()))
    obs = env.reset()
    assert "depth" in obs and "shortest_path_sensor" in obs
    assert obs["env_name"] == "sceneA"
    for _ in range(60):
        a = int(obs["shortest_path_sensor"][0])
        obs, reward, done, info = env.step(a)
        if done:
            break
    assert done
    assert info["success"] == 1.0, f"expert failed: {info}"
    assert info["spl"] > 0.5
    assert info["steps_taken"] >= 1


def test_iterative_env_phase_machine():
    cfg = tiny_task_config(**{"ENVIRONMENT.ITERATIVE.ENABLED": True})
    episodes = make_tour_episodes(n_tours=2, eps_per_tour=2)
    env = VLNCEIterativeEnv(cfg, ListDataset(episodes))

    obs, tour_done, produce_action = env.reset()
    assert tour_done  # first reset of a session
    assert produce_action

    seen_phases = set()
    episodes_finished = 0
    agent_finishes = 0
    tours_seen = 1
    was_agent_phase = True
    for _ in range(3000):
        if produce_action:
            action = int(obs["shortest_path_sensor"][0])
        else:
            action = 0  # ignored during oracle phases
        (
            obs, reward, agent_done, sim_done, tour_done_s, produce_action,
            info,
        ) = env.step(action)
        seen_phases.add(env._phase)
        assert tour_done_s is False  # step never reports tour_done
        # note: the reference (and we) return agent_episode_done=True on
        # every oracle step (environments.py:305) — count real agent
        # finishes as the agent-phase exits instead
        if was_agent_phase and agent_done and env._phase != "agent":
            agent_finishes += 1
            assert "dtw_data" in info
            assert {d["phase"] for d in info["dtw_data"]} >= {"agent"}
        was_agent_phase = env._phase == "agent"
        if sim_done:
            episodes_finished += 1
            obs, tour_done, produce_action = env.reset()
            was_agent_phase = env._phase == "agent"
            if tour_done:
                tours_seen += 1
            if episodes_finished >= 4:
                break
    assert episodes_finished >= 4
    assert agent_finishes >= 4
    assert "oracle_goal" in seen_phases or "oracle_start" in seen_phases
    assert tours_seen >= 2  # crossed a tour boundary


def test_iterative_env_teleport_mode():
    """ORACLE_PHASES=False: sim_episode_done right at agent done,
    next reset teleports (environments.py:324-326)."""
    cfg = tiny_task_config(
        **{
            "ENVIRONMENT.ITERATIVE.ENABLED": True,
            "ENVIRONMENT.ITERATIVE.ORACLE_PHASES": False,
        }
    )
    episodes = make_tour_episodes(n_tours=1, eps_per_tour=3)
    env = VLNCEIterativeEnv(cfg, ListDataset(episodes))
    obs, tour_done, produce_action = env.reset()
    for _ in range(400):
        a = int(obs["shortest_path_sensor"][0])
        obs, _, agent_done, sim_done, _, produce_action, info = env.step(a)
        if agent_done:
            assert sim_done  # no oracle phases
            obs, tour_done, produce_action = env.reset()
            assert produce_action
            # teleported to this episode's start
            np.testing.assert_allclose(
                env._env.sim.get_agent_state().position,
                env._env.current_episode.start_position,
                atol=1e-5,
            )
            break
    else:
        pytest.fail("episode never finished")


def test_dtw_data_recorded_before_acting():
    cfg = tiny_task_config(**{"ENVIRONMENT.ITERATIVE.ENABLED": True})
    env = VLNCEIterativeEnv(cfg, ListDataset(make_tour_episodes()))
    obs, _, _ = env.reset()
    start_pos = list(np.asarray(env._env.sim.get_agent_state().position))
    env.step(1)
    assert env.dtw_data[0]["position"] == [float(x) for x in start_pos]
    assert env.dtw_data[0]["phase"] == "agent"


def test_waypoint_follower_reaches_goal_without_extra_sim_steps():
    """The waypoint strategy (VERDICT r2 item 6) must navigate FakeSim
    scenes with ZERO follower-issued sim.step calls per action (habitat
    ShortestPathFollower semantics: steer along pathfinder waypoints),
    unlike the simulate-and-restore fallback."""
    sim = FakeSim(scene_id="sceneA")
    assert sim.cheap_simulation  # auto mode keeps simulate on FakeSim
    auto = ShortestPathFollower(sim, goal_radius=0.25)
    assert auto.mode == "simulate"

    start = sim.sample_navigable_point()
    sim.set_agent_state(start, [0, 0, 0, 1])
    goal = [start[0] + 3.0, 0.0, start[2]]
    if not sim.is_navigable(goal):
        goal = sim.sample_navigable_point()

    follower = ShortestPathFollower(sim, goal_radius=0.25, mode="waypoint")
    steps = {"n": 0}
    orig_step = sim.step

    def counting_step(action):
        steps["n"] += 1
        return orig_step(action)

    sim.step = counting_step
    actions_taken = 0
    for _ in range(300):
        before = steps["n"]
        a = follower.get_next_action(goal)
        assert steps["n"] == before, "waypoint follower stepped the sim"
        if a == SimActions.STOP:
            break
        sim.step(a)
        actions_taken += 1
    assert sim.geodesic_distance(sim.get_agent_state().position, goal) <= 0.5
    assert steps["n"] == actions_taken  # only env-issued steps happened


def test_waypoint_and_simulate_followers_agree_on_clear_cases():
    """Action parity between the two strategies on CLEAR-CUT states
    (VERDICT r2 item 6 parity check): strongly misaligned -> same turn
    direction; well aligned toward an open goal -> forward; inside the
    goal radius -> STOP. Boundary states (misalignment near the
    turn-angle/2 tolerance) legitimately differ because FakeSim's
    waypoints are half-cell quantized, so they are excluded — habitat's
    own follower is waypoint-based (GreedyGeodesicFollower), which the
    waypoint mode mirrors."""
    import math as _math

    from ivlnce_tpu.envs.sim_api import quat_from_heading

    sim = FakeSim(scene_id="sceneA")
    way = ShortestPathFollower(sim, goal_radius=0.25, mode="waypoint")
    simf = ShortestPathFollower(sim, goal_radius=0.25, mode="simulate")

    origin = np.array([0.0, 0.0, 0.0])
    # (heading_deg, goal): goal straight ahead of heading 0 is -z
    cases = [
        (0, [0.0, 0.0, -2.0]),     # aligned -> forward
        (90, [0.0, 0.0, -2.0]),    # 90 deg left of goal -> turn right
        (-90, [0.0, 0.0, -2.0]),   # 90 deg right of goal -> turn left
        (150, [0.0, 0.0, -2.0]),   # mostly behind, left of goal
        (90, [-2.0, 0.0, 0.0]),    # aligned at +90 -> forward
        (0, [0.0, 0.0, 0.1]),      # within goal radius -> STOP
    ]
    compared = 0
    for heading_deg, goal in cases:
        if not (sim.is_navigable(origin) and sim.is_navigable(goal)):
            continue
        q = quat_from_heading(_math.radians(heading_deg))
        sim.set_agent_state(origin, q)
        a_w = way.get_next_action(goal)
        sim.set_agent_state(origin, q)
        a_s = simf.get_next_action(goal)
        assert a_w == a_s, (heading_deg, goal, a_w, a_s)
        compared += 1
    assert compared >= 5


def test_step_without_obs_matches_step_state():
    """Render-free probe stepping (FakeSim.step_without_obs) must leave
    identical agent state and collision flag to step() — the follower's
    simulate-and-restore probes rely on it."""
    sim_a = FakeSim(scene_id="sceneA")
    sim_b = FakeSim(scene_id="sceneA")
    start = sim_a.sample_navigable_point()
    for sim in (sim_a, sim_b):
        sim.set_agent_state(start, [0, 0, 0, 1])
    rng = np.random.default_rng(3)
    for action in rng.integers(1, 4, size=40):
        obs = sim_a.step(int(action))
        ret = sim_b.step_without_obs(int(action))
        assert obs is not None and ret is None
        sa, sb = sim_a.get_agent_state(), sim_b.get_agent_state()
        np.testing.assert_allclose(sa.position, sb.position)
        np.testing.assert_allclose(sa.rotation, sb.rotation)
        assert sim_a.previous_step_collided == sim_b.previous_step_collided
    # rendering still works after probes
    assert "depth" in sim_b.render_observations()


def test_waypoint_follower_blocked_forward_does_not_livelock():
    """Pure waypoint steering has no collision feedback: a blocked
    MOVE_FORWARD leaves the pose unchanged and the same geometry would
    re-emit MOVE_FORWARD forever. After an ineffective forward the
    follower must fall back to the probe scorer and emit a TURN."""
    import math

    from ivlnce_tpu.envs.shortest_path import ShortestPathFollower
    from ivlnce_tpu.envs.sim_api import AgentState, SimActions

    class WallSim:
        """Agent at origin facing -z; a wall blocks forward motion, but
        turning then moving sideways makes geodesic progress."""

        forward_step = 0.25
        turn_angle = math.radians(15.0)

        def __init__(self):
            self.pos = np.zeros(3)
            self.heading = 0.0  # facing -z
            self.steps = 0
            self.previous_step_collided = False

        def get_agent_state(self):
            q = [0.0, math.sin(self.heading / 2), 0.0,
                 math.cos(self.heading / 2)]
            return AgentState(position=self.pos.copy(), rotation=q)

        def set_agent_state(self, position, rotation, **kw):
            self.pos = np.asarray(position, float).copy()
            x, y, z, w = rotation
            self.heading = 2 * math.atan2(y, w)

        def geodesic_distance(self, a, b):
            return float(np.linalg.norm(np.asarray(a) - np.asarray(b))) + 1.0

        def get_straight_shortest_path_points(self, a, b):
            return [a, b]  # straight through the wall

        def step(self, action):
            self.steps += 1
            self.previous_step_collided = False
            if action == SimActions.MOVE_FORWARD:
                # the wall blocks motion straight ahead (-z) only
                if abs(_wrap(self.heading)) > math.radians(20):
                    d = np.array(
                        [-math.sin(self.heading), 0.0,
                         -math.cos(self.heading)]
                    )
                    self.pos = self.pos + self.forward_step * d
                else:
                    self.previous_step_collided = True
            elif action == SimActions.TURN_LEFT:
                self.heading += self.turn_angle
            elif action == SimActions.TURN_RIGHT:
                self.heading -= self.turn_angle

        step_without_obs = step

    def _wrap(a):
        return ((a + math.pi) % (2 * math.pi)) - math.pi

    sim = WallSim()
    follower = ShortestPathFollower(sim, 0.2, mode="waypoint")
    goal = np.array([0.0, 0.0, -5.0])

    a1 = follower.get_next_action(goal)
    assert a1 == SimActions.MOVE_FORWARD  # aligned: tries to move
    sim.step(a1)  # blocked: pose unchanged, collided flag set
    a2 = follower.get_next_action(goal)
    assert a2 in (SimActions.TURN_LEFT, SimActions.TURN_RIGHT), (
        "follower re-emitted MOVE_FORWARD from a collided unmoved pose"
    )

    # the escape must actually clear the wall: within a handful of
    # decisions the agent rotates out of the blocked cone and MOVES
    # (the naive one-turn fallback cycled FWD/RIGHT/LEFT forever)
    sim.step(a2)
    moved_at = None
    for i in range(12):
        # env.py _step_oracle queries twice per executed action; include
        # the extra non-executed query to prove it cannot mis-trigger
        follower.get_next_action(goal)
        a = follower.get_next_action(goal)
        sim.step(a)
        if np.linalg.norm(sim.pos) > 1e-9:
            moved_at = i
            break
    assert moved_at is not None, "follower never escaped the wall"
    # and it keeps making real progress afterwards (WallSim's wall is
    # infinite and heading-based, so every forward needs a fresh ~7-action
    # escape cycle — far harsher than a real navmesh corner)
    for _ in range(16):
        sim.step(follower.get_next_action(goal))
    assert np.linalg.norm(sim.pos) >= 2 * sim.forward_step - 1e-6
