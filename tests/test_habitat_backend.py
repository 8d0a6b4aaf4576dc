"""HabitatSimAdapter + Semantic12 mapping tests against a mock habitat_sim.

habitat-sim is not installed in this image (SURVEY.md: external C++
boundary), so these tests exercise the adapter's protocol surface with a
minimal mock that mimics habitat-sim's API shapes: Simulator /
AgentConfiguration / pathfinder / semantic_scene. The Semantic12 mapping
itself is pure (reference habitat_extensions/sensors.py:253-329) and is
tested directly.
"""

import sys
import types

import numpy as np
import pytest

from ivlnce_tpu.envs.habitat_backend import Semantic12Mapping
from ivlnce_tpu.envs.sim_api import SimActions


# ---------------------------------------------------------------------------
# Semantic12Mapping (pure)
# ---------------------------------------------------------------------------
class _Cat:
    def __init__(self, mpcat40, raw=None):
        self._m = mpcat40
        self._r = raw or mpcat40

    def name(self, mapping="mpcat40"):
        return self._m if mapping == "mpcat40" else self._r


class _Obj:
    def __init__(self, oid, mpcat40, raw=None):
        self.id = oid
        self.category = _Cat(mpcat40, raw)


class _Annotations:
    def __init__(self, objects):
        self.objects = objects


def test_semantic12_whitelist_mapping():
    ann = _Annotations(
        [
            _Obj("0_0_0", "wall"),           # not whitelisted -> 0
            _Obj("0_0_1", "bed"),            # -> index 2+1 = 3
            _Obj("0_0_2", "chair"),          # -> 8
            _Obj("0_0_3", "furniture", "table"),  # use_fine -> raw 'table' -> 7
            _Obj("0_0_4", "appliances", "oven"),  # fine 'oven' not listed -> 0
            None,                             # reference tolerates Nones
        ]
    )
    m = Semantic12Mapping(ann)
    buf = np.array([[0, 1], [2, 3], [4, 999]], np.int32)
    out = m(buf)
    assert out.shape == (3, 2, 1)
    assert out.dtype == np.uint8
    expected = np.array([[0, 3], [8, 7], [0, 0]], np.uint8)
    np.testing.assert_array_equal(out[..., 0], expected)


def test_semantic12_matches_reference_loop():
    """LUT gather == the reference's per-unique-id loop on random frames."""
    rng = np.random.default_rng(3)
    names = ["bed", "wall", "sofa", "plant", "floor", "sink", "counter"]
    objs = [
        _Obj(f"0_0_{i}", names[rng.integers(len(names))])
        for i in range(40)
    ]
    ann = _Annotations(objs)
    m = Semantic12Mapping(ann)
    buf = rng.integers(0, 40, size=(16, 16)).astype(np.int64)

    # reference implementation (sensors.py:308-318)
    all_objects = {int(o.id.split("_")[-1]): o for o in objs}
    ref = np.zeros_like(buf, dtype=np.uint8)
    for oid in np.unique(buf):
        obj = all_objects[oid]
        name = obj.category.name(mapping="mpcat40")
        if name in Semantic12Mapping.use_fine:
            name = obj.category.name(mapping="raw")
        if name in Semantic12Mapping.object_whitelist:
            ref[buf == oid] = (
                Semantic12Mapping.object_whitelist.index(name) + 1
            )

    np.testing.assert_array_equal(m(buf)[..., 0], ref)


def test_semantic12_3d_input_and_large_ids():
    ann = _Annotations([_Obj("0_0_5000", "bed")])  # grows LUT beyond default
    m = Semantic12Mapping(ann)
    buf = np.full((4, 4, 1), 5000, np.int32)
    np.testing.assert_array_equal(m(buf)[..., 0], np.full((4, 4), 3))


# ---------------------------------------------------------------------------
# HabitatSimAdapter over a mock habitat_sim module
# ---------------------------------------------------------------------------
class _MockQuat:
    def __init__(self, x=0.0, y=0.0, z=0.0, w=1.0):
        self.x, self.y, self.z, self.w = x, y, z, w


class _MockAgentState:
    def __init__(self):
        self.position = np.zeros(3, np.float32)
        self.rotation = _MockQuat()
        self.sensor_states = {}


class _MockAgent:
    def __init__(self):
        self._state = _MockAgentState()

    def get_state(self):
        return self._state

    def set_state(self, state, reset_sensors=True):
        self._state = state


class _MockPathfinder:
    def find_path(self, path):
        start = np.asarray(path.requested_start, float)
        if getattr(path, "requested_ends", None) is not None:
            ends = np.asarray(path.requested_ends, float)
            d = float(np.min(np.linalg.norm(ends - start, axis=-1)))
        else:  # habitat_sim.ShortestPath single-goal + waypoints
            end = np.asarray(path.requested_end, float)
            d = float(np.linalg.norm(end - start))
            path.points = [start, end]  # open navmesh: straight segment
        path.geodesic_distance = d
        return True

    def is_navigable(self, p):
        return abs(float(np.asarray(p)[0])) < 100.0

    def get_random_navigable_point(self):
        return np.array([1.0, 0.0, 2.0], np.float32)

    def get_bounds(self):
        return (
            np.array([-10.0, 0.0, -10.0]),
            np.array([10.0, 3.0, 10.0]),
        )


class _MockSim:
    created = []

    def __init__(self, configuration):
        self.config = configuration
        self.pathfinder = _MockPathfinder()
        self.semantic_scene = _Annotations([_Obj("0_0_1", "bed")])
        self._agents = [_MockAgent()]
        self.closed = False
        _MockSim.created.append(self)

    def get_agent(self, idx):
        return self._agents[idx]

    def get_sensor_observations(self):
        h, w = 8, 8
        return {
            "rgb": np.zeros((h, w, 4), np.uint8),
            "depth": np.full((h, w), 5.0, np.float32),
            "semantic": np.ones((h, w), np.int32),
        }

    def step(self, action):
        # habitat-sim motion semantics: forward = R(q) @ (0, 0, -1)
        # = (-sin h, 0, -cos h) for yaw h about +y; TURN_LEFT increases h
        import math

        ag = self._agents[0]._state
        q = ag.rotation
        h = 2.0 * math.atan2(q.y, q.w)
        if action == SimActions.MOVE_FORWARD:
            d = np.array(
                [-math.sin(h), 0.0, -math.cos(h)], np.float32
            )
            ag.position = ag.position + np.float32(0.25) * d
        elif action == SimActions.TURN_LEFT:
            h += math.radians(15.0)
            ag.rotation = _MockQuat(0.0, math.sin(h / 2), 0.0, math.cos(h / 2))
        elif action == SimActions.TURN_RIGHT:
            h -= math.radians(15.0)
            ag.rotation = _MockQuat(0.0, math.sin(h / 2), 0.0, math.cos(h / 2))
        return self.get_sensor_observations()

    def reconfigure(self, configuration):
        self.config = configuration

    def close(self):
        self.closed = True


def _install_mock_habitat_sim(monkeypatch):
    hsim = types.ModuleType("habitat_sim")

    class SensorType:
        COLOR, DEPTH, SEMANTIC = 0, 1, 2

    class CameraSensorSpec:
        pass

    class SimulatorConfiguration:
        pass

    class Configuration:
        def __init__(self, backend, agents):
            self.backend = backend
            self.agents = agents

    class MultiGoalShortestPath:
        def __init__(self):
            self.requested_start = None
            self.requested_ends = None
            self.geodesic_distance = float("inf")

    class ShortestPath:
        def __init__(self):
            self.requested_start = None
            self.requested_end = None
            self.geodesic_distance = float("inf")
            self.points = []

    agent_mod = types.ModuleType("habitat_sim.agent")

    class AgentConfiguration:
        pass

    class ActionSpec:
        def __init__(self, name, actuation):
            self.name, self.actuation = name, actuation

    class ActuationSpec:
        def __init__(self, amount):
            self.amount = amount

    agent_mod.AgentConfiguration = AgentConfiguration
    agent_mod.ActionSpec = ActionSpec
    agent_mod.ActuationSpec = ActuationSpec

    utils_common = types.ModuleType("habitat_sim.utils.common")

    def quat_from_coeffs(r):
        return _MockQuat(r[0], r[1], r[2], r[3])

    utils_common.quat_from_coeffs = quat_from_coeffs
    utils_mod = types.ModuleType("habitat_sim.utils")
    utils_mod.common = utils_common

    hsim.SensorType = SensorType
    hsim.CameraSensorSpec = CameraSensorSpec
    hsim.SimulatorConfiguration = SimulatorConfiguration
    hsim.Configuration = Configuration
    hsim.MultiGoalShortestPath = MultiGoalShortestPath
    hsim.ShortestPath = ShortestPath
    hsim.Simulator = _MockSim
    hsim.agent = agent_mod
    hsim.utils = utils_mod

    monkeypatch.setitem(sys.modules, "habitat_sim", hsim)
    monkeypatch.setitem(sys.modules, "habitat_sim.agent", agent_mod)
    monkeypatch.setitem(sys.modules, "habitat_sim.utils", utils_mod)
    monkeypatch.setitem(
        sys.modules, "habitat_sim.utils.common", utils_common
    )
    return hsim


@pytest.fixture
def adapter(monkeypatch):
    _install_mock_habitat_sim(monkeypatch)
    from ivlnce_tpu.config.task_default import get_extended_config

    cfg = get_extended_config()
    cfg.defrost()
    cfg.SIMULATOR.AGENT_0.SENSORS = [
        "RGB_SENSOR", "DEPTH_SENSOR", "SEMANTIC_SENSOR"
    ]
    cfg.freeze()
    from ivlnce_tpu.envs.habitat_backend import HabitatSimAdapter

    return HabitatSimAdapter(cfg.SIMULATOR, "scene_a")


def test_adapter_observations(adapter):
    obs = adapter.reset()
    assert obs["rgb"].shape == (8, 8, 3)  # alpha stripped
    assert obs["depth"].shape == (8, 8, 1)
    assert obs["depth"].dtype == np.float32
    # depth 5m normalized by [0, 10] -> 0.5
    assert np.allclose(obs["depth"], 0.5)
    # instance id 1 is 'bed' -> class 3
    assert obs["semantic12"].shape == (8, 8, 1)
    assert (obs["semantic12"] == 3).all()


def test_adapter_step_and_state(adapter):
    adapter.set_agent_state([1.0, 0.0, 2.0], [0, 0, 0, 1])
    st = adapter.get_agent_state()
    np.testing.assert_allclose(st.position, [1.0, 0.0, 2.0])
    adapter.step(SimActions.MOVE_FORWARD)
    st2 = adapter.get_agent_state()
    assert not np.allclose(st2.position, st.position)
    assert not adapter.previous_step_collided  # moved a full step


def test_adapter_navmesh_queries(adapter):
    d = adapter.geodesic_distance([0, 0, 0], [3.0, 0.0, 4.0])
    assert abs(d - 5.0) < 1e-6
    d2 = adapter.geodesic_distance([0, 0, 0], [[3.0, 0.0, 4.0], [0, 0, 1.0]])
    assert abs(d2 - 1.0) < 1e-6
    assert adapter.is_navigable([0, 0, 0])
    p = adapter.sample_navigable_point()
    assert len(p) == 3
    lower, upper = adapter.get_bounds()
    assert lower[0] == -10.0 and upper[2] == 10.0


def test_adapter_reconfigure_same_scene_noop(adapter):
    sim_before = adapter._sim
    adapter.reconfigure("scene_a")
    assert adapter._sim is sim_before


def test_make_sim_falls_back_without_habitat():
    """env.make_sim uses FakeSim when habitat_sim is absent (ImportError
    path, env.py:make_sim)."""
    from ivlnce_tpu.config.task_default import get_extended_config
    from ivlnce_tpu.envs.env import make_sim
    from ivlnce_tpu.envs.fake_sim import FakeSim

    sim = make_sim(get_extended_config())
    assert isinstance(sim, FakeSim)


def test_waypoint_follower_navigates_through_adapter(adapter):
    """Closed-loop oracle navigation across the L0 boundary: the WAYPOINT
    ShortestPathFollower (the mode real habitat runs, VERDICT r2 item 6)
    must steer HabitatSimAdapter to a goal using only pathfinder
    waypoints + the adapter's quaternion/heading conventions — a sign
    error in any of heading_from_quat, the turn direction, or the
    forward axis makes this walk diverge instead of converge."""
    from ivlnce_tpu.envs.shortest_path import ShortestPathFollower

    adapter.set_agent_state([0.0, 0.0, 0.0], [0, 0, 0, 1])
    follower = ShortestPathFollower(adapter, goal_radius=0.25)
    assert follower.mode == "waypoint"  # adapter advertises waypoints

    goal = [1.5, 0.0, 2.5]
    action = None
    steps = 0
    for _ in range(120):
        action = follower.get_next_action(goal)
        if action == SimActions.STOP:
            break
        adapter.step(action)
        steps += 1
    assert action == SimActions.STOP, "follower never declared arrival"
    final = adapter.get_agent_state().position
    assert adapter.geodesic_distance(final, goal) <= 0.25 + 1e-6
    # sanity: it took a plausible number of actions (not a teleport, not
    # a near-timeout wander) for a ~2.9 m straight walk + initial turns
    assert 10 <= steps <= 60, steps
