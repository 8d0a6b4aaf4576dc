"""Trace-replay validation of the habitat adapter (VERDICT r2 item 9).

data/fixtures/habitat_trace.npz is authored at the habitat-sim API level
(scripts/make_habitat_trace_fixture.py): raw RGBA/depth-meters/semantic
frames, agent quaternions with scipy-Rotation orientation goldens (the
reference's exact call, habitat_extensions/sensors.py:239-250), and
navmesh-style follower scenarios. Replaying it here pins quaternion and
sensor-postprocess conventions beyond what the shape-level mock in
test_habitat_backend.py covers — without scipy or habitat installed.
"""

import json
import os
import sys
import types

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "data", "fixtures", "habitat_trace.npz")


@pytest.fixture(scope="module")
def trace():
    assert os.path.exists(FIXTURE), (
        "run scripts/make_habitat_trace_fixture.py"
    )
    return np.load(FIXTURE, allow_pickle=False)


# ---------------------------------------------------------------------------
# orientation conventions vs scipy goldens
# ---------------------------------------------------------------------------
def test_orientation_sensor_matches_scipy_rotvec(trace):
    """The repo's scipy-free rotvec must reproduce scipy
    Rotation.as_rotvec()[:2] — the reference's (elevation, heading)."""
    from ivlnce_tpu.tasks.sensors import WorldRobotOrientationSensor

    for q, golden in zip(trace["quats"], trace["golden_elev_heading"]):
        rv = WorldRobotOrientationSensor.rotvec_from_quat(q)
        np.testing.assert_allclose(rv[:2], golden, atol=1e-9, err_msg=str(q))


def test_heading_from_quat_matches_yaw_rows(trace):
    """For pure-yaw quaternions the follower's heading equals the
    rotation-vector y component (habitat heading convention)."""
    import math

    from ivlnce_tpu.envs.sim_api import heading_from_quat

    for q, golden in zip(trace["quats"], trace["golden_elev_heading"]):
        if abs(q[0]) > 1e-12 or abs(q[2]) > 1e-12:
            continue  # composed rotations: heading is sensor-defined
        h = heading_from_quat(q)
        wrapped = ((h + math.pi) % (2 * math.pi)) - math.pi
        assert abs(wrapped - golden[1]) < 1e-9, (q, h, golden)


# ---------------------------------------------------------------------------
# sensor postprocessing through HabitatSimAdapter
# ---------------------------------------------------------------------------
def _install_trace_habitat_sim(monkeypatch, trace, frame_idx):
    """Minimal habitat_sim mock whose sensors replay fixture frames."""
    ann_rows = json.loads(str(trace["annotations"]))

    class _Cat:
        def __init__(self, mpcat40, raw):
            self._m, self._r = mpcat40, raw

        def name(self, mapping="mpcat40"):
            return self._m if mapping == "mpcat40" else self._r

    class _Obj:
        def __init__(self, oid, mpcat40, raw):
            self.id = oid
            self.category = _Cat(mpcat40, raw)

    sem_scene = types.SimpleNamespace(
        objects=[_Obj(*row) for row in ann_rows]
    )

    class _Quat:
        def __init__(self, x=0.0, y=0.0, z=0.0, w=1.0):
            self.x, self.y, self.z, self.w = x, y, z, w

    class _AgentState:
        def __init__(self):
            self.position = np.zeros(3, np.float32)
            self.rotation = _Quat()
            self.sensor_states = {}

    class _Agent:
        def __init__(self):
            self._s = _AgentState()

        def get_state(self):
            return self._s

        def set_state(self, s, reset_sensors=True):
            self._s = s

    class _Sim:
        def __init__(self, configuration):
            self.pathfinder = types.SimpleNamespace()
            self.semantic_scene = sem_scene
            self._agent = _Agent()

        def get_agent(self, idx):
            return self._agent

        def get_sensor_observations(self):
            return {
                "rgb": trace["rgba_raw"][frame_idx],
                "depth": trace["depth_raw"][frame_idx],
                "semantic": trace["sem_raw"][frame_idx],
            }

        def step(self, action):
            return self.get_sensor_observations()

        def close(self):
            pass

    hsim = types.ModuleType("habitat_sim")
    hsim.SensorType = types.SimpleNamespace(COLOR=0, DEPTH=1, SEMANTIC=2)
    hsim.CameraSensorSpec = type("CameraSensorSpec", (), {})
    hsim.SimulatorConfiguration = type("SimulatorConfiguration", (), {})
    hsim.Configuration = lambda backend, agents: types.SimpleNamespace(
        backend=backend, agents=agents
    )
    hsim.Simulator = _Sim
    agent_mod = types.ModuleType("habitat_sim.agent")
    agent_mod.AgentConfiguration = type("AgentConfiguration", (), {})
    agent_mod.ActionSpec = lambda name, actuation: None
    agent_mod.ActuationSpec = lambda amount: None
    hsim.agent = agent_mod
    monkeypatch.setitem(sys.modules, "habitat_sim", hsim)
    monkeypatch.setitem(sys.modules, "habitat_sim.agent", agent_mod)


@pytest.mark.parametrize("frame_idx", [0, 1])
def test_postprocess_matches_goldens(monkeypatch, trace, frame_idx):
    _install_trace_habitat_sim(monkeypatch, trace, frame_idx)
    from ivlnce_tpu.config.task_default import get_extended_config
    from ivlnce_tpu.envs.habitat_backend import HabitatSimAdapter

    cfg = get_extended_config()
    cfg.defrost()
    cfg.SIMULATOR.AGENT_0.SENSORS = [
        "RGB_SENSOR", "DEPTH_SENSOR", "SEMANTIC_SENSOR"
    ]
    cfg.freeze()
    adapter = HabitatSimAdapter(cfg.SIMULATOR, "trace_scene")
    obs = adapter.reset()

    np.testing.assert_array_equal(obs["rgb"], trace["rgb_expected"][frame_idx])
    np.testing.assert_allclose(
        obs["depth"][..., 0], trace["depth_expected"][frame_idx], atol=1e-6
    )
    np.testing.assert_array_equal(
        obs["semantic12"][..., 0], trace["sem_expected"][frame_idx]
    )
    assert obs["depth"].dtype == np.float32
    assert obs["rgb"].dtype == np.uint8
    assert obs["semantic12"].dtype == np.uint8


# ---------------------------------------------------------------------------
# semantic edge cases through the Semantic12 LUT (VERDICT r4 item 10)
# ---------------------------------------------------------------------------
def test_semantic12_lut_edge_cases(trace):
    """Sparse/high instance ids, use_fine indirection, null categories,
    non-numeric ids, and frame ids beyond the LUT (void, never the last
    entry's label — the reference KeyErrors on unknown ids,
    sensors.py:308-310)."""
    import types

    from ivlnce_tpu.envs.habitat_backend import Semantic12Mapping

    class _Cat:
        def __init__(self, mpcat40, raw):
            self._m, self._r = mpcat40, raw

        def name(self, mapping="mpcat40"):
            return self._m if mapping == "mpcat40" else self._r

    class _Obj:
        def __init__(self, oid, mpcat40, raw):
            self.id = oid
            self.category = (
                None if mpcat40 is None else _Cat(mpcat40, raw)
            )

    rows = json.loads(str(trace["edge_annotations"]))
    scene = types.SimpleNamespace(objects=[_Obj(*r) for r in rows])
    mapping = Semantic12Mapping(scene)
    for raw_frame, expected in zip(
        trace["edge_sem_raw"], trace["edge_sem_expected"]
    ):
        out = mapping(raw_frame)
        np.testing.assert_array_equal(out[..., 0], expected)
        assert out.dtype == np.uint8


# ---------------------------------------------------------------------------
# collision sequence through the collided-flag path (VERDICT r4 item 10)
# ---------------------------------------------------------------------------
def test_collision_sequence_matches_goldens(monkeypatch, trace):
    """Replay an authored step sequence against HabitatSimAdapter.step():
    the raw-obs "collided" flag (habitat-lab's previous_step_collided
    source) must win over the distance heuristic (ALLOW_SLIDING), the
    heuristic must fire only for blocked MOVE_FORWARDs, and STOP must
    clear the record."""
    _install_trace_habitat_sim(monkeypatch, trace, 0)
    import habitat_sim as hsim_mock

    steps = json.loads(str(trace["collision_steps"]))

    class _CollisionSim(hsim_mock.Simulator):
        def __init__(self, configuration):
            super().__init__(configuration)
            self.script = list(steps)
            self.cursor = -1

        def step(self, action):
            self.cursor += 1
            case = self.script[self.cursor]
            s = self._agent.get_state()
            s.position = np.asarray(s.position, np.float64) + np.array(
                [0.0, 0.0, -float(case["moved"])]
            )
            self._agent.set_state(s)
            raw = dict(self.get_sensor_observations())
            if case["collided"] is not None:
                raw["collided"] = case["collided"]
            return raw

    monkeypatch.setattr(hsim_mock, "Simulator", _CollisionSim)
    from ivlnce_tpu.config.task_default import get_extended_config
    from ivlnce_tpu.envs.habitat_backend import HabitatSimAdapter

    cfg = get_extended_config()
    cfg.defrost()
    cfg.SIMULATOR.AGENT_0.SENSORS = ["RGB_SENSOR", "DEPTH_SENSOR"]
    cfg.freeze()
    adapter = HabitatSimAdapter(cfg.SIMULATOR, "trace_scene")
    assert adapter.previous_step_collided is False

    sim = adapter._sim
    for i, case in enumerate(steps):
        if case["action"] == 0:  # STOP never reaches the sim's step()
            sim.cursor += 1
        adapter.step(case["action"])
        assert adapter.previous_step_collided == case["expected"], (
            i, case, adapter.previous_step_collided,
        )


# ---------------------------------------------------------------------------
# follower steering over navmesh-style waypoint traces
# ---------------------------------------------------------------------------
def test_waypoint_follower_matches_trace_actions(trace):
    from ivlnce_tpu.envs.shortest_path import ShortestPathFollower
    from ivlnce_tpu.envs.sim_api import AgentState

    cases = json.loads(str(trace["follower_cases"]))

    class _TraceSim:
        forward_step = 0.25
        turn_angle_deg = 15.0

        def __init__(self, case):
            self._case = case

        def get_agent_state(self):
            return AgentState(
                position=np.asarray(self._case["pos"], float),
                rotation=np.asarray(self._case["quat"], float),
            )

        def geodesic_distance(self, a, b, episode=None):
            pts = np.asarray(self._case["waypoints"], float)
            return float(
                np.sum(np.linalg.norm(np.diff(pts, axis=0), axis=1))
            )

        def get_straight_shortest_path_points(self, a, b):
            return [list(p) for p in self._case["waypoints"]]

    for i, case in enumerate(cases):
        sim = _TraceSim(case)
        follower = ShortestPathFollower(sim, goal_radius=0.25, mode="auto")
        assert follower.mode == "waypoint"  # rendering backends: no steps
        action = follower.get_next_action(case["goal"])
        assert action == case["expected"], (i, case, action)


# ---------------------------------------------------------------------------
# multi-episode tour through the adapter (VERDICT r4 item 8)
# ---------------------------------------------------------------------------
def test_multi_episode_tour_through_adapter(monkeypatch, trace):
    """Drive HabitatSimAdapter exactly the way the iterative env's tour
    loop does — episodes grouped scene-major, teleport between episode
    starts, STOP at episode ends, scene switch mid-tour — and pin the
    cross-episode contracts:

    - reconfigure() to the SAME scene is a no-op (tours group by scene;
      rebuilding the sim per episode would forfeit that design);
    - set/get_agent_state round-trips (x, y, z, w) quaternion coeffs
      through habitat_sim.utils.common.quat_from_coeffs (the adapter's
      preferred path, habitat_backend.py:311-331);
    - a collision inside episode k never leaks into episode k+1 (STOP
      clears previous_step_collided, habitat-lab reset semantics);
    - switching scenes rebuilds the sim AND the Semantic12 LUT from the
      new scene's annotations (reference re-derives the whitelist per
      scene, habitat_extensions/sensors.py:283-310).
    """
    _install_trace_habitat_sim(monkeypatch, trace, 0)
    import habitat_sim as hsim_mock

    ann_rows = json.loads(str(trace["annotations"]))

    class _Cat:
        def __init__(self, mpcat40, raw):
            self._m, self._r = mpcat40, raw

        def name(self, mapping="mpcat40"):
            return self._m if mapping == "mpcat40" else self._r

    class _Obj:
        def __init__(self, oid, mpcat40, raw):
            self.id = oid
            self.category = _Cat(mpcat40, raw)

    # scene B relabels every instance as void -> semantic12 must go to 0
    scene_annotations = {
        "scene_A": types.SimpleNamespace(
            objects=[_Obj(*row) for row in ann_rows]
        ),
        "scene_B": types.SimpleNamespace(
            objects=[_Obj(row[0], "void", "void") for row in ann_rows]
        ),
    }
    built = []

    class _TourSim(hsim_mock.Simulator):
        def __init__(self, configuration):
            super().__init__(configuration)
            scene = configuration.backend.scene_id
            built.append(scene)
            self.semantic_scene = scene_annotations[scene]
            self.collide_next = False

        def step(self, action):
            raw = dict(self.get_sensor_observations())
            raw["collided"] = self.collide_next
            self.collide_next = False
            return raw

    monkeypatch.setattr(hsim_mock, "Simulator", _TourSim)

    # quat_from_coeffs: the adapter's preferred rotation path
    class _Quat:
        def __init__(self, x, y, z, w):
            self.x, self.y, self.z, self.w = x, y, z, w

    common = types.ModuleType("habitat_sim.utils.common")
    common.quat_from_coeffs = lambda c: _Quat(*np.asarray(c, np.float64))
    utils_mod = types.ModuleType("habitat_sim.utils")
    utils_mod.common = common
    hsim_mock.utils = utils_mod
    monkeypatch.setitem(sys.modules, "habitat_sim.utils", utils_mod)
    monkeypatch.setitem(sys.modules, "habitat_sim.utils.common", common)

    from ivlnce_tpu.config.task_default import get_extended_config
    from ivlnce_tpu.envs.habitat_backend import HabitatSimAdapter

    cfg = get_extended_config()
    cfg.defrost()
    cfg.SIMULATOR.AGENT_0.SENSORS = [
        "RGB_SENSOR", "DEPTH_SENSOR", "SEMANTIC_SENSOR"
    ]
    cfg.freeze()
    adapter = HabitatSimAdapter(cfg.SIMULATOR, "scene_A")
    assert built == ["scene_A"]

    # a scene-major tour: two episodes in scene_A, one in scene_B
    tour = [
        ("scene_A", [1.0, 0.2, -3.0], [0.0, 0.382683, 0.0, 0.923880]),
        ("scene_A", [4.5, 0.2, 2.25], [0.0, -0.707107, 0.0, 0.707107]),
        ("scene_B", [-2.0, 0.6, 7.5], [0.0, 1.0, 0.0, 0.0]),
    ]
    lut_after_ep1 = None
    for k, (scene, start, quat) in enumerate(tour):
        adapter.reconfigure(scene)
        adapter.set_agent_state(start, quat)

        got = adapter.get_agent_state()
        np.testing.assert_allclose(got.position, start, atol=1e-6)
        np.testing.assert_allclose(got.rotation, quat, atol=1e-9)
        assert adapter.previous_step_collided is False, k

        obs = adapter.render_observations()  # episode-start render
        if scene == "scene_A":
            np.testing.assert_array_equal(
                obs["semantic12"][..., 0], trace["sem_expected"][0]
            )
        else:
            assert int(obs["semantic12"].max()) == 0  # all void

        adapter._sim.collide_next = True
        adapter.step(2)  # MOVE_FORWARD into a wall
        assert adapter.previous_step_collided is True
        adapter.step(0)  # STOP: episode boundary clears the record
        assert adapter.previous_step_collided is False

        if k == 0:
            lut_after_ep1 = adapter._semantic12
        if k == 1:  # same scene: sim NOT rebuilt, LUT reused
            assert built == ["scene_A"]
            assert adapter._semantic12 is lut_after_ep1
    # the scene switch rebuilt the sim exactly once (mock lacks
    # sim.reconfigure -> the adapter's full-rebuild fallback)
    assert built == ["scene_A", "scene_B"]
