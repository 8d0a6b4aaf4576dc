"""TopDownMapVLNCE drawing parity (reference measures.py:233-478):
FOV-shaped fog, gradient trail, shortest-path overlay, MP3D node path."""

import math
import os
import pickle

import numpy as np
import pytest

from ivlnce_tpu.config.task_default import get_extended_config
from ivlnce_tpu.envs.fake_sim import FakeSim
from ivlnce_tpu.tasks import maps as maps_util
from ivlnce_tpu.tasks.measures import Measurements, TopDownMapVLNCE


class _Goal:
    position = [3.0, 0.0, 3.0]


class _Ep:
    scene_id = "topdown_scene"
    start_position = [0.0, 0.0, 0.0]
    goals = [_Goal()]
    reference_path = [[0.0, 0.0, 0.0], [1.5, 0.0, 1.5], [3.0, 0.0, 3.0]]


def _cfg(**overrides):
    cfg = get_extended_config()
    cfg.defrost()
    for k, v in overrides.items():
        setattr(cfg.TASK.TOP_DOWN_MAP_VLNCE, k, v)
    cfg.freeze()
    return cfg.TASK.TOP_DOWN_MAP_VLNCE


def _run(sim, config, steps=6):
    m = TopDownMapVLNCE(sim=sim, config=config)
    ms = Measurements([m])
    m.reset_metric(_Ep(), ms)
    for _ in range(steps):
        sim.step(1)  # MOVE_FORWARD
        m.update_metric(_Ep(), ms)
    return m.get_metric()


def test_fog_is_fov_shaped_not_disk():
    sim = FakeSim(scene_id="topdown_scene")
    sim.set_agent_state([0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0])  # heading 0
    sim.reset()
    m = TopDownMapVLNCE(sim=sim, config=_cfg())
    ms = Measurements([m])
    m.reset_metric(_Ep(), ms)
    metric = m.get_metric()
    fog = metric["fog_of_war_mask"]
    r, c = metric["agent_map_coord"]
    assert fog.sum() > 0
    # heading 0 faces -z (decreasing row); with a 90-degree FOV nothing
    # far BEHIND the agent (increasing row) may be revealed
    behind = fog[r + 10 :, :]
    ahead = fog[: max(r - 1, 0), :]
    assert ahead.sum() > 0
    assert behind.sum() == 0


def test_trail_gradient_and_shortest_path():
    sim = FakeSim(scene_id="topdown_scene")
    sim.set_agent_state([0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0])
    sim.reset()
    metric = _run(sim, _cfg(), steps=8)
    tdm = metric["map"]
    # shortest-path overlay drawn (FakeSim provides waypoints)
    assert (tdm == maps_util.MAP_SHORTEST_PATH_WAYPOINT).sum() > 0
    # gradient trail colors in [15, 260) excluding the named indices
    named = {
        maps_util.MAP_SHORTEST_PATH_WAYPOINT,
        maps_util.MAP_REFERENCE_POINT,
        maps_util.MAP_AGENT_SPRITE,
    }
    trail = (tdm >= 15) & ~np.isin(tdm, list(named))
    assert trail.sum() > 0
    assert metric["meters_per_px"] > 0
    assert "lower" in metric["bounds"]


def test_mp3d_nodes_and_agent_path(tmp_path):
    import networkx as nx

    g = nx.Graph()
    # nodes along the agent's forward line (heading 0 walks -z)
    for i, z in enumerate([0.0, -1.0, -2.0, -3.0]):
        g.add_node(f"n{i}", position=np.array([0.0, 0.0, z], np.float32))
    for i in range(3):
        g.add_edge(f"n{i}", f"n{i+1}")
    graphs_file = os.path.join(tmp_path, "graphs.pkl")
    with open(graphs_file, "wb") as f:
        pickle.dump({"topdown_scene": g}, f)

    sim = FakeSim(scene_id="topdown_scene")
    sim.set_agent_state([0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0])
    sim.reset()
    config = _cfg(GRAPHS_FILE=graphs_file)
    m = TopDownMapVLNCE(sim=sim, config=config)
    ms = Measurements([m])
    m.reset_metric(_Ep(), ms)
    assert m._nearest_node == "n0"
    assert (m._map == maps_util.MAP_MP3D_WAYPOINT).sum() > 0
    for _ in range(10):
        sim.step(1)
        m.update_metric(_Ep(), ms)
    # agent walked ~2.5 m along -z: the tracked node must have advanced
    assert m._nearest_node in ("n2", "n3")


def test_polar_angle_matches_heading_plus_pi():
    sim = FakeSim(scene_id="topdown_scene")
    for heading in (0.0, 1.0, -2.0):
        q = [0.0, math.sin(heading / 2), 0.0, math.cos(heading / 2)]
        sim.set_agent_state([0.0, 0.0, 0.0], q)
        m = TopDownMapVLNCE(sim=sim, config=None)
        diff = (m.get_polar_angle() - (heading + math.pi)) % (2 * math.pi)
        assert min(diff, 2 * math.pi - diff) < 1e-6
