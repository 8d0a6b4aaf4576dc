"""Visualization layer tests: maps drawing, frame composition, video
files, topdown measure (host-side, no TPU)."""

import json
import os

import numpy as np
import pytest

from ivlnce_tpu.tasks import maps as maps_util
from ivlnce_tpu.utils import viz


def test_colorize_topdown_map_shades_fog():
    m = np.zeros((8, 8), np.uint8)
    m[2:6, 2:6] = maps_util.MAP_VALID_POINT
    fog = np.zeros((8, 8), np.uint8)
    fog[2:4, 2:4] = 1
    rgb = maps_util.colorize_topdown_map(m, fog)
    assert rgb.shape == (8, 8, 3)
    # revealed valid cells keep full brightness; unrevealed are darker
    assert (rgb[2, 2] > rgb[5, 5]).all()
    # invalid cells stay white regardless of fog
    assert (rgb[0, 0] == 255).all()


def test_static_to_grid_corners():
    bounds = {
        "lower": np.array([-8.0, 0.0, -8.0]),
        "upper": np.array([8.0, 0.0, 8.0]),
    }
    r, c = maps_util.static_to_grid(-8.0, -8.0, (128, 128), bounds)
    assert (r, c) == (0, 0)
    r, c = maps_util.static_to_grid(7.99, 7.99, (128, 128), bounds)
    assert (r, c) == (127, 127)


def test_drawline_and_sprites_modify_image():
    img = np.zeros((64, 64), np.uint8)
    maps_util.drawline(img, (5, 5), (60, 60), 9, style="dotted")
    assert (img == 9).sum() > 0
    img2 = np.zeros((64, 64), np.uint8)
    maps_util.drawpoint(img2, (32, 32), 7)
    assert (img2 == 7).sum() > 0
    img3 = np.zeros((64, 64, 3), np.uint8)
    maps_util.draw_triangle(img3, (32, 32), 0.5, (1, 2, 3))
    assert img3.any()


def test_observations_to_image_composes_rgb_depth_map():
    obs = {
        "rgb": np.zeros((32, 32, 3), np.uint8),
        "depth": np.random.default_rng(0).random((32, 32, 1), np.float32),
    }
    info = {
        "top_down_map_vlnce": {
            "map": np.ones((40, 40), np.uint8),
            "fog_of_war_mask": np.ones((40, 40), np.uint8),
            "agent_map_coord": (20, 20),
            "agent_angle": 0.3,
        }
    }
    frame = viz.observations_to_image(obs, info)
    assert frame.ndim == 3 and frame.shape[2] == 3
    assert frame.shape[1] > 64  # rgb + depth + map side by side


def test_append_text_and_stacking():
    img = np.zeros((20, 50, 3), np.uint8)
    out = viz.append_text_to_image(img, "go to the red chair beyond the door")
    assert out.shape[0] > img.shape[0]
    h = viz.append_image_horizontally(
        [np.zeros((10, 5, 3), np.uint8), np.zeros((20, 7, 3), np.uint8)]
    )
    assert h.shape == (20, 12, 3)
    v = viz.append_image_vertically(
        [np.zeros((10, 5, 3), np.uint8), np.zeros((20, 7, 3), np.uint8)]
    )
    assert v.shape == (30, 7, 3)


def test_ego_map_rendering():
    occ = np.zeros((64, 64), np.uint8)
    occ[10:20, 10:20] = 1
    img = viz.visualize_ego_occupancy_map(occ)
    assert img.shape == (256, 256, 3)
    sem = np.random.default_rng(0).integers(0, 14, (64, 64)).astype(np.uint8)
    img2 = viz.visualize_ego_semantic_map(sem)
    assert img2.shape == (256, 256, 3)


def test_generate_video_writes_file(tmp_path):
    frames = [
        np.random.default_rng(i).integers(0, 255, (32, 32, 3)).astype(
            np.uint8
        )
        for i in range(5)
    ]

    class _TB:
        def add_video_from_np_images(self, *a, **k):
            pass

    viz.generate_video(
        ["disk"], str(tmp_path), frames, "ep1", 0, {"spl": 0.5}, _TB()
    )
    files = os.listdir(tmp_path)
    assert len(files) == 1 and files[0].startswith("episode=ep1")


def test_topdown_measure_with_fake_sim():
    from ivlnce_tpu.envs.fake_sim import FakeSim
    from ivlnce_tpu.tasks.measures import TopDownMapVLNCE, Measurements

    sim = FakeSim(scene_id="viz_test_scene")
    sim.reset()

    class _Goal:
        position = [2.0, 0.0, 2.0]

    class _Ep:
        start_position = [0.0, 0.0, 0.0]
        goals = [_Goal()]
        reference_path = [[0.0, 0.0, 0.0], [1.0, 0.0, 1.0], [2.0, 0.0, 2.0]]

    m = TopDownMapVLNCE(sim=sim, config=None)
    ms = Measurements([m])
    m.reset_metric(_Ep(), ms)
    sim.step(1)
    m.update_metric(_Ep(), ms)
    metric = m.get_metric()
    assert metric is not None
    assert metric["map"].shape == metric["fog_of_war_mask"].shape
    assert metric["fog_of_war_mask"].sum() > 0
    assert isinstance(metric["agent_map_coord"], tuple)
