"""Dataset-driven world-grid auto-sizing (VERDICT r3 next #9).

Covers mapping/scene_bounds.py (per-scene centers + grid side from the
split's episode geometry), the TPU.world_grid_cells = 0 wiring in
Mapper.from_config, and the mapper_step scene_center semantics: a
scene-centered grid must produce the same egocentric maps as the
robot-centered grid whenever both cover the geometry, and must KEEP
points a small robot-centered grid drops when the episode starts at the
scene's edge.
"""

import jax.numpy as jnp
import numpy as np

from ivlnce_tpu.config import get_config
from ivlnce_tpu.mapping import camera as cam
from ivlnce_tpu.mapping import mapper as M
from ivlnce_tpu.mapping.scene_bounds import (
    auto_grid_cells,
    scene_geometry_from_dataset,
)

DEPTH_HW = 16


def test_auto_grid_cells_rounding():
    # fake 16 m scenes + 5 m margin @ 0.05 m half-res -> 420 -> 512
    assert auto_grid_cells(16.0, 5.0, 0.05, 192) == 512
    # floor: never smaller than the rasterize window or 256
    assert auto_grid_cells(0.5, 0.5, 0.05, 192) == 256
    assert auto_grid_cells(0.5, 0.5, 0.05, 300) == 512
    # big scene rounds up to the next power of two
    assert auto_grid_cells(46.0, 5.0, 0.05, 192) == 1024


def test_scene_geometry_from_fake_dataset():
    config = get_config("configs/fake/map_cma_eval_iterative.yaml")
    centers, span = scene_geometry_from_dataset(config.TASK_CONFIG.DATASET)
    assert len(centers) >= 1
    # fake scenes are 16 m wide, episodes sampled within +-(8 - 1) m
    assert 0.0 < span <= 16.0
    for x, z in centers.values():
        assert abs(x) < 8.0 and abs(z) < 8.0


def test_from_config_auto_sizes_grid():
    from ivlnce_tpu.mapping.obs_transforms import GTSemanticsIterativeMapper

    config = get_config("configs/fake/map_cma_eval_iterative.yaml")
    config.defrost()
    config.TPU.world_grid_cells = 0
    config.freeze()
    mapper = GTSemanticsIterativeMapper.from_config(config)
    assert mapper.params.grid_cells == 512
    assert mapper.scene_centers
    assert "scene_center" in mapper.device_obs_keys


def _params(grid_cells):
    return M.MapperParams(
        camera=cam.CameraParameters(
            vertical_fov_radians=cam.vertical_fov_radians(
                90.0, DEPTH_HW, DEPTH_HW
            ),
            features_spatial_dimensions=(DEPTH_HW, DEPTH_HW),
            height_clip=0.1,
        ),
        map_height_meters=6.4,
        map_width_meters=6.4,
        resolution_meters=0.1,
        grid_cells=grid_cells,
        list_capacity=2048,
    )


def _step(params, state, pose, center=None, depth_max=0.6):
    rng = np.random.default_rng(7)
    depth = jnp.asarray(
        rng.uniform(0.05, depth_max, (1, DEPTH_HW, DEPTH_HW)).astype(
            np.float32
        )
    )
    sem = jnp.asarray(
        rng.integers(1, 12, (1, DEPTH_HW, DEPTH_HW)).astype(np.uint8)
    )
    return M.mapper_step(
        params,
        state,
        depth,
        sem,
        jnp.asarray(pose, jnp.float32),
        jnp.zeros((1,), jnp.float32),
        jnp.zeros((1,), jnp.float32),
        jnp.ones((1,), jnp.float32),
        scene_center=(
            None if center is None else jnp.asarray(center, jnp.float32)
        ),
    )


def test_scene_centered_grid_matches_robot_centered():
    """Egocentric maps are origin-invariant when both grids cover the
    frame; scene-centering must not change map content."""
    params = _params(512)
    pose = [[6.0, 1.2, 6.0]]  # robot near the scene corner
    s_robot, occ_r, sem_r = _step(
        params, M.init_state(1, 512, 2048), pose
    )
    s_scene, occ_s, sem_s = _step(
        params, M.init_state(1, 512, 2048), pose, center=[[0.0, 0.0]]
    )
    np.testing.assert_array_equal(np.asarray(occ_r), np.asarray(occ_s))
    np.testing.assert_array_equal(np.asarray(sem_r), np.asarray(sem_s))
    assert int(np.asarray(s_robot.dropped).sum()) == 0
    assert int(np.asarray(s_scene.dropped).sum()) == 0


def test_scene_center_keeps_edge_episode_points():
    """The grid origin is fixed at the episode START. When the episode
    starts at a scene corner and the agent walks to the opposite corner,
    a start-centered scene-SIZED grid loses the far half of the scene;
    the scene-centered grid covers the whole walk. (This asymmetry is
    why from_config centers on the scene — BASELINE.md round 4.)"""
    params = _params(256)  # 12.8 m grid around a ~12 m scene
    start = [[5.2, 1.2, 5.2]]  # +x/+z corner
    far = [[-5.2, 1.2, -5.2]]  # opposite corner (10 m+ from start)

    s_robot, _, _ = _step(
        params, M.init_state(1, 256, 2048), start, depth_max=0.08
    )
    s_robot, _, _ = _step(params, s_robot, far, depth_max=0.08)

    s_scene, _, _ = _step(
        params,
        M.init_state(1, 256, 2048),
        start,
        center=[[0.0, 0.0]],
        depth_max=0.08,
    )
    s_scene, _, _ = _step(
        params, s_scene, far, center=[[0.0, 0.0]], depth_max=0.08
    )

    assert int(np.asarray(s_scene.dropped).sum()) == 0
    assert int(np.asarray(s_robot.dropped).sum()) > 0
