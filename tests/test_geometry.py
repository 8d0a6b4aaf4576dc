"""Golden tests for the geometry core against independent NumPy / torch
re-derivations of the reference formulas (reference:
ivlnce_baselines/common/mapping_module/projector/core.py, mapper.py)."""

import math

import numpy as np
import pytest
import torch

from ivlnce_tpu.ops import geometry as G


def torch_transform3d(pose, elevation, heading):
    """Independent torch port of reference core.py:6-37 for cross-checking."""
    theta_x = elevation
    cx, sx = torch.cos(theta_x), torch.sin(theta_x)
    theta_y = heading
    cy, sy = torch.cos(theta_y), torch.sin(theta_y)
    T = torch.zeros(pose.shape[0], 4, 4)
    T[:, 0, 0] = cy
    T[:, 0, 1] = sx * sy
    T[:, 0, 2] = cx * sy
    T[:, 0, 3] = pose[:, 0]
    T[:, 1, 1] = cx
    T[:, 1, 2] = -sx
    T[:, 1, 3] = pose[:, 1]
    T[:, 2, 0] = -sy
    T[:, 2, 1] = cy * sx
    T[:, 2, 2] = cy * cx
    T[:, 2, 3] = pose[:, 2]
    T[:, 3, 3] = 1
    return T


def test_transform3d_matches_reference_layout(rng):
    pose = rng.normal(size=(5, 3)).astype(np.float32)
    elev = rng.normal(size=(5,)).astype(np.float32)
    head = rng.normal(size=(5,)).astype(np.float32)
    ours = np.asarray(G.transform3d(pose, elev, head))
    ref = torch_transform3d(
        torch.from_numpy(pose), torch.from_numpy(elev), torch.from_numpy(head)
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_transform3d_identity():
    T = np.asarray(
        G.transform3d(np.zeros((1, 3), np.float32), np.zeros(1), np.zeros(1))
    )
    np.testing.assert_allclose(T[0], np.eye(4), atol=1e-7)


def test_rotate_around_y_matches_reference(rng):
    ang = rng.normal(size=(7,)).astype(np.float32)
    ours = np.asarray(G.rotate_around_y_matrix(ang))
    for i, a in enumerate(ang):
        ref = np.array(
            [
                [math.cos(a), 0, math.sin(a)],
                [0, 1, 0],
                [-math.sin(a), 0, math.cos(a)],
            ]
        )
        np.testing.assert_allclose(ours[i], ref, atol=1e-6)


def test_intrinsics_reference_formula():
    # reference core.py:70-77: hfov = w/h * vfov (angle scaling)
    w, h, vfov = 256, 256, math.radians(90)
    fx, fy, cx, cy = G.intrinsics_from_vfov(w, h, vfov)
    assert fx == pytest.approx(w / (2 * math.tan(vfov / 2)))
    assert fy == pytest.approx(h / (2 * math.tan(vfov / 2)))
    assert (cx, cy) == (128.0, 128.0)

    w2, h2 = 640, 480
    fx2, fy2, _, _ = G.intrinsics_from_vfov(w2, h2, vfov)
    hfov = w2 / h2 * vfov
    assert fx2 == pytest.approx(w2 / (2 * math.tan(hfov / 2)))


def test_pixel_ray_scaling_centers():
    xs, ys = G.pixel_ray_scaling(4, 4, math.radians(90))
    xs, ys = np.asarray(xs), np.asarray(ys)
    # symmetric pixel-center rays: row/col pattern mirrors around center
    np.testing.assert_allclose(xs[0], -xs[0][::-1], atol=1e-7)
    np.testing.assert_allclose(ys[:, 0], -ys[::-1, 0], atol=1e-7)
    # pixel centers: offsets at +-0.5, +-1.5 of focal
    fx = 4 / (2 * math.tan(math.radians(90) / 2))
    np.testing.assert_allclose(
        xs[0], np.array([-1.5, -0.5, 0.5, 1.5]) / fx, atol=1e-6
    )


def test_depth_to_world_points_straight_down_camera(rng):
    # camera at (0, 2, 0) looking along -z with identity-ish heading
    B, H, W = 1, 8, 8
    depth = np.full((B, H, W), 0.1, np.float32)  # normalized -> 1 m
    xscale, yscale = G.pixel_ray_scaling(W, H, math.radians(90))
    T = G.transform3d(
        np.array([[0.0, 2.0, 0.0]], np.float32),
        np.array([0.0 + np.pi], np.float32),  # reference adds pi (mapper.py:133)
        np.array([0.0], np.float32),
    )
    pts = np.asarray(
        G.depth_to_world_points(depth, T, xscale, yscale, depth_scale=10.0)
    )
    assert pts.shape == (B, H, W, 3)
    # elevation = pi flips camera y and z: world = (x_c, cam_y - y_c, -z_c);
    # the agent faces world -z (Habitat forward convention)
    np.testing.assert_allclose(pts[0, :, :, 2], -1.0, atol=1e-5)
    # center pixels project near camera height
    assert abs(pts[0, H // 2, W // 2, 1] - 2.0) < 0.2
    # upper image rows (smaller y_scale) map to HIGHER world y
    assert pts[0, 0, 0, 1] > pts[0, -1, 0, 1]


def test_camera_to_world_matches_homogeneous_bmm(rng):
    B, N = 3, 17
    xyz = rng.normal(size=(B, N, 3)).astype(np.float32)
    T = np.asarray(
        G.transform3d(
            rng.normal(size=(B, 3)).astype(np.float32),
            rng.normal(size=(B,)).astype(np.float32),
            rng.normal(size=(B,)).astype(np.float32),
        )
    )
    ours = np.asarray(G.camera_to_world(xyz, T))
    ones = np.ones((B, N, 1), np.float32)
    homo = np.concatenate([xyz, ones], -1)  # (B, N, 4)
    ref = np.einsum("bij,bnj->bni", T, homo)[:, :, :3]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_meters_to_cell_round_half_even_matches_torch():
    vals = np.array([-0.25, -0.15, -0.05, 0.05, 0.15, 0.25, 0.35], np.float32)
    ours = np.asarray(G.meters_to_cell_index(vals, 0.1))
    ref = (torch.from_numpy(vals) / 0.1).round().long().numpy()
    np.testing.assert_array_equal(ours, ref)


def test_project_to_map_indices_bounds():
    dims = G.MapDims(6.4, 6.4, 0.1)
    assert dims.num_rows == 64 and dims.num_cols == 64
    rows_m = np.array([0.0, -3.2, 3.14, 3.19, 5.0], np.float32)
    cols_m = np.array([0.0, -3.2, 3.14, 3.19, -5.0], np.float32)
    r, c, valid = G.project_to_map_indices(rows_m, cols_m, dims)
    r, c, valid = np.asarray(r), np.asarray(c), np.asarray(valid)
    assert r[0] == 32 and c[0] == 32  # robot at map center
    assert r[1] == 0 and c[1] == 0
    assert r[2] == 63
    assert valid[0] and valid[1] and valid[2]
    assert not valid[3]  # 6.39 m rounds to cell 64 -> out of bounds
    assert not valid[4]


def test_egocentric_shift_round_trip(rng):
    B, N = 2, 9
    xyz = rng.normal(size=(B, N, 3)).astype(np.float32)
    pose = rng.normal(size=(B, 3)).astype(np.float32)
    heading = rng.normal(size=(B,)).astype(np.float32)
    ego = np.asarray(G.egocentric_shift(xyz, pose, heading))
    # invert: rotate by +heading then translate by +pose
    rot = np.asarray(G.rotate_around_y_matrix(heading))
    back = np.einsum("bij,bnj->bni", rot, ego) + pose[:, None, :]
    np.testing.assert_allclose(back, xyz, atol=1e-5)


def test_egocentric_shift_reference_order(rng):
    # reference shift_origin (mapper.py:264-266): translate(-pose) THEN
    # rotate_around_y(-heading); verify against explicit composition
    xyz = rng.normal(size=(1, 5, 3)).astype(np.float32)
    pose = np.array([[1.0, 0.5, -2.0]], np.float32)
    heading = np.array([0.7], np.float32)
    ours = np.asarray(G.egocentric_shift(xyz, pose, heading))
    rot = np.asarray(G.rotate_around_y_matrix(-heading))[0]
    ref = (xyz[0] - pose[0]) @ rot.T
    np.testing.assert_allclose(ours[0], ref, atol=1e-5)


def test_heading_from_quaternion_pure_yaw():
    for theta in [0.0, 0.5, 1.5, math.pi, -0.5, 5.0]:
        q = (0.0, math.sin(theta / 2), 0.0, math.cos(theta / 2))  # xyzw
        h = G.heading_from_quaternion(*q)
        assert h == pytest.approx(theta % (2 * math.pi), abs=1e-6)
