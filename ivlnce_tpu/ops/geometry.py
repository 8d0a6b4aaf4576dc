"""Camera / map geometry core (pure jnp, fully jit-compatible).

Replicates the math of the reference's projector and map dataclasses:
- intrinsics + pixel-ray scaling: reference
  ivlnce_baselines/common/mapping_module/projector/core.py:70-115
- camera->world extrinsic ``transform3d``: core.py:6-37
- depth -> homogeneous camera points -> world points: core.py:117-230
- meters<->cell index mapping: mapper.py:89-114
- y-axis rotation: mapper.py:38-48

Everything operates on fixed shapes; boundary conditions (depth filters,
height windows) are returned as masks rather than boolean indexing so the
whole pipeline compiles under jit (XLA requires static shapes).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

# geometry is tiny but drives closed-loop eval; bf16-truncated matmuls (the
# jax default) shift map cells, so force full fp32 MXU passes here.
_HIGHEST = jax.lax.Precision.HIGHEST


def transform3d(
    pose: jnp.ndarray, elevation: jnp.ndarray, heading: jnp.ndarray
) -> jnp.ndarray:
    """Camera-to-world matrices from pose + euler angles.

    Args:
        pose: (N, 3) x, y, z camera position (Habitat convention: y up).
        elevation: (N,) pitch angle.
        heading: (N,) yaw angle around y.
    Returns:
        (N, 4, 4) transformation matrices (reference core.py:6-37 layout).
    """
    cx = jnp.cos(elevation)
    sx = jnp.sin(elevation)
    cy = jnp.cos(heading)
    sy = jnp.sin(heading)
    zeros = jnp.zeros_like(cx)
    ones = jnp.ones_like(cx)

    row0 = jnp.stack([cy, sx * sy, cx * sy, pose[:, 0]], axis=-1)
    row1 = jnp.stack([zeros, cx, -sx, pose[:, 1]], axis=-1)
    row2 = jnp.stack([-sy, cy * sx, cy * cx, pose[:, 2]], axis=-1)
    row3 = jnp.stack([zeros, zeros, zeros, ones], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=1)


def rotate_around_y_matrix(angle: jnp.ndarray) -> jnp.ndarray:
    """(N, 3, 3) rotation matrices around the +y axis (mapper.py:38-48)."""
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    zeros = jnp.zeros_like(c)
    ones = jnp.ones_like(c)
    row0 = jnp.stack([c, zeros, s], axis=-1)
    row1 = jnp.stack([zeros, ones, zeros], axis=-1)
    row2 = jnp.stack([-s, zeros, c], axis=-1)
    return jnp.stack([row0, row1, row2], axis=1)


def intrinsics_from_vfov(
    width: int, height: int, vfov: float
) -> Tuple[float, float, float, float]:
    """fx, fy, cx, cy from a vertical FOV (reference core.py:70-77).

    The reference derives hfov = (width / height) * vfov, i.e. it scales the
    *angle* (not tan) — replicated exactly for parity.
    """
    hfov = width / height * vfov
    f_x = width / (2.0 * math.tan(hfov / 2.0))
    f_y = height / (2.0 * math.tan(vfov / 2.0))
    return f_x, f_y, width / 2.0, height / 2.0


def pixel_ray_scaling(
    width: int, height: int, vfov: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel (x_scale, y_scale) arrays of shape (H, W).

    x = z * x_scale; y = z * y_scale (reference core.py:79-115; the +0.5
    projects through pixel centers).
    """
    f_x, f_y, c_x, c_y = intrinsics_from_vfov(width, height, vfov)
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5 - c_x) / f_x
    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5 - c_y) / f_y
    x_scale = jnp.broadcast_to(xs[None, :], (height, width))
    y_scale = jnp.broadcast_to(ys[:, None], (height, width))
    return x_scale, y_scale


def depth_to_camera_xyz(
    depth_meters: jnp.ndarray,
    x_scale: jnp.ndarray,
    y_scale: jnp.ndarray,
) -> jnp.ndarray:
    """Depth (B, H, W) in meters -> camera-frame xyz (B, H, W, 3)."""
    z = depth_meters
    x = z * x_scale[None]
    y = z * y_scale[None]
    return jnp.stack([x, y, z], axis=-1)


def camera_to_world(xyz: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply (B, 4, 4) camera->world matrices to (B, ..., 3) points.

    Equivalent to reference core.py:151-230 (homogeneous bmm) without
    materializing the ones column: world = R @ xyz + t.
    """
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    flat = xyz.reshape(xyz.shape[0], -1, 3)
    world = jnp.einsum(
        "bij,bnj->bni", R, flat, precision=_HIGHEST,
        preferred_element_type=jnp.float32,
    ) + t[:, None, :]
    return world.reshape(xyz.shape)


def depth_to_world_points(
    depth_normalized: jnp.ndarray,
    camera_T: jnp.ndarray,
    x_scale: jnp.ndarray,
    y_scale: jnp.ndarray,
    depth_scale: float = 10.0,
) -> jnp.ndarray:
    """Normalized depth (B, H, W) in [0,1] -> world xyz (B, H, W, 3).

    depth_scale is the sim's max depth (reference mapper.py:381-384
    ``to_depth_meters`` NORMALIZATION_FACTOR=10).
    """
    depth_m = depth_normalized * depth_scale
    cam = depth_to_camera_xyz(depth_m, x_scale, y_scale)
    return camera_to_world(cam, camera_T)


class MapDims(NamedTuple):
    """Static egocentric map geometry (reference mapper.py:89-114)."""

    height_meters: float
    width_meters: float
    resolution_meters: float

    @property
    def num_rows(self) -> int:
        return math.ceil(self.height_meters / self.resolution_meters)

    @property
    def num_cols(self) -> int:
        return math.ceil(self.width_meters / self.resolution_meters)


def meters_to_cell_index(
    meter_values: jnp.ndarray, resolution_meters: float
) -> jnp.ndarray:
    """round() then integer cast — matches torch ``.round().long()``
    (banker's rounding; jnp.round also rounds half to even)."""
    return jnp.round(meter_values / resolution_meters).astype(jnp.int32)


def project_to_map_indices(
    rows_meters: jnp.ndarray,
    cols_meters: jnp.ndarray,
    dims: MapDims,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Egocentric meters -> (row, col, in_bounds) (mapper.py:106-114).

    Points are shifted by half the map extent so the robot sits at the map
    center before rounding to cells.
    """
    rows = meters_to_cell_index(
        rows_meters + dims.height_meters / 2, dims.resolution_meters
    )
    cols = meters_to_cell_index(
        cols_meters + dims.width_meters / 2, dims.resolution_meters
    )
    valid = (
        (rows >= 0)
        & (rows < dims.num_rows)
        & (cols >= 0)
        & (cols < dims.num_cols)
    )
    return rows, cols, valid


def egocentric_shift(
    xyz: jnp.ndarray, origin_pose: jnp.ndarray, origin_heading: jnp.ndarray
) -> jnp.ndarray:
    """World points -> egocentric frame: translate by -pose then rotate by
    -heading around y (reference mapper.py:255-266 ``shift_origin``).

    Args:
        xyz: (B, N, 3) world points.
        origin_pose: (B, 3).
        origin_heading: (B,).
    """
    shifted = xyz - origin_pose[:, None, :]
    rot = rotate_around_y_matrix(-origin_heading)
    return jnp.einsum(
        "bij,bnj->bni", rot, shifted, precision=_HIGHEST,
        preferred_element_type=jnp.float32,
    )


def heading_from_quaternion(x: float, y: float, z: float, w: float) -> float:
    """Heading (yaw about +y) from an xyzw quaternion, matching the
    reference (habitat_extensions/utils.py:146-152): rotate (0, 0, -1) by
    the quaternion's INVERSE, then phi = atan2(v_x, -v_z), wrapped to
    [0, 2*pi)."""
    # v = R(q^-1) @ (0, 0, -1); conjugate negates x, y, z
    vx = -2 * (x * z - w * y)
    vz = -(1 - 2 * (x * x + y * y))
    return math.atan2(vx, -vz) % (2 * math.pi)
