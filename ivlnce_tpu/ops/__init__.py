from ivlnce_tpu.ops import geometry, scatter
from ivlnce_tpu.ops.geometry import (
    MapDims,
    camera_to_world,
    depth_to_world_points,
    egocentric_shift,
    heading_from_quaternion,
    intrinsics_from_vfov,
    meters_to_cell_index,
    pixel_ray_scaling,
    project_to_map_indices,
    rotate_around_y_matrix,
    transform3d,
)
from ivlnce_tpu.ops.scatter import (
    keep_highest_dedup,
    rasterize_argmax,
    scatter_argmax_grid_update,
    segment_argmax,
)

__all__ = [
    "geometry",
    "scatter",
    "MapDims",
    "camera_to_world",
    "depth_to_world_points",
    "egocentric_shift",
    "heading_from_quaternion",
    "intrinsics_from_vfov",
    "meters_to_cell_index",
    "pixel_ray_scaling",
    "project_to_map_indices",
    "rotate_around_y_matrix",
    "transform3d",
    "keep_highest_dedup",
    "rasterize_argmax",
    "scatter_argmax_grid_update",
    "segment_argmax",
]
