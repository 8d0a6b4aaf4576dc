from ivlnce_tpu.mapping.camera import (
    CameraParameters,
    camera_parameters_from_config,
    vertical_fov_radians,
)
from ivlnce_tpu.mapping.mapper import (
    MapperParams,
    MapperState,
    clear_lanes,
    init_state,
    load_points_into_state,
    mapper_step,
)

__all__ = [
    "CameraParameters",
    "camera_parameters_from_config",
    "vertical_fov_radians",
    "MapperParams",
    "MapperState",
    "clear_lanes",
    "init_state",
    "load_points_into_state",
    "mapper_step",
]
