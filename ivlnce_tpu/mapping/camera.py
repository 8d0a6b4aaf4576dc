"""Camera parameter derivation (reference:
ivlnce_baselines/common/mapping_module/setup_mapping_module.py:13-53)."""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple


class CameraParameters(NamedTuple):
    vertical_fov_radians: float
    features_spatial_dimensions: Tuple[int, int]  # (H, W)
    height_clip: float


def vertical_fov_radians(hfov_degrees: float, height: int, width: int) -> float:
    """vfov = hfov * H / W, in radians (reference lines 13-26)."""
    return math.radians(hfov_degrees * (height / width))


def camera_parameters_from_config(depth_sensor_cfg, mapper_cfg) -> CameraParameters:
    return CameraParameters(
        vertical_fov_radians=vertical_fov_radians(
            depth_sensor_cfg.HFOV,
            depth_sensor_cfg.HEIGHT,
            depth_sensor_cfg.WIDTH,
        ),
        features_spatial_dimensions=(
            depth_sensor_cfg.HEIGHT,
            depth_sensor_cfg.WIDTH,
        ),
        height_clip=mapper_cfg.height_clip,
    )
