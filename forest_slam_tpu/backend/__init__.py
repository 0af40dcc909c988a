from forest_slam_tpu.backend.mapping import voxel_downsample, accumulate_map
from forest_slam_tpu.backend.ba import BAProblem, BAResult, ba_solve
from forest_slam_tpu.backend.relocalize import (
    RelocalizeConfig,
    RelocalizeEvents,
    relocalize_trajectory,
)
from forest_slam_tpu.backend.window import (
    StereoArtifacts,
    WindowBAConfig,
    refine_trajectory_ba,
)

__all__ = [
    "voxel_downsample",
    "accumulate_map",
    "BAProblem",
    "BAResult",
    "ba_solve",
    "RelocalizeConfig",
    "RelocalizeEvents",
    "relocalize_trajectory",
    "StereoArtifacts",
    "WindowBAConfig",
    "refine_trajectory_ba",
]
