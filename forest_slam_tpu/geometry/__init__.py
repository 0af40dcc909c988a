from forest_slam_tpu.geometry.ransac import ransac_sample_indices
from forest_slam_tpu.geometry.triangulation import triangulate_linear
from forest_slam_tpu.geometry.epipolar import (
    find_essential_ransac,
    recover_pose,
    refine_pose_sampson,
    estimate_relative_pose,
    essential_from_pose,
    sampson_error,
)
from forest_slam_tpu.geometry.pnp import solve_pnp_ransac
from forest_slam_tpu.geometry.fivepoint import five_point_candidates

__all__ = [
    "ransac_sample_indices",
    "triangulate_linear",
    "find_essential_ransac",
    "recover_pose",
    "refine_pose_sampson",
    "estimate_relative_pose",
    "essential_from_pose",
    "sampson_error",
    "solve_pnp_ransac",
    "five_point_candidates",
]
