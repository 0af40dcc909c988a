from forest_slam_tpu.stereo.disparity import SgmConfig, sgm_disparity
from forest_slam_tpu.stereo.depth import (
    disparity_to_depth,
    depth_at_keypoints,
    backproject_keypoints,
)

__all__ = [
    "SgmConfig",
    "sgm_disparity",
    "disparity_to_depth",
    "depth_at_keypoints",
    "backproject_keypoints",
]
