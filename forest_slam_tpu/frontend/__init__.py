from forest_slam_tpu.frontend.orb import OrbConfig, OrbFeatures, extract_orb
from forest_slam_tpu.frontend.matching import (
    hamming_distance_matrix,
    mutual_nn_match,
    gather_matched_points,
)

__all__ = [
    "OrbConfig",
    "OrbFeatures",
    "extract_orb",
    "hamming_distance_matrix",
    "mutual_nn_match",
    "gather_matched_points",
]
