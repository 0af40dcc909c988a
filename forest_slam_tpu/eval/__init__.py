from forest_slam_tpu.eval.alignment import umeyama_alignment, align_trajectory
from forest_slam_tpu.eval.association import associate
from forest_slam_tpu.eval.metrics import (
    ErrorStats,
    ape_translation,
    rpe_distance_ratio,
    evaluate_ate,
)
from forest_slam_tpu.eval.viewer import write_viewer_html

__all__ = [
    "write_viewer_html",
    "umeyama_alignment",
    "align_trajectory",
    "associate",
    "ErrorStats",
    "ape_translation",
    "rpe_distance_ratio",
    "evaluate_ate",
]
