from forest_slam_tpu.pipelines.mono import MonoConfig, run_mono_vo
from forest_slam_tpu.pipelines.stereo import (
    StereoConfig,
    run_stereo_vo,
    run_stereo_vo_streaming,
)
from forest_slam_tpu.pipelines.slam import SlamConfig, run_slam
from forest_slam_tpu.pipelines.batch_eval import run_batched_eval

__all__ = [
    "MonoConfig",
    "run_mono_vo",
    "StereoConfig",
    "run_stereo_vo",
    "run_stereo_vo_streaming",
    "SlamConfig",
    "run_slam",
    "run_batched_eval",
]
