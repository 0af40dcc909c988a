from forest_slam_tpu.pipelines.mono import MonoConfig, run_mono_vo
from forest_slam_tpu.pipelines.stereo import StereoConfig, run_stereo_vo

__all__ = ["MonoConfig", "run_mono_vo", "StereoConfig", "run_stereo_vo"]
