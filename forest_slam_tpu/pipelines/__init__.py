from forest_slam_tpu.pipelines.mono import MonoConfig, run_mono_vo

__all__ = ["MonoConfig", "run_mono_vo"]
