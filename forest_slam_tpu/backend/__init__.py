from forest_slam_tpu.backend.mapping import voxel_downsample, accumulate_map

__all__ = ["voxel_downsample", "accumulate_map"]
