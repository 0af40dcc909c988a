from forest_slam_tpu.io.tum import read_tum, write_tum, Trajectory
from forest_slam_tpu.io.calib import (
    botanic_garden_left,
    botanic_garden_right,
    botanic_garden_rig,
)
from forest_slam_tpu.io.ply import write_ply

__all__ = [
    "read_tum",
    "write_tum",
    "Trajectory",
    "botanic_garden_left",
    "botanic_garden_right",
    "botanic_garden_rig",
    "write_ply",
]
