from forest_slam_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    batch_shardings,
    replicated,
)

__all__ = ["make_mesh", "param_shardings", "batch_shardings", "replicated"]
