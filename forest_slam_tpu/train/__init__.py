from forest_slam_tpu.train.data import (
    random_corner_image,
    random_homography,
    warp_image,
    make_training_batch,
)
from forest_slam_tpu.train.losses import (
    detector_loss,
    descriptor_nce_loss,
    matching_loss,
)
from forest_slam_tpu.train.trainer import (
    TrainConfig,
    create_train_state,
    train_step,
    make_sharded_train_step,
)

__all__ = [
    "random_corner_image",
    "random_homography",
    "warp_image",
    "make_training_batch",
    "detector_loss",
    "descriptor_nce_loss",
    "matching_loss",
    "TrainConfig",
    "create_train_state",
    "train_step",
    "make_sharded_train_step",
]
