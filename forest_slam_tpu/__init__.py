"""forest_slam_tpu — a TPU-native visual SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
Forest-SLAM reference (monocular + stereo visual odometry over the
BotanicGarden forest dataset, classical ORB and learned
SuperPoint/SuperGlue-style front-ends, trajectory evaluation, and
point-cloud mapping), redesigned TPU-first:

- fixed-shape, masked keypoint sets (no ragged arrays),
- pure-function ``SlamState`` pytrees threaded through ``lax.scan``,
- RANSAC as vmapped hypothesis batches,
- descriptor matching as MXU matmuls,
- multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map``.

Layer map (mirrors SURVEY.md §7):
    core/      SE(3) / quaternion / camera math
    io/        dataset decode (rosbag), calibration, TUM + PLY sinks
    eval/      evo-equivalent APE/RPE with Umeyama alignment
    frontend/  ORB + Hamming matching; SuperPoint + attention matcher
    geometry/  robust estimators (E-matrix, PnP) and triangulation
    stereo/    disparity (SGM) and depth back-projection
    backend/   sliding-window BA, pose graph, loop closure, mapping
    pipelines/ mono / stereo / full SLAM / sharded multi-sequence eval
    parallel/  mesh + sharding utilities
    train/     training for the learned front-end
"""

__version__ = "0.1.0"
