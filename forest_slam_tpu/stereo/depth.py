"""Disparity -> depth and keypoint back-projection.

Reproduces the reference's stereo depth stage exactly
(stereo_slam.py:117-121, 264-288):

- disparities of 0 or -1 are clamped to 0.1 before the division (its
  "avoid division by zero" guard — which intentionally produces huge,
  later-gated depths rather than NaNs),
- depth = fx * baseline / disparity,
- keypoint depth lookup uses truncated-int pixel coordinates (quirk B3),
- the validity gate is 0.1 < Z < 1000.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from forest_slam_tpu.core.camera import PinholeCamera, backproject_depth


def disparity_to_depth(
    disparity: jax.Array, fx: jax.Array, baseline: jax.Array
) -> jax.Array:
    """(H, W) disparity -> (H, W) depth with the reference's clamping."""
    d = jnp.where((disparity == 0.0) | (disparity == -1.0), 0.1, disparity)
    return fx * baseline / d


def depth_at_keypoints(depth: jax.Array, xy: jax.Array) -> jax.Array:
    """Sample (H, W) depth at (N, 2) pixel coords, int truncation (B3)."""
    H, W = depth.shape
    xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, H - 1)
    return depth[yi, xi]


def backproject_keypoints(
    xy: jax.Array,
    depth_map: jax.Array,
    cam: PinholeCamera,
    min_depth: float = 0.1,
    max_depth: float = 1000.0,
) -> tuple[jax.Array, jax.Array]:
    """Back-project keypoints through the depth map.

    Returns ((N, 3) camera-frame points, (N,) validity gate) — the
    X/Y/Z construction + depth gate of stereo_slam.py:274-288.
    """
    z = depth_at_keypoints(depth_map, xy)
    pts = backproject_depth(xy, z, cam)
    valid = (z > min_depth) & (z < max_depth)
    return pts, valid
