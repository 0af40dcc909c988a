"""Pinhole camera model with Brown-Conrady distortion, TPU-first.

Replaces the reference's OpenCV C++ calls (``cv2.undistort`` at
stereo_slam.py:185,197; projection math at stereo_slam.py:264-284) with pure
JAX that jits/fuses on TPU:

- ``undistort_map`` precomputes the dst->src sampling grid once per
  calibration (same math as ``cv2.initUndistortRectifyMap`` with
  ``newCameraMatrix = K``),
- ``remap_bilinear`` applies it as a gather + lerp that XLA vectorizes on the
  VPU (no per-pixel host loop),
- all point ops are batched ``(..., N, 2/3)``.

The distortion model carries ``[k1, k2, p1, p2, k3]`` like OpenCV; the
BotanicGarden calibration uses only k1, k2 (stereo_slam.py:50,58).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    """Intrinsics + distortion. ``K`` is (3, 3), ``dist`` is (5,) [k1,k2,p1,p2,k3]."""

    K: jax.Array
    dist: jax.Array
    width: int
    height: int

    @property
    def fx(self):
        return self.K[0, 0]

    @property
    def fy(self):
        return self.K[1, 1]

    @property
    def cx(self):
        return self.K[0, 2]

    @property
    def cy(self):
        return self.K[1, 2]

    @classmethod
    def create(cls, K, dist=None, width: int = 0, height: int = 0) -> "PinholeCamera":
        K = jnp.asarray(K, jnp.float32)
        if dist is None:
            dist = jnp.zeros((5,), jnp.float32)
        else:
            dist = jnp.asarray(dist, jnp.float32).reshape(-1)
            dist = jnp.concatenate([dist, jnp.zeros((5 - dist.shape[0],), jnp.float32)])
        return cls(K=K, dist=dist, width=width, height=height)


class StereoRig(NamedTuple):
    """A calibrated stereo pair. ``T_left_right`` maps right-cam coords into
    left-cam coords (the reference's ``T_rgb0_rgb1``, stereo_slam.py:61-64).
    """

    left: PinholeCamera
    right: PinholeCamera
    T_left_right: jax.Array  # (4, 4)

    @property
    def baseline(self) -> jax.Array:
        return jnp.linalg.norm(self.T_left_right[:3, 3])


# --------------------------------------------------------------------------
# Distortion
# --------------------------------------------------------------------------


def distort_points(xn: jax.Array, dist: jax.Array) -> jax.Array:
    """Apply Brown-Conrady distortion to normalized points (..., 2)."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xy = x * y
    xd = x * radial + 2.0 * p1 * xy + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * xy
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(
    pts: jax.Array, cam: PinholeCamera, iters: int = 5
) -> jax.Array:
    """Pixel points (..., 2) -> undistorted normalized points (..., 2).

    Fixed-point iteration (same scheme as ``cv2.undistortPoints``): a static
    ``iters``-step loop, jit-friendly.
    """
    xn = (pts - jnp.stack([cam.cx, cam.cy])) / jnp.stack([cam.fx, cam.fy])
    x = xn
    for _ in range(iters):
        k1, k2, p1, p2, k3 = cam.dist
        xs, ys = x[..., 0], x[..., 1]
        r2 = xs * xs + ys * ys
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * xs * ys + p2 * (r2 + 2.0 * xs * xs)
        dy = p1 * (r2 + 2.0 * ys * ys) + 2.0 * p2 * xs * ys
        x = (xn - jnp.stack([dx, dy], axis=-1)) / radial[..., None]
    return x


def project_points(
    pts3d: jax.Array, cam: PinholeCamera, with_distortion: bool = True
) -> jax.Array:
    """Camera-frame 3D points (..., 3) -> pixel coordinates (..., 2).

    Mirrors OpenCV ``projectPoints`` semantics (used implicitly inside the
    reference's ``solvePnPRansac`` reprojection test, stereo_slam.py:294).
    """
    z = pts3d[..., 2:3]
    xn = pts3d[..., :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    if with_distortion:
        xn = distort_points(xn, cam.dist)
    return xn * jnp.stack([cam.fx, cam.fy]) + jnp.stack([cam.cx, cam.cy])


def backproject_depth(
    pts2d: jax.Array, depth: jax.Array, cam: PinholeCamera
) -> jax.Array:
    """Pixels (..., 2) + depths (...,) -> camera-frame 3D points (..., 3).

    Same back-projection as stereo_slam.py:280-284 (pinhole, no distortion —
    the reference back-projects keypoints from already-undistorted images).
    """
    x = (pts2d[..., 0] - cam.cx) / cam.fx * depth
    y = (pts2d[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


# --------------------------------------------------------------------------
# Image undistortion (remap)
# --------------------------------------------------------------------------


def undistort_map(cam: PinholeCamera) -> jax.Array:
    """Precompute the dst->src sampling grid for image undistortion.

    Returns ``(H, W, 2)`` float32 of (x_src, y_src) pixel coords — the same
    map ``cv2.initUndistortRectifyMap`` builds: for every destination pixel,
    normalize with K, apply forward distortion, reproject with K.
    """
    ys = jnp.arange(cam.height, dtype=jnp.float32)
    xs = jnp.arange(cam.width, dtype=jnp.float32)
    grid_x, grid_y = jnp.meshgrid(xs, ys)  # (H, W)
    xn = jnp.stack(
        [(grid_x - cam.cx) / cam.fx, (grid_y - cam.cy) / cam.fy], axis=-1
    )
    xd = distort_points(xn, cam.dist)
    src_x = xd[..., 0] * cam.fx + cam.cx
    src_y = xd[..., 1] * cam.fy + cam.cy
    return jnp.stack([src_x, src_y], axis=-1)


def remap_bilinear(image: jax.Array, src_map: jax.Array) -> jax.Array:
    """Bilinear remap: sample ``image`` (H, W) or (H, W, C) at ``src_map``
    (H', W', 2) of (x, y) coords. Out-of-bounds samples are 0 (OpenCV
    BORDER_CONSTANT default). Pure gather + lerp — fuses on the VPU.
    """
    H, W = image.shape[0], image.shape[1]
    chan = image.ndim == 3
    img = image if chan else image[..., None]
    img = img.astype(jnp.float32)

    x = src_map[..., 0]
    y = src_map[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        vals = img[yc, xc]  # advanced indexing -> gather
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )
    if not chan:
        out = out[..., 0]
    return out


def undistort_image(image: jax.Array, cam: PinholeCamera) -> jax.Array:
    """One-shot undistort (map computed inline; prefer precomputing the map
    with ``undistort_map`` once per calibration in pipelines)."""
    return remap_bilinear(image, undistort_map(cam))


def bgr_to_gray(image: jax.Array) -> jax.Array:
    """BGR (H, W, 3) -> grayscale (H, W), OpenCV luma weights
    (reference: stereo_slam.py:186 ``cv2.cvtColor(..., COLOR_BGR2GRAY)``)."""
    w = jnp.array([0.114, 0.587, 0.299], dtype=jnp.float32)  # B, G, R
    return jnp.einsum("hwc,c->hw", image.astype(jnp.float32), w)
