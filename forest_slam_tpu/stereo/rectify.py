"""Stereo rectification (Bouguet) — the *correct* alternative to quirk B3.

The reference never rectifies: it undistorts both cameras and indexes the
SGBM disparity map at raw keypoint pixels (stereo_slam.py:185,197,278),
which only works because the BotanicGarden rig is nearly fronto-parallel
(R ~ I in T_rgb0_rgb1 — SURVEY.md §2.4 B3). The pipelines reproduce that
behavior for parity; this module adds the principled mode behind a flag
(SURVEY.md §7.3 item 6): compute the Bouguet rectifying rotations, build
dst->src remap grids (one-time, host/NumPy — they are per-calibration
constants), and return a rectified rig whose epipolar lines are exactly
row-aligned, so stereo matching semantics become correct for any rig.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from forest_slam_tpu.core.camera import PinholeCamera, StereoRig, remap_bilinear


class RectifiedStereo(NamedTuple):
    rig: StereoRig  # rectified rig: identity rotation, x-only baseline
    R_left: np.ndarray  # (3, 3) original-left -> rectified rotation
    R_right: np.ndarray  # (3, 3)
    map_left: jax.Array  # (H, W, 2) dst->src sampling grid (x, y)
    map_right: jax.Array


def _distort(pts: np.ndarray, cam: PinholeCamera) -> np.ndarray:
    """Forward Brown-Conrady distortion of normalized (N, 2) points."""
    k1, k2, p1, p2, k3 = np.asarray(cam.dist, np.float64)
    x, y = pts[:, 0], pts[:, 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return np.stack([xd, yd], axis=1)


def stereo_rectify(rig: StereoRig) -> RectifiedStereo:
    """Bouguet rectification: split the inter-camera rotation evenly and
    rotate both so the baseline becomes the shared +x axis."""
    T = np.asarray(rig.T_left_right, np.float64)  # right -> left
    R_rl = T[:3, :3]  # rotates right-cam vectors into left-cam coords
    t = T[:3, 3]  # right-cam origin in left-cam coords (baseline vector)

    # split R between the two cameras (rotation-vector halving): with
    # R_rl = exp(w), rotating left by exp(-w/2) and right by exp(+w/2)
    # gives both cameras one shared orientation (exp(-w/2) R_rl = exp(w/2))
    w, _ = _rotmat_to_rotvec(R_rl)
    R_half = _rotvec_to_rotmat(w * 0.5)
    r_l = R_half.T  # exp(-w/2)
    r_r = R_half  # exp(+w/2)

    # common frame: rotate so the baseline becomes exactly +x (so the
    # rectified right camera sits at (+baseline, 0, 0) and disparity is
    # positive with the x_r = x_l - d search convention)
    t_common = r_l @ t
    e1 = t_common / np.linalg.norm(t_common)
    e2 = np.cross([0.0, 0.0, 1.0], e1)
    n2 = np.linalg.norm(e2)
    if n2 < 1e-9:
        e2 = np.array([0.0, 1.0, 0.0])
    else:
        e2 = e2 / n2
    e3 = np.cross(e1, e2)
    R_align = np.stack([e1, e2, e3], axis=0)

    R_left = R_align @ r_l
    R_right = R_align @ r_r

    H, W = rig.left.height, rig.left.width
    fx = float(np.asarray(rig.left.fx))
    fy = float(np.asarray(rig.left.fy))
    K_new = np.array(
        [[fx, 0, W / 2.0 - 0.5], [0, fy, H / 2.0 - 0.5], [0, 0, 1.0]]
    )
    baseline = float(np.linalg.norm(t))

    map_l = _rect_map(rig.left, R_left, K_new)
    map_r = _rect_map(rig.right, R_right, K_new)

    cam_new = PinholeCamera.create(K_new, None, W, H)
    T_lr = np.eye(4)
    T_lr[0, 3] = baseline
    rect_rig = StereoRig(
        left=cam_new, right=cam_new, T_left_right=jnp.asarray(T_lr, jnp.float32)
    )
    return RectifiedStereo(
        rig=rect_rig,
        R_left=R_left,
        R_right=R_right,
        map_left=jnp.asarray(map_l, jnp.float32),
        map_right=jnp.asarray(map_r, jnp.float32),
    )


def _rect_map(cam: PinholeCamera, R: np.ndarray, K_new: np.ndarray) -> np.ndarray:
    """(H, W, 2) dst->src grid: rectified pixel -> original distorted pixel."""
    H, W = cam.height, cam.width
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    pts = np.stack([xs.ravel(), ys.ravel(), np.ones(H * W)], axis=0)
    rays = np.linalg.inv(K_new) @ pts  # rectified normalized rays
    rays = R.T @ rays  # back into the original camera frame
    xn = rays[0] / rays[2]
    yn = rays[1] / rays[2]
    dist = _distort(np.stack([xn, yn], axis=1), cam)
    K = np.asarray(cam.K, np.float64)
    u = K[0, 0] * dist[:, 0] + K[0, 2]
    v = K[1, 1] * dist[:, 1] + K[1, 2]
    return np.stack([u, v], axis=1).reshape(H, W, 2)


def rectify_images(rect: RectifiedStereo, images_l, images_r):
    """Remap (N, H, W) raw stacks into the rectified frame (jit/vmapped)."""
    f = jax.jit(jax.vmap(lambda im, m: remap_bilinear(im, m), in_axes=(0, None)))
    return f(jnp.asarray(images_l, jnp.float32), rect.map_left), f(
        jnp.asarray(images_r, jnp.float32), rect.map_right
    )


def _rotvec_to_rotmat(w: np.ndarray) -> np.ndarray:
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx


def _rotmat_to_rotvec(R: np.ndarray) -> tuple[np.ndarray, float]:
    tr = np.clip((np.trace(R) - 1) / 2, -1, 1)
    th = np.arccos(tr)
    if th < 1e-12:
        return np.zeros(3), 0.0
    v = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return v / (2 * np.sin(th)) * th, th
