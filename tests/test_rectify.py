"""Stereo rectification (stereo/rectify.py) — the correct-geometry mode.

The reference (and the parity pipelines) skip rectification, which only
works because BotanicGarden's rig is nearly fronto-parallel (quirk B3).
These tests build a rig whose right camera is deliberately rotated and
check that rectification restores row-aligned epipolar geometry and metric
depth.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from forest_slam_tpu.core.camera import PinholeCamera, StereoRig
from forest_slam_tpu.io.synthetic import make_corridor_world, render_view
from forest_slam_tpu.stereo.rectify import rectify_images, stereo_rectify


def _rotated_rig(H, W, baseline=0.25, yaw_deg=2.0, pitch_deg=1.0):
    f = 0.67 * W
    K = np.array([[f, 0, W / 2 - 0.5], [0, f, H / 2 - 0.5], [0, 0, 1]], np.float32)
    cam = PinholeCamera.create(K, None, W, H)
    a = np.deg2rad(yaw_deg)
    b = np.deg2rad(pitch_deg)
    Ry = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])
    Rx = np.array([[1, 0, 0], [0, np.cos(b), -np.sin(b)], [0, np.sin(b), np.cos(b)]])
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = (Ry @ Rx).astype(np.float32)
    T[0, 3] = baseline
    return StereoRig(left=cam, right=cam, T_left_right=jnp.asarray(T))


def test_rectified_rig_geometry():
    rig = _rotated_rig(160, 224)
    rect = stereo_rectify(rig)
    # rectified extrinsics: identity rotation, +x baseline
    T = np.asarray(rect.rig.T_left_right)
    assert np.allclose(T[:3, :3], np.eye(3), atol=1e-6)
    assert T[0, 3] > 0
    assert abs(T[0, 3] - float(np.asarray(rig.baseline))) < 1e-6
    assert abs(T[1, 3]) < 1e-6 and abs(T[2, 3]) < 1e-6
    # the rectifying rotations are consistent: R_left @ R_rl == R_right
    R_rl = np.asarray(rig.T_left_right)[:3, :3]
    assert np.allclose(rect.R_left @ R_rl, rect.R_right, atol=1e-6)


def test_rectification_row_aligns_and_recovers_depth():
    H, W = 160, 224
    rig = _rotated_rig(H, W)
    world = make_corridor_world(jax.random.PRNGKey(5))
    T_cam = jnp.eye(4)
    img_l, dep_l = render_view(world, T_cam, rig.left.K, H, W)
    img_r, _ = render_view(world, T_cam @ rig.T_left_right, rig.right.K, H, W)

    rect = stereo_rectify(rig)
    rl, rr = rectify_images(rect, img_l[None], img_r[None])
    rl, rr = rl[0], rr[0]

    from forest_slam_tpu.frontend import OrbConfig
    from forest_slam_tpu.frontend.orb import extract_orb
    from forest_slam_tpu.stereo.sparse import (
        SparseStereoConfig,
        sparse_depth_at_keypoints,
    )

    cfg = OrbConfig(n_features=256, n_levels=3)
    feats = extract_orb(rl, cfg)
    z, ok = sparse_depth_at_keypoints(
        rl, rr, feats.xy, rect.rig.left.fx, rect.rig.baseline,
        SparseStereoConfig(num_disparities=48),
    )
    ok = np.asarray(ok) & np.asarray(feats.valid)
    assert ok.sum() > 50, f"only {ok.sum()} valid stereo matches after rectify"

    # ground truth: depth of the rectified ray, read from the rendered
    # z-buffer at the original-left pixel and converted between frames
    xy = np.asarray(feats.xy)[ok]
    src = np.asarray(rect.map_left)  # rectified px -> original left px
    xi = np.clip(xy[:, 0].astype(int), 0, W - 1)
    yi = np.clip(xy[:, 1].astype(int), 0, H - 1)
    src_px = src[yi, xi]  # original-left pixel coords
    sx = np.clip(np.round(src_px[:, 0]).astype(int), 0, W - 1)
    sy = np.clip(np.round(src_px[:, 1]).astype(int), 0, H - 1)
    dep = np.asarray(dep_l)
    z_gt_orig = dep[sy, sx]  # z along ORIGINAL left axis
    # convert: point along original ray at depth z has rectified z
    Kinv = np.linalg.inv(np.asarray(rig.left.K, np.float64))
    rays = Kinv @ np.stack([src_px[:, 0], src_px[:, 1], np.ones(len(sx))])
    pts = rays / rays[2] * z_gt_orig  # original-left 3D
    z_gt_rect = (rect.R_left @ pts)[2]

    sel = np.isfinite(z_gt_rect) & (z_gt_rect < 20)
    rel = np.abs(np.asarray(z)[ok][sel] - z_gt_rect[sel]) / z_gt_rect[sel]
    assert np.median(rel) < 0.05, f"median depth error {np.median(rel):.3f}"


def test_unrectified_rotated_rig_breaks_depth():
    """Control: the same rotated rig WITHOUT rectification yields much
    worse sparse-stereo coverage/accuracy (this is what quirk B3 would do
    to a non-fronto-parallel rig)."""
    H, W = 160, 224
    rig = _rotated_rig(H, W)
    world = make_corridor_world(jax.random.PRNGKey(5))
    img_l, dep_l = render_view(world, jnp.eye(4), rig.left.K, H, W)
    img_r, _ = render_view(
        world, jnp.eye(4) @ rig.T_left_right, rig.right.K, H, W
    )

    from forest_slam_tpu.frontend import OrbConfig
    from forest_slam_tpu.frontend.orb import extract_orb
    from forest_slam_tpu.stereo.sparse import (
        SparseStereoConfig,
        sparse_depth_at_keypoints,
    )

    cfg = OrbConfig(n_features=256, n_levels=3)
    feats = extract_orb(img_l, cfg)
    z, ok = sparse_depth_at_keypoints(
        img_l, img_r, feats.xy, rig.left.fx, rig.baseline,
        SparseStereoConfig(num_disparities=48),
    )
    ok = np.asarray(ok) & np.asarray(feats.valid)
    xy = np.asarray(feats.xy)[ok]
    dep = np.asarray(dep_l)
    xi = np.clip(xy[:, 0].astype(int), 0, W - 1)
    yi = np.clip(xy[:, 1].astype(int), 0, H - 1)
    z_gt = dep[yi, xi]
    sel = np.isfinite(z_gt) & (z_gt < 20)
    if sel.sum() == 0:
        return  # matching collapsed entirely — also proves the point
    rel = np.abs(np.asarray(z)[ok][sel] - z_gt[sel]) / z_gt[sel]
    # vertically misaligned epipolar lines: grossly degraded depth
    assert np.median(rel) > 0.05
