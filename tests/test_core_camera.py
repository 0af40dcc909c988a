"""Camera model tests: parity against OpenCV undistort/projectPoints."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from forest_slam_tpu.core import camera as cam_mod
from forest_slam_tpu.io.calib import botanic_garden_rig


def make_cam(w=160, h=120):
    K = np.array([[120.0, 0, 80.0], [0, 119.0, 60.0], [0, 0, 1]])
    dist = np.array([-0.06, 0.094, 0.0, 0.0, 0.0])
    return cam_mod.PinholeCamera.create(K, dist, width=w, height=h), K, dist


def test_project_points_matches_opencv():
    cam, K, dist = make_cam()
    rng = np.random.default_rng(0)
    pts3d = rng.uniform([-1, -1, 2], [1, 1, 8], size=(100, 3))
    expect, _ = cv2.projectPoints(
        pts3d, np.zeros(3), np.zeros(3), K, dist
    )
    ours = np.asarray(cam_mod.project_points(jnp.asarray(pts3d), cam))
    np.testing.assert_allclose(ours, expect[:, 0, :], atol=1e-4)


def test_undistort_points_roundtrip():
    cam, K, dist = make_cam()
    rng = np.random.default_rng(1)
    pix = rng.uniform([10, 10], [150, 110], size=(200, 2))
    xn = np.asarray(cam_mod.undistort_points(jnp.asarray(pix), cam))
    # re-distort and reproject: should reproduce the original pixels
    back = np.asarray(
        cam_mod.distort_points(jnp.asarray(xn), cam.dist)
    ) * np.array([cam.fx, cam.fy]) + np.array([cam.cx, cam.cy])
    np.testing.assert_allclose(back, pix, atol=1e-3)


def test_undistort_points_matches_opencv():
    cam, K, dist = make_cam()
    rng = np.random.default_rng(2)
    pix = rng.uniform([10, 10], [150, 110], size=(50, 2)).astype(np.float64)
    expect = cv2.undistortPoints(pix.reshape(-1, 1, 2), K, dist).reshape(-1, 2)
    ours = np.asarray(cam_mod.undistort_points(jnp.asarray(pix), cam, iters=10))
    np.testing.assert_allclose(ours, expect, atol=1e-5)


def test_undistort_image_matches_opencv():
    cam, K, dist = make_cam()
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(120, 160), dtype=np.uint8)
    expect = cv2.undistort(img, K, dist).astype(np.float32)
    ours = np.asarray(cam_mod.undistort_image(jnp.asarray(img), cam))
    # interior pixels should agree closely (border handling differs slightly)
    diff = np.abs(ours[5:-5, 5:-5] - expect[5:-5, 5:-5])
    assert np.mean(diff) < 1.0
    assert np.percentile(diff, 99) < 4.0  # cv2 uses 5-bit fixed-point interpolation


def test_bgr_to_gray_matches_opencv():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, size=(60, 80, 3), dtype=np.uint8)
    expect = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float32)
    ours = np.asarray(cam_mod.bgr_to_gray(jnp.asarray(img)))
    assert np.max(np.abs(ours - expect)) <= 0.51  # rounding only


def test_backproject_project_roundtrip():
    cam, K, dist = make_cam()
    rng = np.random.default_rng(5)
    pix = rng.uniform([10, 10], [150, 110], size=(64, 2))
    depth = rng.uniform(1.0, 20.0, size=(64,))
    pts3d = cam_mod.backproject_depth(jnp.asarray(pix), jnp.asarray(depth), cam)
    repro = np.asarray(
        cam_mod.project_points(pts3d, cam, with_distortion=False)
    )
    np.testing.assert_allclose(repro, pix, atol=1e-4)


def test_botanic_garden_rig_baseline():
    rig = botanic_garden_rig()
    # baseline from T_rgb0_rgb1 translation (reference stereo_slam.py:270,
    # including its (1,16)-shape quirk B4 which slices to element [0,3])
    assert abs(float(rig.baseline) - 0.2537) < 1e-3
    assert rig.left.width == 960 and rig.left.height == 600
