"""SGM disparity: accuracy vs ground truth and vs OpenCV StereoSGBM."""

import numpy as np
import jax.numpy as jnp
import pytest

from forest_slam_tpu.io.synthetic import render_sequence
from forest_slam_tpu.stereo import SgmConfig, sgm_disparity, disparity_to_depth

CFG = SgmConfig(num_disparities=48)


@pytest.fixture(scope="module")
def stereo_pair():
    seq = render_sequence(n_frames=1, height=160, width=224, seed=5)
    il = np.asarray(seq.images_left[0])
    ir = np.asarray(seq.images_right[0])
    d_gt = float(seq.rig.left.fx) * float(seq.rig.baseline) / np.asarray(
        seq.depths_left[0]
    )
    return il, ir, d_gt


def _accuracy(disp, d_gt):
    """(fraction valid, median abs error on valid in-range pixels)."""
    m = (disp > 0) & (d_gt > 1.0) & (d_gt < 46.0)
    m[:, :52] = False  # left band: occluded / out of disparity range
    err = np.abs(disp - d_gt)[m]
    return m.mean(), np.median(err)


def test_sgm_accuracy_vs_gt(stereo_pair):
    il, ir, d_gt = stereo_pair
    disp = np.asarray(sgm_disparity(jnp.asarray(il), jnp.asarray(ir), CFG))
    frac, med = _accuracy(disp, d_gt)
    assert frac > 0.5, f"valid fraction {frac}"
    assert med < 0.5, f"median disparity error {med} px"


def test_sgm_not_worse_than_opencv(stereo_pair):
    cv2 = pytest.importorskip("cv2")
    il, ir, d_gt = stereo_pair
    ours = np.asarray(sgm_disparity(jnp.asarray(il), jnp.asarray(ir), CFG))

    matcher = cv2.StereoSGBM_create(
        numDisparities=48,
        minDisparity=0,
        blockSize=7,
        P1=8 * 49,
        P2=32 * 49,
        mode=cv2.STEREO_SGBM_MODE_SGBM_3WAY,
    )
    cv = matcher.compute(il.astype(np.uint8), ir.astype(np.uint8)).astype(np.float32) / 16
    _, med_ours = _accuracy(ours, d_gt)
    _, med_cv = _accuracy(cv, d_gt)
    # parity gate: our median error within 2x of OpenCV's on the same scene
    assert med_ours < max(2.0 * med_cv, 0.5), f"ours {med_ours} vs cv {med_cv}"
    # and the two maps agree where both are valid
    both = (ours > 0) & (cv > 0)
    both[:, :52] = False
    agree = np.abs(ours - cv)[both]
    assert np.median(agree) < 1.0


def test_disparity_to_depth_clamping():
    disp = jnp.asarray([[0.0, -1.0, 2.0, 16.0]])
    depth = np.asarray(disparity_to_depth(disp, 100.0, 0.25))
    # 0 and -1 clamp to 0.1 -> depth 250 (huge, gated later) — reference
    # semantics (stereo_slam.py:120-121)
    np.testing.assert_allclose(depth[0, :2], [250.0, 250.0])
    np.testing.assert_allclose(depth[0, 2:], [12.5, 25.0 / 16.0])
