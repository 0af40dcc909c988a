"""Sparse per-keypoint stereo matching accuracy + pipeline integration."""

import numpy as np
import jax.numpy as jnp
import pytest

from forest_slam_tpu.frontend import OrbConfig, extract_orb
from forest_slam_tpu.io.synthetic import render_sequence
from forest_slam_tpu.stereo.sparse import (
    SparseStereoConfig,
    sparse_disparity_at_keypoints,
)

CFG = SparseStereoConfig(num_disparities=48)


@pytest.fixture(scope="module")
def scene():
    seq = render_sequence(n_frames=1, height=160, width=224, seed=5)
    il = seq.images_left[0]
    ir = seq.images_right[0]
    d_gt = float(seq.rig.left.fx) * float(seq.rig.baseline) / np.asarray(
        seq.depths_left[0]
    )
    feats = extract_orb(il, OrbConfig(n_features=256, n_levels=3))
    return il, ir, d_gt, feats


def test_sparse_disparity_accuracy_at_keypoints(scene):
    il, ir, d_gt, feats = scene
    disp, valid = sparse_disparity_at_keypoints(il, ir, feats.xy, CFG)
    disp = np.asarray(disp)
    valid = np.asarray(valid) & np.asarray(feats.valid)
    xy = np.asarray(feats.xy).astype(int)
    gt = d_gt[np.clip(xy[:, 1], 0, 159), np.clip(xy[:, 0], 0, 223)]
    in_range = (gt > 1.0) & (gt < 46.0)
    m = valid & in_range
    assert m.sum() > 80
    err = np.abs(disp[m] - gt[m])
    assert np.median(err) < 0.3, f"median {np.median(err)}"
    assert (err < 1.0).mean() > 0.85, f"bad rate {(err >= 1).mean()}"


def test_sparse_rejects_out_of_bounds(scene):
    il, ir, _, _ = scene
    xy = jnp.asarray([[1.0, 1.0], [222.0, 158.0], [2.0, 80.0], [100.0, 80.0]])
    disp, valid = sparse_disparity_at_keypoints(il, ir, xy, CFG)
    v = np.asarray(valid)
    assert not v[0] and not v[1] and not v[2]  # borders invalid


def test_stereo_pipeline_sparse_matches_dense_accuracy():
    from forest_slam_tpu.eval import ape_translation
    from forest_slam_tpu.io.tum import Trajectory
    from forest_slam_tpu.pipelines.stereo import StereoConfig, run_stereo_vo
    from forest_slam_tpu.stereo import SgmConfig

    seq = render_sequence(n_frames=15, height=160, width=224, seed=11, speed=0.25)
    gt = Trajectory.from_matrices(
        seq.timestamps, np.asarray(seq.T_world_cam, np.float64)
    )
    base = StereoConfig(
        orb=OrbConfig(n_features=384, n_levels=4),
        sgm=SgmConfig(num_disparities=48),
        sparse=SparseStereoConfig(num_disparities=48),
        n_hypotheses=512,
        compose_mode="odometry",
    )
    results = {}
    for name, dense in (("sparse", False), ("dense", True)):
        traj, outs = run_stereo_vo(
            seq.images_left, seq.images_right, seq.timestamps, seq.rig,
            base._replace(dense_depth=dense), seed=0,
        )
        ok = np.asarray(outs.ok)
        assert ok.mean() > 0.9, f"{name}: success {ok.mean()}"
        results[name] = ape_translation(traj, gt, align=True, with_scale=False).rmse
    # sparse path must be at least as accurate as dense within 1.5x
    assert results["sparse"] < max(1.5 * results["dense"], 0.05), results


def test_volume_cost_path_matches_gather(scene):
    """The dense-volume cost construction is arithmetically identical to
    the per-keypoint gather path (sparse.py _cost_rows_volume docstring)."""
    il, ir, d_gt, feats = scene
    dg, vg = sparse_disparity_at_keypoints(
        il, ir, feats.xy, CFG._replace(cost_path="gather")
    )
    dv, vv = sparse_disparity_at_keypoints(
        il, ir, feats.xy,
        CFG._replace(cost_path="volume", volume_dtype="float32"),
    )
    vg = np.asarray(vg)
    assert (vg == np.asarray(vv)).all()
    np.testing.assert_allclose(
        np.asarray(dg)[vg], np.asarray(dv)[vg], atol=1e-3
    )


def test_pallas_cost_path_matches_gather(scene):
    """The fused Pallas SAD kernel (stereo/pallas_sparse.py) reproduces the
    gather path exactly (interpret mode on CPU)."""
    il, ir, d_gt, feats = scene
    dg, vg = sparse_disparity_at_keypoints(
        il, ir, feats.xy, CFG._replace(cost_path="gather", num_disparities=96)
    )
    dp, vp = sparse_disparity_at_keypoints(
        il, ir, feats.xy,
        CFG._replace(cost_path="pallas_interpret", num_disparities=96),
    )
    vg = np.asarray(vg)
    assert (vg == np.asarray(vp)).all()
    np.testing.assert_allclose(
        np.asarray(dg)[vg], np.asarray(dp)[vg], atol=1e-3
    )
