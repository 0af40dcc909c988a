"""Synthetic renderer sanity: geometry, depth, stereo consistency."""

import numpy as np
import jax.numpy as jnp

from forest_slam_tpu.io.synthetic import render_sequence, default_rig


def test_render_sequence_shapes_and_texture():
    seq = render_sequence(n_frames=4, height=96, width=128, seed=0)
    assert seq.images_left.shape == (4, 96, 128)
    assert seq.images_right.shape == (4, 96, 128)
    il = np.asarray(seq.images_left)
    assert il.min() >= 0 and il.max() <= 255
    assert il.std() > 20  # densely textured
    d = np.asarray(seq.depths_left)
    assert np.all(d[np.isfinite(d)] > 0)
    assert np.isfinite(d).mean() > 0.95  # corridor covers nearly all pixels


def test_stereo_disparity_consistency():
    """Right image at (x - disparity) should match left at x (exact world)."""
    seq = render_sequence(n_frames=2, height=96, width=128, seed=1)
    il = np.asarray(seq.images_left[0])
    ir = np.asarray(seq.images_right[0])
    d = np.asarray(seq.depths_left[0])
    f = float(seq.rig.left.fx)
    b = float(seq.rig.baseline)
    ys, xs = np.mgrid[20:76:7, 30:100:7]
    disp = f * b / d[ys, xs]
    # sample right image at x - disp (bilinear)
    xr = xs - disp
    ok = (xr >= 1) & (xr < 127)
    x0 = np.floor(xr).astype(int)
    fx_ = xr - x0
    vals = ir[ys, np.clip(x0, 0, 127)] * (1 - fx_) + ir[ys, np.clip(x0 + 1, 0, 127)] * fx_
    err = np.abs(vals - il[ys, xs])[ok]
    assert np.median(err) < 8.0  # sub-pixel resampling noise only


def test_trajectory_moves_forward():
    seq = render_sequence(n_frames=10, height=64, width=96, seed=2, speed=0.2)
    T = np.asarray(seq.T_world_cam)
    z = T[:, 2, 3]
    assert np.all(np.diff(z) > 0.15)
    # rotations are valid
    RtR = np.einsum("nij,nik->njk", T[:, :3, :3], T[:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (10, 1, 1)), atol=1e-5)


def test_forest_world_renders_with_occlusion():
    """Forest scene: trunks must occlude the backdrop (depth discontinuities
    of metres across silhouettes) and the image must be feature-rich."""
    import jax
    import jax.numpy as jnp

    from forest_slam_tpu.io.synthetic import (
        default_rig,
        make_forest_world,
        render_view,
    )

    H, W = 96, 128
    world = make_forest_world(jax.random.PRNGKey(0), n_trees=60,
                              z_range=(-5.0, 30.0))
    rig = default_rig(H, W)
    T = jnp.eye(4)
    img, depth = render_view(world, T, rig.left.K, H, W)
    img, depth = np.asarray(img), np.asarray(depth)
    assert np.isfinite(depth).all()  # canopy/walls/ground bound every ray
    assert img.std() > 20  # textured, not flat
    # depth discontinuities: some neighbouring pixels jump by > 1 m
    jumps = np.abs(np.diff(depth, axis=1))
    assert (jumps > 1.0).mean() > 0.005
    # trunks in view: some pixels closer than any wall/backdrop would allow
    assert (depth < 10.0).any()


def test_forest_sequence_stereo_vo_tracks():
    """Stereo VO stays locked on the forest scene (ORB, small frames)."""
    import jax

    from forest_slam_tpu.io.synthetic import render_sequence
    from forest_slam_tpu.pipelines.stereo import StereoConfig, run_stereo_vo
    from forest_slam_tpu.stereo import SgmConfig
    from forest_slam_tpu.eval import ape_translation
    from forest_slam_tpu.io.tum import Trajectory

    seq = render_sequence(8, height=160, width=224, seed=3, scene="forest")
    cfg = StereoConfig(sgm=SgmConfig(num_disparities=48),
                       compose_mode="odometry")
    traj, outs = run_stereo_vo(
        seq.images_left, seq.images_right, seq.timestamps, seq.rig, cfg
    )
    ok = np.asarray(outs.ok)
    assert ok.sum() >= 6, f"tracked {ok.sum()}/7"
    gt = Trajectory.from_matrices(seq.timestamps, np.asarray(seq.T_world_cam))
    stats = ape_translation(traj, gt, align=True, with_scale=False)
    assert stats.rmse < 0.10, stats.rmse
