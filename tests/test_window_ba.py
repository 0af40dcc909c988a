"""Sliding-window BA integration (BASELINE config 4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from forest_slam_tpu.backend import WindowBAConfig, refine_trajectory_ba
from forest_slam_tpu.backend.window import StereoArtifacts, _compose_tracks
from forest_slam_tpu.eval import ape_translation
from forest_slam_tpu.frontend import OrbConfig
from forest_slam_tpu.io.synthetic import render_sequence
from forest_slam_tpu.io.tum import Trajectory
from forest_slam_tpu.pipelines.stereo import StereoConfig, run_stereo_vo
from forest_slam_tpu.stereo import SgmConfig


def test_compose_tracks_follows_matches():
    M, K = 3, 4
    xy = jnp.arange(M * K * 2, dtype=jnp.float32).reshape(M, K, 2)
    valid = jnp.ones((M, K), bool)
    # frame0 kpt0 -> frame1 kpt2 -> frame2 kpt0; kpt1 dies after frame0
    matches = jnp.array([[2, -1, 0, 3], [3, 1, 0, -1]], jnp.int32)
    z = jnp.full((M, K), 5.0)
    z_ok = jnp.ones((M, K), bool)
    obs, mask, z_obs, z_mask = _compose_tracks(
        xy, valid, matches, z, z_ok, WindowBAConfig()
    )
    m = np.asarray(mask)
    o = np.asarray(obs)
    assert m[0].all()  # all anchors valid
    assert m[1, 0] and (o[1, 0] == np.asarray(xy[1, 2])).all()
    assert m[2, 0] and (o[2, 0] == np.asarray(xy[2, 0])).all()
    assert not m[1, 1]  # match -1 kills the track
    assert not m[2, 1]  # and it stays dead (monotone mask)


@pytest.mark.slow
def test_window_ba_beats_plain_vo():
    seq = render_sequence(n_frames=33, height=160, width=224, seed=7, speed=0.25)
    cfg = StereoConfig(
        orb=OrbConfig(n_features=256, n_levels=4),
        sgm=SgmConfig(num_disparities=48),
        n_hypotheses=512,
        compose_mode="odometry",
    )
    gt = Trajectory.from_matrices(
        seq.timestamps, np.asarray(seq.T_world_cam, np.float64)
    )
    vo, _ = run_stereo_vo(
        seq.images_left, seq.images_right, seq.timestamps, seq.rig, cfg
    )
    ba, _ = run_stereo_vo(
        seq.images_left, seq.images_right, seq.timestamps, seq.rig, cfg,
        ba=WindowBAConfig(window=4, iters=8),
    )
    ate_vo = ape_translation(vo, gt, align=True, with_scale=False).rmse
    ate_ba = ape_translation(ba, gt, align=True, with_scale=False).rmse
    # BA must not hurt, and on a drifting sequence it should help
    assert ate_ba < ate_vo * 1.05, (ate_vo, ate_ba)
    assert ate_ba < 0.03 * (0.25 * 32), (ate_vo, ate_ba)
