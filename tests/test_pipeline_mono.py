"""End-to-end monocular VO on a synthetic sequence with exact ground truth."""

import numpy as np
import pytest

from forest_slam_tpu.eval import ape_translation
from forest_slam_tpu.frontend import OrbConfig
from forest_slam_tpu.io.synthetic import render_sequence
from forest_slam_tpu.io.tum import Trajectory
from forest_slam_tpu.pipelines import MonoConfig, run_mono_vo

CFG = MonoConfig(
    orb=OrbConfig(n_features=384, n_levels=4),
    n_hypotheses=512,
    compose_mode="odometry",
)


@pytest.fixture(scope="module")
def seq():
    return render_sequence(n_frames=30, height=160, width=224, seed=3, speed=0.25)


def test_mono_vo_tracks_synthetic_gt(seq):
    traj, outs = run_mono_vo(
        seq.images_left, seq.timestamps, seq.rig.left, CFG, seed=0
    )
    assert len(traj) == 29
    ok = np.asarray(outs.ok)
    assert ok.mean() > 0.9, f"pose success rate {ok.mean()}"
    assert np.asarray(outs.n_inliers)[ok].min() >= 20

    gt = Trajectory.from_matrices(
        seq.timestamps, np.asarray(seq.T_world_cam, np.float64)
    )
    # mono scale is unobservable -> Sim(3)-aligned ATE (as the reference
    # evaluates, quirk B6). Path length is ~7.25m over 29 frames.
    stats = ape_translation(traj, gt, align=True, with_scale=True)
    path_len = 0.25 * 29
    assert stats.rmse < 0.05 * path_len, f"ATE {stats.rmse:.3f} m on {path_len} m path"


def test_mono_vo_parity_mode_runs(seq):
    cfg = CFG._replace(compose_mode="parity")
    traj, outs = run_mono_vo(
        seq.images_left[:8], seq.timestamps[:8], seq.rig.left, cfg, seed=0
    )
    assert len(traj) == 7
    assert np.asarray(outs.ok).mean() > 0.8
