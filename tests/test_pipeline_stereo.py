"""End-to-end stereo VO + mapping on a synthetic sequence with exact GT."""

import numpy as np
import pytest
import jax.numpy as jnp

from forest_slam_tpu.backend import accumulate_map
from forest_slam_tpu.eval import ape_translation
from forest_slam_tpu.frontend import OrbConfig
from forest_slam_tpu.io.synthetic import render_sequence
from forest_slam_tpu.io.tum import Trajectory
from forest_slam_tpu.pipelines.stereo import StereoConfig, run_stereo_vo
from forest_slam_tpu.stereo import SgmConfig

CFG = StereoConfig(
    orb=OrbConfig(n_features=384, n_levels=4),
    sgm=SgmConfig(num_disparities=48),
    n_hypotheses=512,
    compose_mode="odometry",
)


@pytest.fixture(scope="module")
def seq():
    return render_sequence(n_frames=25, height=160, width=224, seed=11, speed=0.25)


@pytest.fixture(scope="module")
def result(seq):
    return run_stereo_vo(
        seq.images_left, seq.images_right, seq.timestamps, seq.rig, CFG, seed=0
    )


def test_stereo_vo_metric_accuracy(seq, result):
    traj, outs = result
    assert len(traj) == 24
    ok = np.asarray(outs.ok)
    assert ok.mean() > 0.9, f"pose success rate {ok.mean()}"

    gt = Trajectory.from_matrices(
        seq.timestamps, np.asarray(seq.T_world_cam, np.float64)
    )
    # stereo observes metric scale -> SE(3) alignment (no scale correction)
    stats = ape_translation(traj, gt, align=True, with_scale=False)
    path_len = 0.25 * 24
    assert stats.rmse < 0.03 * path_len, f"ATE {stats.rmse:.3f} m on {path_len} m"

    # scale correctness: Sim(3) alignment should not find a large scale
    from forest_slam_tpu.eval.alignment import umeyama_alignment
    from forest_slam_tpu.eval.association import associate

    em, gm = associate(traj, gt)
    s, _, _ = umeyama_alignment(em.positions, gm.positions)
    assert abs(s - 1.0) < 0.05, f"scale error {s}"


def test_stereo_map_points_near_world_surfaces(seq, result):
    _, outs = result
    cloud = accumulate_map(
        np.asarray(outs.map_points), np.asarray(outs.map_valid), voxel_size=0.5
    )
    assert cloud.shape[0] > 100
    # corridor geometry: ground at y=1.5, walls at x=+-4 — every map point
    # should be near one of those surfaces (tolerance covers depth noise)
    d_ground = np.abs(cloud[:, 1] - 1.5)
    d_walls = np.abs(np.abs(cloud[:, 0]) - 4.0)
    near = np.minimum(d_ground, d_walls)
    assert np.median(near) < 0.3, f"median surface distance {np.median(near)}"
    assert (near < 1.0).mean() > 0.8


def test_stereo_parity_mode_runs(seq):
    cfg = CFG._replace(compose_mode="parity")
    traj, outs = run_stereo_vo(
        seq.images_left[:6],
        seq.images_right[:6],
        seq.timestamps[:6],
        seq.rig,
        cfg,
        seed=0,
    )
    assert len(traj) == 5
    assert np.asarray(outs.ok).mean() > 0.8


def test_photo_normalize_stack_cancels_exposure():
    """Ingest exposure compensation (round 5): frames differing only by
    gain/bias map to (nearly) the same normalized frame."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from forest_slam_tpu.pipelines.stereo import photo_normalize_stack

    key = jax.random.PRNGKey(0)
    base = jax.random.uniform(key, (1, 48, 64)) * 120.0 + 60.0
    shifted = jnp.clip(base * 1.3 - 20.0, 0.0, 255.0)
    out = np.asarray(photo_normalize_stack(jnp.concatenate([base, shifted])))
    assert abs(out[0].mean() - 127.0) < 1.0
    assert np.abs(out[0] - out[1]).mean() < 1.0
