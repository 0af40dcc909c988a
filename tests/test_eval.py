"""Property tests for association / alignment / metrics."""

import numpy as np
from scipy.spatial.transform import Rotation

from forest_slam_tpu.eval import (
    umeyama_alignment,
    associate,
    ape_translation,
    rpe_distance_ratio,
)
from forest_slam_tpu.io.tum import Trajectory


def make_traj(n, rng, t0=0.0, dt=0.1):
    pos = np.cumsum(rng.normal(size=(n, 3)) * 0.2, axis=0)
    quat = Rotation.random(n, random_state=42).as_quat()
    ts = t0 + np.arange(n) * dt
    return Trajectory(ts, pos, quat)


def test_umeyama_recovers_known_sim3(rng):
    src = rng.normal(size=(200, 3))
    R_true = Rotation.random(random_state=1).as_matrix()
    s_true, t_true = 2.5, np.array([1.0, -2.0, 3.0])
    dst = s_true * (R_true @ src.T).T + t_true
    s, R, t = umeyama_alignment(src, dst, with_scale=True)
    assert abs(s - s_true) < 1e-9
    np.testing.assert_allclose(R, R_true, atol=1e-9)
    np.testing.assert_allclose(t, t_true, atol=1e-9)


def test_umeyama_se3_mode_keeps_unit_scale(rng):
    src = rng.normal(size=(50, 3))
    dst = 3.0 * src + 1.0
    s, R, t = umeyama_alignment(src, dst, with_scale=False)
    assert s == 1.0
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)


def test_umeyama_reflection_guard(rng):
    # mirrored point set must still produce a proper rotation (det=+1)
    src = rng.normal(size=(100, 3))
    dst = src.copy()
    dst[:, 0] *= -1
    s, R, t = umeyama_alignment(src, dst)
    assert np.linalg.det(R) > 0


def test_associate_exact_and_tolerance(rng):
    a = make_traj(50, rng)
    # reference offset by 2ms: inside default 10ms tolerance
    b = Trajectory(a.timestamps + 0.002, a.positions + 1.0, a.quaternions)
    am, bm = associate(a, b)
    assert len(am) == 50
    # offset by 50ms: everything dropped
    c = Trajectory(a.timestamps + 0.05, a.positions, a.quaternions)
    am, cm = associate(a, c)
    assert len(am) == 0


def test_associate_duplicate_stamps(rng):
    a = make_traj(10, rng)
    dup = Trajectory(
        np.repeat(a.timestamps, 2),
        np.repeat(a.positions, 2, axis=0),
        np.repeat(a.quaternions, 2, axis=0),
    )
    dm, am = associate(dup, a)
    assert len(dm) == 20  # every duplicated row finds its reference


def test_ape_zero_for_sim3_related_trajectories(rng):
    a = make_traj(100, rng)
    R = Rotation.random(random_state=3).as_matrix()
    b = Trajectory(
        a.timestamps, 1.7 * (R @ a.positions.T).T + np.array([5, 6, 7]), a.quaternions
    )
    stats = ape_translation(b, a, align=True, with_scale=True)
    assert stats.rmse < 1e-9
    # SE(3)-only alignment cannot absorb the scale
    stats_se3 = ape_translation(b, a, align=True, with_scale=False)
    assert stats_se3.rmse > 0.1


def test_rpe_global_scale_absorbed_local_drift_detected(rng):
    # RPE is computed after Sim(3) alignment (matching the reference's evo
    # protocol): a GLOBAL scale error must be absorbed, while LOCALLY varying
    # scale drift must show up.
    n = 500
    ts = np.arange(n) * 0.1
    pos = np.zeros((n, 3))
    pos[:, 0] = np.arange(n) * 0.2  # 100 m path
    quat = np.tile([0, 0, 0, 1.0], (n, 1))
    ref = Trajectory(ts, pos, quat)

    est_global = Trajectory(ts, pos * 1.1, quat)
    stats = rpe_distance_ratio(est_global, ref, delta_m=20.0)
    # evo's pair rule drops the first partial segment: 100 m / 20 m delta
    # leaves 4 marks -> 3 consecutive pairs
    assert stats.n >= 3
    assert stats.rmse < 1e-6  # fully absorbed by alignment

    # locally varying scale: first half 1.0x, second half 1.4x
    scale = np.where(np.arange(n) < n // 2, 1.0, 1.4)
    pos_local = np.zeros((n, 3))
    pos_local[:, 0] = np.concatenate([[0.0], np.cumsum(0.2 * scale[1:])])
    est_local = Trajectory(ts, pos_local, quat)
    stats = rpe_distance_ratio(est_local, ref, delta_m=20.0)
    assert stats.rmse > 5.0  # drift visible despite alignment
