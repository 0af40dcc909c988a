"""Bundle adjustment tests on synthetic multi-view problems."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from forest_slam_tpu.backend.ba import BAProblem, ba_solve
from forest_slam_tpu.core.camera import PinholeCamera, project_points


def make_problem(rng, M=6, P=120, pix_noise=0.3, pose_pert=0.02, point_pert=0.4,
                 drop=0.1):
    K = np.array([[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1]])
    cam = PinholeCamera.create(K, None, 640, 480)
    points_gt = rng.uniform([-4, -3, 8], [4, 3, 20], size=(P, 3))
    poses_gt = []
    for i in range(M):
        R = Rotation.from_rotvec(rng.normal(size=3) * 0.03).as_matrix()
        t = np.array([i * 0.4, 0, 0]) + rng.normal(size=3) * 0.1
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        poses_gt.append(T)
    poses_gt = np.stack(poses_gt)

    pc = np.einsum("mij,pj->mpi", poses_gt[:, :3, :3], points_gt) + poses_gt[:, None, :3, 3]
    obs = np.asarray(project_points(jnp.asarray(pc), cam, with_distortion=True))
    obs = obs + rng.normal(scale=pix_noise, size=obs.shape)
    in_img = (
        (obs[..., 0] > 0) & (obs[..., 0] < 640)
        & (obs[..., 1] > 0) & (obs[..., 1] < 480)
        & (pc[..., 2] > 0.5)
    )
    mask = in_img & (rng.random((M, P)) > drop)

    # perturb initial estimates
    poses_init = poses_gt.copy()
    for i in range(1, M):
        dR = Rotation.from_rotvec(rng.normal(size=3) * pose_pert).as_matrix()
        poses_init[i, :3, :3] = dR @ poses_init[i, :3, :3]
        poses_init[i, :3, 3] += rng.normal(size=3) * pose_pert * 5
    points_init = points_gt + rng.normal(size=points_gt.shape) * point_pert

    problem = BAProblem(
        poses=jnp.asarray(poses_init, jnp.float32),
        points=jnp.asarray(points_init, jnp.float32),
        observations=jnp.asarray(obs, jnp.float32),
        mask=jnp.asarray(mask),
        cam=cam,
    )
    return problem, poses_gt, points_gt


def pose_errors(poses, poses_gt):
    rot = []
    trans = []
    for T, G in zip(np.asarray(poses, np.float64), poses_gt):
        rot.append(np.degrees(np.linalg.norm(
            Rotation.from_matrix(T[:3, :3] @ G[:3, :3].T).as_rotvec())))
        trans.append(np.linalg.norm(T[:3, 3] - G[:3, 3]))
    return np.array(rot), np.array(trans)


def test_ba_reduces_cost_and_recovers_poses(rng):
    problem, poses_gt, points_gt = make_problem(rng)
    res = ba_solve(problem, iters=12)
    assert float(res.final_cost) < float(res.initial_cost) * 0.05

    rot0, tr0 = pose_errors(problem.poses, poses_gt)
    rot1, tr1 = pose_errors(res.poses, poses_gt)
    # first pose is the gauge anchor; others should improve substantially
    assert rot1[1:].mean() < rot0[1:].mean() * 0.3
    assert tr1[1:].mean() < tr0[1:].mean() * 0.3
    assert tr1[1:].max() < 0.06  # noise floor: 0.3px at f=500, 8-20m depths, f32

    # landmarks converge toward GT too
    d0 = np.linalg.norm(np.asarray(problem.points) - points_gt, axis=1)
    d1 = np.linalg.norm(np.asarray(res.points) - points_gt, axis=1)
    assert np.median(d1) < np.median(d0) * 0.5


def test_ba_gauge_fixed(rng):
    problem, poses_gt, _ = make_problem(rng)
    res = ba_solve(problem, iters=8)
    np.testing.assert_allclose(
        np.asarray(res.poses[0]), np.asarray(problem.poses[0]), atol=1e-4
    )


def test_ba_handles_unobserved_landmarks(rng):
    problem, _, _ = make_problem(rng)
    # kill all observations of some landmarks entirely
    mask = np.asarray(problem.mask).copy()
    mask[:, :10] = False
    problem = problem._replace(mask=jnp.asarray(mask))
    res = ba_solve(problem, iters=8)
    assert np.isfinite(float(res.final_cost))
    assert float(res.final_cost) < float(res.initial_cost)


def test_ba_pose_prior_pins_to_init(rng):
    """A dominant VO prior makes BA a no-regret no-op (poses stay put)."""
    problem, _, _ = make_problem(rng)
    res = ba_solve(problem._replace(pose_prior_weight=1e6), iters=8)
    np.testing.assert_allclose(
        np.asarray(res.poses), np.asarray(problem.poses), atol=1e-3
    )


def test_ba_moderate_prior_still_corrects(rng):
    """With a moderate prior, strong reprojection evidence from a
    perturbed init must still win over the pull toward it."""
    problem, poses_gt, _ = make_problem(rng)
    res = ba_solve(problem._replace(pose_prior_weight=10.0), iters=24)
    _, tr0 = pose_errors(problem.poses, poses_gt)
    _, tr1 = pose_errors(res.poses, poses_gt)
    # the prior biases the fixpoint toward the init (that is its job), but
    # strong reprojection evidence must still roughly halve the error
    assert tr1[1:].mean() < tr0[1:].mean() * 0.55


def test_ba_huber_resists_outlier_observations(rng):
    """Corrupt a slice of observations; Huber must keep pose recovery
    intact where the squared loss degrades."""
    # near-converged init (like VO handing a good trajectory to window BA):
    # inlier residuals sit at the noise floor so the Huber threshold can
    # separate them from the outliers
    problem, poses_gt, _ = make_problem(
        rng, pix_noise=0.1, pose_pert=0.002, point_pert=0.05
    )
    obs = np.asarray(problem.observations).copy()
    mask = np.asarray(problem.mask)
    # 10% wrong-match style outliers: shift by 8-20 px (inside any broad
    # gate, big enough to drag a squared loss)
    out = rng.random(mask.shape) < 0.10
    obs = obs + np.where(
        (out & mask)[..., None], rng.uniform(8, 20, obs.shape), 0.0
    )
    corrupted = problem._replace(observations=jnp.asarray(obs, jnp.float32))
    res_sq = ba_solve(corrupted, iters=12)
    res_hb = ba_solve(corrupted._replace(huber_px=1.0), iters=12)
    _, tr_sq = pose_errors(res_sq.poses, poses_gt)
    _, tr_hb = pose_errors(res_hb.poses, poses_gt)
    assert tr_hb[1:].mean() < tr_sq[1:].mean()
    assert tr_hb[1:].max() < 0.05
