"""PnP-RANSAC with Gauss-Newton refinement, vmapped.

TPU-native replacement for the reference's stereo pose estimator
(``cv2.solvePnPRansac(..., reprojectionError=1.0, confidence=0.99,
iterationsCount=1000, flags=SOLVEPNP_ITERATIVE)``, stereo_slam.py:294-295):

- minimal solver: 6-point DLT for the projection matrix, orthogonalized to
  [R|t] — one batched 12x12 SVD per hypothesis instead of OpenCV's
  sequential refinement loop,
- scoring: full-pixel reprojection (including the distortion coefficients
  the reference passes even though its keypoints come from undistorted
  images — that double-correction is reproduced for parity; pass a
  zero-distortion camera for the corrected behavior),
- refinement: fixed-iteration Gauss-Newton on all inliers with an SE(3)
  twist parameterization via autodiff (the "ITERATIVE" part of OpenCV's
  flag), masked so shapes stay static.

Conventions match the reference's use: returned (R, t) map object-frame
points into the camera frame (x_cam = R X + t); stereo_slam.py:301-306 then
chains ``cumulative @ [R|t]``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from forest_slam_tpu.core.camera import PinholeCamera, project_points, undistort_points
from forest_slam_tpu.core.lie import se3_exp, se3_matrix
from forest_slam_tpu.geometry.ransac import ransac_sample_indices

_HI = jax.lax.Precision.HIGHEST


def _dlt_pnp(pts3d: jax.Array, xn: jax.Array) -> jax.Array:
    """Minimal 6-point DLT: object points (6, 3) + normalized image points
    (6, 2) -> (3, 4) pose [R|t] (orthogonalized)."""
    X, Y, Z = pts3d[:, 0], pts3d[:, 1], pts3d[:, 2]
    one = jnp.ones_like(X)
    zero = jnp.zeros_like(X)
    x, y = xn[:, 0], xn[:, 1]
    rows_x = jnp.stack(
        [X, Y, Z, one, zero, zero, zero, zero, -x * X, -x * Y, -x * Z, -x], axis=-1
    )
    rows_y = jnp.stack(
        [zero, zero, zero, zero, X, Y, Z, one, -y * X, -y * Y, -y * Z, -y], axis=-1
    )
    A = jnp.concatenate([rows_x, rows_y], axis=0)  # (12, 12)
    _, _, vt = jnp.linalg.svd(A)
    P = vt[-1].reshape(3, 4)
    M = P[:, :3]
    # orthogonalize: M = s * R with s recovered from singular values
    U, S, Vt = jnp.linalg.svd(M)
    R = U @ Vt
    detR = jnp.linalg.det(R)
    R = R * detR  # det +1 (flips all signs if improper; then t flips below)
    s = jnp.mean(S) * detR
    t = P[:, 3] / jnp.where(jnp.abs(s) < 1e-12, 1e-12, s)
    # cheirality on the minimal sample: majority of depths must be positive
    z = jnp.einsum("j,nj->n", R[2], pts3d, precision=_HI) + t[2]
    flip = jnp.sum(z > 0) < jnp.sum(z < 0)
    # [R|t] and [-R|-t]... flipping rotation sign breaks SO(3); instead flip
    # via 180-degree fix is not valid either — mark degenerate by keeping as
    # is; scoring will reject. (DLT sign is already resolved by det above.)
    del flip
    return jnp.concatenate([R, t[:, None]], axis=1)


class PnPResult(NamedTuple):
    R: jax.Array  # (3, 3)
    t: jax.Array  # (3,)
    inliers: jax.Array  # (N,) bool
    n_inliers: jax.Array  # () int32
    ok: jax.Array  # () bool — enough inliers to trust the pose


def _reproject_error(
    P: jax.Array, pts3d: jax.Array, pts2d: jax.Array, cam: PinholeCamera
) -> jax.Array:
    """Pixel reprojection distance of object points under pose (3, 4)."""
    pc = (
        jnp.einsum("ij,nj->ni", P[:, :3], pts3d, precision=_HI) + P[:, 3][None, :]
    )
    proj = project_points(pc, cam, with_distortion=True)
    return jnp.linalg.norm(proj - pts2d, axis=-1)


def _gauss_newton_refine(
    T0: jax.Array,
    pts3d: jax.Array,
    pts2d: jax.Array,
    valid: jax.Array,
    cam: PinholeCamera,
    threshold: float,
    iters: int = 8,
    anneal: float = 4.0,
    damping: float = 1e-6,
) -> jax.Array:
    """Gauss-Newton on reprojection error with annealed inlier re-gating.

    The gate starts at ``anneal * threshold`` and tightens to ``threshold``
    over the first half of the iterations, recomputed from the *current*
    pose each step — this pulls the full consensus set in from a mediocre
    minimal hypothesis instead of polishing only its (possibly small)
    initial inlier set. Same strategy as epipolar.refine_pose_sampson.
    """
    half = max(iters // 2, 1)

    def reproject(T):
        pc = (
            jnp.einsum("ij,nj->ni", T[:3, :3], pts3d, precision=_HI)
            + T[:3, 3][None, :]
        )
        return project_points(pc, cam, with_distortion=True)

    def step(T, i):
        frac = jnp.minimum(i.astype(jnp.float32) / half, 1.0)
        gate = threshold * (anneal * (1.0 - frac) + frac)
        err = jnp.linalg.norm(reproject(T) - pts2d, axis=-1)
        w = ((err < gate) & valid).astype(pts3d.dtype)

        def residual(xi):
            Tp = se3_exp(xi) @ T
            return ((reproject(Tp) - pts2d) * w[:, None]).reshape(-1)

        zero = jnp.zeros((6,), T.dtype)
        J = jax.jacfwd(residual)(zero)  # (2N, 6)
        r = residual(zero)
        H = J.T @ J + damping * jnp.eye(6, dtype=T.dtype)
        g = J.T @ r
        dx = -jnp.linalg.solve(H, g)
        # reject steps that are not finite (degenerate inlier sets)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
        return se3_exp(dx) @ T, None

    T, _ = jax.lax.scan(step, T0, jnp.arange(iters))
    return T


def solve_pnp_ransac(
    pts3d: jax.Array,
    pts2d: jax.Array,
    valid: jax.Array,
    cam: PinholeCamera,
    key: jax.Array,
    reproj_threshold: float = 1.0,
    n_hypotheses: int = 1024,
    min_inliers: int = 6,
    refine_iters: int = 8,
) -> PnPResult:
    """Robust PnP. ``pts2d`` are pixel observations; ``pts3d`` object points.

    Matches the reference call site semantics (reprojectionError=1.0,
    iterationsCount=1000 -> static 1024 hypothesis batch, ITERATIVE ->
    Gauss-Newton polish on the inlier set).
    """
    xn = undistort_points(pts2d, cam)  # normalized coords for the DLT
    idx = ransac_sample_indices(key, valid, n_hypotheses, 6)

    def solve(sample_idx):
        return _dlt_pnp(pts3d[sample_idx], xn[sample_idx])

    Ps = jax.vmap(solve)(idx)  # (H, 3, 4)
    errs = jax.vmap(lambda P: _reproject_error(P, pts3d, pts2d, cam))(Ps)
    inl = (errs < reproj_threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    P_best = Ps[best]
    inliers = inl[best]

    T0 = se3_matrix(P_best[:, :3], P_best[:, 3])
    T = _gauss_newton_refine(
        T0, pts3d, pts2d, valid, cam, reproj_threshold, iters=refine_iters
    )
    # re-evaluate inliers after refinement (OpenCV reports post-refine set)
    P_ref = T[:3, :]
    err_ref = _reproject_error(P_ref, pts3d, pts2d, cam)
    inl_ref = (err_ref < reproj_threshold) & valid
    better = jnp.sum(inl_ref) >= jnp.sum(inliers)
    P_fin = jnp.where(better, P_ref, P_best)
    inl_fin = jnp.where(better, inl_ref, inliers)
    n = jnp.sum(inl_fin)
    return PnPResult(
        R=P_fin[:, :3],
        t=P_fin[:, 3],
        inliers=inl_fin,
        n_inliers=n,
        ok=n >= min_inliers,
    )
