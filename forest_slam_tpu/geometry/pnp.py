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


def nullspace_inverse_iteration(
    A: jax.Array, dim: int, iters: int = 8, shift: float = 1e-6
) -> jax.Array:
    """Smallest right singular vector of batched A (..., k, dim) via
    Cholesky-factored inverse iteration on A^T A + shift*I.

    ~6x faster than batched ``jnp.linalg.svd`` on TPU for the small systems
    RANSAC minimal solvers produce (measured: 2.0 ms vs 13.2 ms for
    512 x 12x12), at ~1e-5 directional error — irrelevant for hypothesis
    scoring, and the winning hypothesis is refined downstream anyway.
    """
    AtA = jnp.einsum("...ij,...ik->...jk", A, A, precision=_HI)
    # scale-normalize so the shift is meaningful across problem scales
    scale = jnp.maximum(
        jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None] / dim, 1e-12
    )
    B = AtA / scale + shift * jnp.eye(dim, dtype=A.dtype)
    cho = jax.scipy.linalg.cho_factor(B)
    v = jnp.ones(A.shape[:-2] + (dim,), A.dtype)

    def body(v, _):
        v = jax.scipy.linalg.cho_solve(cho, v[..., None])[..., 0]
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        return v, None

    v, _ = jax.lax.scan(body, v, None, length=iters)
    return v


def _dlt_rows(pts3d: jax.Array, xn: jax.Array) -> jax.Array:
    """DLT system rows: (N, 3)+(N, 2) -> (2N, 12)."""
    X, Y, Z = pts3d[..., 0], pts3d[..., 1], pts3d[..., 2]
    one = jnp.ones_like(X)
    zero = jnp.zeros_like(X)
    x, y = xn[..., 0], xn[..., 1]
    rows_x = jnp.stack(
        [X, Y, Z, one, zero, zero, zero, zero, -x * X, -x * Y, -x * Z, -x], axis=-1
    )
    rows_y = jnp.stack(
        [zero, zero, zero, zero, X, Y, Z, one, -y * X, -y * Y, -y * Z, -y], axis=-1
    )
    return jnp.concatenate([rows_x, rows_y], axis=-2)


def _dlt_pnp_raw(pts3d: jax.Array, xn: jax.Array) -> jax.Array:
    """Minimal 6-point DLT -> RAW (3, 4) projection [M|t] (un-orthogonalized,
    arbitrary scale/sign).

    Hypothesis scoring does not need a valid rotation: the pinhole +
    distortion projection is invariant to the scale AND global sign of P
    (xn = pc[:2]/pc[2]), so per-hypothesis orthogonalization — the batched
    SVDs that dominated PnP runtime — is skipped entirely; only the winning
    hypothesis is orthogonalized (once) in :func:`orthogonalize_pose`.
    """
    A = _dlt_rows(pts3d, xn)  # (12, 12)
    return nullspace_inverse_iteration(A, 12).reshape(3, 4)


def orthogonalize_pose(P: jax.Array, pts3d: jax.Array, valid: jax.Array) -> jax.Array:
    """Raw DLT (3, 4) -> rigid [R|t] with majority-positive depths."""
    M = P[:, :3]
    U, S, Vt = jnp.linalg.svd(M)
    R = U @ Vt
    detR = jnp.linalg.det(R)
    R = R * detR
    s = jnp.mean(S) * detR
    t = P[:, 3] / jnp.where(jnp.abs(s) < 1e-12, 1e-12, s)
    # global sign is unobservable from reprojection; resolve by cheirality
    z = jnp.einsum("j,nj->n", R[2], pts3d, precision=_HI) + t[2]
    npos = jnp.sum((z > 0) & valid)
    nneg = jnp.sum((z < 0) & valid)
    flip = nneg > npos
    # [R|t] -> [-R|-t] is improper; the valid sign flip is P -> -P before
    # orthogonalization, equivalent to R' = R rotated by pi about the
    # plane... in practice: redo with -M. Cheap closed form: negating both
    # U's last column sign choice is messy — just recompute from -P.
    M2 = -M
    U2, S2, Vt2 = jnp.linalg.svd(M2)
    R2 = U2 @ Vt2
    det2 = jnp.linalg.det(R2)
    R2 = R2 * det2
    s2 = jnp.mean(S2) * det2
    t2 = -P[:, 3] / jnp.where(jnp.abs(s2) < 1e-12, 1e-12, s2)
    R = jnp.where(flip, R2, R)
    t = jnp.where(flip, t2, t)
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
    n_starts: int = 3,
    identity_prior_anneal: float = 48.0,
) -> PnPResult:
    """Robust PnP. ``pts2d`` are pixel observations; ``pts3d`` object points.

    Matches the reference call site semantics (reprojectionError=1.0,
    iterationsCount=1000 -> static 1024 hypothesis batch, ITERATIVE ->
    Gauss-Newton polish on the inlier set), with two extra robustness
    layers:

    - the ``n_starts`` best-scoring hypotheses are each GN-refined and the
      one with the largest final consensus (ties broken by lower mean
      inlier residual) wins — a single annealed refine can settle into a
      local optimum when the top hypothesis carries a biased minimal
      sample;
    - one additional GN start from the IDENTITY pose with a wide annealed
      gate (``identity_prior_anneal * reproj_threshold`` px): the 6-point
      DLT degenerates when the scene is coplanar (e.g. a VO frame looking
      straight at one wall during an in-place turn — measured 0 inliers
      from ~180 good matches), while small-motion frames converge fine
      from the constant-position prior. Set ``identity_prior_anneal=0`` to
      disable.
    """
    xn = undistort_points(pts2d, cam)  # normalized coords for the DLT
    idx = ransac_sample_indices(key, valid, n_hypotheses, 6)

    # raw (un-orthogonalized) hypotheses: scoring is scale/sign-invariant
    A = _dlt_rows(pts3d[idx], xn[idx])  # (H, 12, 12)
    Ps = nullspace_inverse_iteration(A, 12).reshape(-1, 3, 4)
    errs = jax.vmap(lambda P: _reproject_error(P, pts3d, pts2d, cam))(Ps)
    inl = (errs < reproj_threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=1)

    k = min(max(n_starts, 1), n_hypotheses)
    _, top_idx = jax.lax.top_k(counts, k)
    P_tops = jax.vmap(
        lambda i: orthogonalize_pose(Ps[i], pts3d, inl[i])
    )(top_idx)
    T0s = jax.vmap(lambda P: se3_matrix(P[:, :3], P[:, 3]))(P_tops)
    Ts = jax.vmap(
        lambda T0: _gauss_newton_refine(
            T0, pts3d, pts2d, valid, cam, reproj_threshold, iters=refine_iters
        )
    )(T0s)

    # candidates: the k refined poses + the best unrefined one (fallback if
    # refinement diverges); score = inliers, ties -> lower mean residual
    cands = [Ts[:, :3, :], P_tops[:1]]
    if identity_prior_anneal > 0:
        T_pr = _gauss_newton_refine(
            jnp.eye(4, dtype=pts3d.dtype), pts3d, pts2d, valid, cam,
            reproj_threshold, iters=refine_iters,
            anneal=identity_prior_anneal,
        )
        cands.append(T_pr[None, :3, :])
    P_cands = jnp.concatenate(cands, axis=0)
    err_c = jax.vmap(lambda P: _reproject_error(P, pts3d, pts2d, cam))(P_cands)
    inl_c = (err_c < reproj_threshold) & valid[None, :]
    cnt_c = jnp.sum(inl_c, axis=1)
    mean_err = jnp.sum(err_c * inl_c, axis=1) / jnp.maximum(cnt_c, 1)
    score = cnt_c.astype(jnp.float32) + jnp.clip(
        1.0 - mean_err / reproj_threshold, 0.0, 1.0
    )
    b = jnp.argmax(score)
    P_fin = P_cands[b]
    inl_fin = inl_c[b]
    n = cnt_c[b]
    return PnPResult(
        R=P_fin[:, :3],
        t=P_fin[:, 3],
        inliers=inl_fin,
        n_inliers=n,
        ok=n >= min_inliers,
    )
