"""Sliding-window bundle adjustment (Levenberg-Marquardt with Schur
complement), fully vectorized.

This goes beyond the reference — it has **no** bundle adjustment
(SURVEY.md §0) — and implements the build plan's config 4 (BASELINE.json):
joint refinement of a window of keyframe poses and their landmarks.

TPU-first structure: the problem is fixed-shape (M poses, P landmarks,
dense (M, P) observation grid with a validity mask). Per-observation 2x6 /
2x3 Jacobian blocks come from one vmapped ``jacfwd`` over a scalar
observation function; the normal equations are assembled blockwise with
einsums; the landmark block is eliminated analytically (Schur complement of
3x3 blocks, batched inverse) leaving a dense 6M x 6M pose system — tiny —
solved with Cholesky. A fixed number of LM iterations with accept/reject
damping adaptation keeps control flow static.

Conventions: poses are world->camera transforms ``T_cw`` (x_cam = T_cw @
x_world), matching the PnP output chain used by the pipelines.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from forest_slam_tpu.core.camera import PinholeCamera, project_points
from forest_slam_tpu.core.lie import se3_compose, se3_exp, se3_inverse, se3_log

_HI = jax.lax.Precision.HIGHEST


class BAProblem(NamedTuple):
    poses: jax.Array  # (M, 4, 4) T_cw
    points: jax.Array  # (P, 3) world
    observations: jax.Array  # (M, P, 2) pixels
    mask: jax.Array  # (M, P) bool
    cam: PinholeCamera
    # Optional stereo depth measurements: without them a window with only
    # its first pose gauge-fixed has a residual *scale* freedom (all
    # landmarks and translations can shrink about camera 0 without changing
    # any pixel residual), so pixel-only window BA can silently rescale a
    # stereo trajectory. A per-observation depth residual
    # ``depth_weight * (z_pred - z_meas) / z_meas`` anchors metric scale in
    # every frame. ``depths=None`` gives classical pixel-only BA.
    depths: jax.Array | None = None  # (M, P) measured z or None
    depth_mask: jax.Array | None = None  # (M, P) bool
    depth_weight: float = 25.0  # relative-depth -> pixel-equivalent scale
    # Prior pulling each pose toward its initial (VO) value: residual
    # ``pose_prior_weight * se3_log(T_cur @ inv(T_init))`` per pose. At the
    # clean-data noise floor the reprojection evidence cannot justify
    # moving a pose, so the prior pins the solution at VO (no-regret
    # refinement); under degraded VO the large reprojection residuals
    # dominate and BA still corrects. 0.0 = classical unregularized BA.
    pose_prior_weight: float = 0.0
    # Huber threshold (px) on the pixel-residual norm: observations beyond
    # it get IRLS weight huber_px/||r_px||, so mutual-NN mismatches that
    # survived the window's reprojection gate can't drag poses
    # quadratically. 0.0 = pure squared loss.
    huber_px: float = 0.0


class BAResult(NamedTuple):
    poses: jax.Array  # (M, 4, 4)
    points: jax.Array  # (P, 3)
    initial_cost: jax.Array
    final_cost: jax.Array


def _residual_one(xi, dX, T, X, obs, z_meas, has_z, w_z, cam):
    """(3,) residual [du, dv, w_z*(z - z_meas)/z_meas] for pose update xi
    (6,) and point update dX (3,); the depth row is zeroed when has_z=0."""
    Tp = se3_compose(se3_exp(xi), T)
    Xp = X + dX
    pc = jnp.einsum("ij,j->i", Tp[:3, :3], Xp, precision=_HI) + Tp[:3, 3]
    r_px = project_points(pc, cam, with_distortion=True) - obs  # (2,)
    r_z = w_z * (pc[2] - z_meas) / jnp.maximum(z_meas, 1e-6) * has_z
    return jnp.concatenate([r_px, r_z[None]])


def _huber_weight(r_norm, delta):
    """IRLS weight for the Huber loss: 1 inside delta, delta/||r|| outside.
    delta <= 0 disables (pure squared loss)."""
    w = jnp.minimum(1.0, delta / jnp.maximum(r_norm, 1e-9))
    return jnp.where(delta > 0, w, 1.0)


def _cost(
    poses, points, obs, mask, z, z_mask, w_z, cam, d_prior, w_p, delta
) -> jax.Array:
    pc = (
        jnp.einsum("mij,pj->mpi", poses[:, :3, :3], points, precision=_HI)
        + poses[:, None, :3, 3]
    )
    proj = project_points(pc, cam, with_distortion=True)
    r = proj - obs
    rn2 = jnp.sum(r * r, axis=-1)
    rn = jnp.sqrt(jnp.maximum(rn2, 1e-18))
    rho = jnp.where(
        (delta > 0) & (rn > delta), delta * (2.0 * rn - delta), rn2
    )
    c = jnp.sum(jnp.where(mask, rho, 0.0))
    rz = w_z * (pc[..., 2] - z) / jnp.maximum(z, 1e-6)
    c = c + jnp.sum(jnp.where(z_mask, rz * rz, 0.0))
    # pose prior: d_prior (M, 6) = se3_log(T_cur @ inv(T_init))
    return c + w_p * w_p * jnp.sum(d_prior * d_prior)


def _gauge_weights(M: int, fix_first: bool, dtype) -> jax.Array:
    """1e12 diagonal damping on the first pose pins the gauge."""
    w = jnp.zeros((M,), dtype)
    if fix_first:
        w = w.at[0].set(1e12)
    return w


def ba_solve(
    problem: BAProblem,
    iters: int = 10,
    init_lambda: float = 1e-3,
    fix_first: bool = True,
) -> BAResult:
    """Run LM. Returns refined poses/points and the masked SSE before/after."""
    poses0 = problem.poses
    points0 = problem.points
    obs = problem.observations
    mask = problem.mask
    cam = problem.cam
    M, P = mask.shape
    if problem.depths is None:
        z = jnp.ones((M, P), poses0.dtype)
        z_mask = jnp.zeros((M, P), bool)
    else:
        z = jnp.maximum(problem.depths, 1e-6)
        z_mask = problem.depth_mask & mask
    w_z = problem.depth_weight
    zf = z_mask.astype(poses0.dtype)
    maskf = mask.astype(poses0.dtype)
    gauge = _gauge_weights(M, fix_first, poses0.dtype)
    w_p = jnp.asarray(problem.pose_prior_weight, poses0.dtype)
    delta = jnp.asarray(problem.huber_px, poses0.dtype)
    inv_poses0 = jax.vmap(se3_inverse)(poses0)
    deviation = jax.vmap(lambda T, Ti: se3_log(se3_compose(T, Ti)))  # (M, 6) vs init

    zeros6 = jnp.zeros((6,), poses0.dtype)
    zeros3 = jnp.zeros((3,), poses0.dtype)

    def blocks(poses, points):
        """Per-observation residuals and Jacobian blocks.

        Returns r (M,P,3), Jp (M,P,3,6), Jx (M,P,3,3).
        """

        def per_obs(T, X, ob, zm, hz):
            f = lambda xi, dX: _residual_one(xi, dX, T, X, ob, zm, hz, w_z, cam)
            r = f(zeros6, zeros3)
            Jp = jax.jacfwd(f, argnums=0)(zeros6, zeros3)
            Jx = jax.jacfwd(f, argnums=1)(zeros6, zeros3)
            return r, Jp, Jx

        per_pose = jax.vmap(per_obs, in_axes=(None, 0, 0, 0, 0))  # over P
        return jax.vmap(per_pose, in_axes=(0, None, 0, 0, 0))(
            poses, points, obs, z, zf
        )

    def lm_step(state, _):
        poses, points, lam, cost = state
        r, Jp, Jx = blocks(poses, points)
        # IRLS Huber weight from the current pixel-residual norm, applied
        # to all three residual rows of the observation (a wrong match
        # corrupts its depth row too)
        rn = jnp.linalg.norm(r[..., :2], axis=-1)
        w = (maskf * jnp.sqrt(_huber_weight(rn, delta)))[..., None]
        rw = r * w
        Jp = Jp * w[..., None]
        Jx = Jx * w[..., None]

        # normal equation blocks
        Hpp = jnp.einsum("mpki,mpkj->mij", Jp, Jp, precision=_HI)  # (M,6,6)
        Hll = jnp.einsum("mpki,mpkj->pij", Jx, Jx, precision=_HI)  # (P,3,3)
        Hpl = jnp.einsum("mpki,mpkj->mpij", Jp, Jx, precision=_HI)  # (M,P,6,3)
        bp = -jnp.einsum("mpki,mpk->mi", Jp, rw, precision=_HI)  # (M,6)
        bl = -jnp.einsum("mpki,mpk->pi", Jx, rw, precision=_HI)  # (P,3)

        # pose prior: r_m(xi) = w_p * (d_m + xi) to first order, so the
        # prior adds w_p^2 I to each pose block and -w_p^2 d_m to bp
        d = deviation(poses, inv_poses0)  # (M, 6)
        Hpp = Hpp + (w_p * w_p) * jnp.eye(6, dtype=poses.dtype)
        bp = bp - (w_p * w_p) * d

        eye6 = jnp.eye(6, dtype=poses.dtype)
        eye3 = jnp.eye(3, dtype=poses.dtype)
        Hpp = Hpp + (lam + gauge)[:, None, None] * eye6
        Hll = Hll + lam * eye3
        Hll_inv = jnp.linalg.inv(Hll)  # (P,3,3) batched tiny inverses

        # Schur complement: S = Hpp_blockdiag - sum_p Hpl Hll^-1 Hpl^T
        # (cross-pose coupling comes only through landmarks)
        W = jnp.einsum("mpij,pjk->mpik", Hpl, Hll_inv, precision=_HI)  # (M,P,6,3)
        S_cross = jnp.einsum("mpik,npjk->mnij", W, Hpl, precision=_HI)  # (M,M,6,6)
        S = -S_cross
        S = S.at[jnp.arange(M), jnp.arange(M)].add(Hpp)
        rhs = bp - jnp.einsum("mpik,pk->mi", W, bl, precision=_HI)  # (M,6)

        S_flat = S.transpose(0, 2, 1, 3).reshape(6 * M, 6 * M)
        rhs_flat = rhs.reshape(6 * M)
        dxi = jnp.linalg.solve(S_flat, rhs_flat).reshape(M, 6)
        dX = jnp.einsum(
            "pij,pj->pi",
            Hll_inv,
            bl - jnp.einsum("mpij,mi->pj", Hpl, dxi, precision=_HI),
            precision=_HI,
        )

        poses_new = jax.vmap(lambda x, T: se3_compose(se3_exp(x), T))(dxi, poses)
        points_new = points + dX
        d_new = deviation(poses_new, inv_poses0)
        cost_new = _cost(
            poses_new, points_new, obs, mask, z, z_mask, w_z, cam,
            d_new, w_p, delta,
        )
        finite = jnp.isfinite(cost_new)
        accept = (cost_new < cost) & finite
        return (
            jnp.where(accept, poses_new, poses),
            jnp.where(accept, points_new, points),
            jnp.where(accept, lam * 0.3, lam * 4.0),
            jnp.where(accept, cost_new, cost),
        ), cost

    cost0 = _cost(
        poses0, points0, obs, mask, z, z_mask, w_z, cam,
        jnp.zeros((M, 6), poses0.dtype), w_p, delta,
    )
    init = (poses0, points0, jnp.asarray(init_lambda, poses0.dtype), cost0)
    (poses, points, _, cost), _ = jax.lax.scan(lm_step, init, None, length=iters)
    return BAResult(
        poses=poses, points=points, initial_cost=cost0, final_cost=cost
    )


ba_solve_jit = jax.jit(ba_solve, static_argnums=(1,))
