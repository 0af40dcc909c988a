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
from forest_slam_tpu.core.lie import se3_exp

_HI = jax.lax.Precision.HIGHEST


class BAProblem(NamedTuple):
    poses: jax.Array  # (M, 4, 4) T_cw
    points: jax.Array  # (P, 3) world
    observations: jax.Array  # (M, P, 2) pixels
    mask: jax.Array  # (M, P) bool
    cam: PinholeCamera


class BAResult(NamedTuple):
    poses: jax.Array  # (M, 4, 4)
    points: jax.Array  # (P, 3)
    initial_cost: jax.Array
    final_cost: jax.Array


def _residual_one(xi, dX, T, X, obs, cam):
    """Observation residual for pose update xi (6,) and point update dX (3,)."""
    Tp = se3_exp(xi) @ T
    Xp = X + dX
    pc = Tp[:3, :3] @ Xp + Tp[:3, 3]
    return project_points(pc, cam, with_distortion=True) - obs  # (2,)


def _cost(poses, points, obs, mask, cam) -> jax.Array:
    pc = (
        jnp.einsum("mij,pj->mpi", poses[:, :3, :3], points, precision=_HI)
        + poses[:, None, :3, 3]
    )
    proj = project_points(pc, cam, with_distortion=True)
    r = proj - obs
    return jnp.sum(jnp.where(mask[..., None], r * r, 0.0))


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
    poses0, points0, obs, mask, cam = problem
    M, P = mask.shape
    maskf = mask.astype(poses0.dtype)
    gauge = _gauge_weights(M, fix_first, poses0.dtype)

    zeros6 = jnp.zeros((6,), poses0.dtype)
    zeros3 = jnp.zeros((3,), poses0.dtype)

    def blocks(poses, points):
        """Per-observation residuals and Jacobian blocks.

        Returns r (M,P,2), Jp (M,P,2,6), Jx (M,P,2,3).
        """

        def per_obs(T, X, ob):
            f = lambda xi, dX: _residual_one(xi, dX, T, X, ob, cam)
            r = f(zeros6, zeros3)
            Jp = jax.jacfwd(f, argnums=0)(zeros6, zeros3)
            Jx = jax.jacfwd(f, argnums=1)(zeros6, zeros3)
            return r, Jp, Jx

        per_pose = jax.vmap(per_obs, in_axes=(None, 0, 0))  # over P
        return jax.vmap(per_pose, in_axes=(0, None, 0))(poses, points, obs)

    def lm_step(state, _):
        poses, points, lam, cost = state
        r, Jp, Jx = blocks(poses, points)
        w = maskf[..., None]
        rw = r * w
        Jp = Jp * w[..., None]
        Jx = Jx * w[..., None]

        # normal equation blocks
        Hpp = jnp.einsum("mpki,mpkj->mij", Jp, Jp, precision=_HI)  # (M,6,6)
        Hll = jnp.einsum("mpki,mpkj->pij", Jx, Jx, precision=_HI)  # (P,3,3)
        Hpl = jnp.einsum("mpki,mpkj->mpij", Jp, Jx, precision=_HI)  # (M,P,6,3)
        bp = -jnp.einsum("mpki,mpk->mi", Jp, rw, precision=_HI)  # (M,6)
        bl = -jnp.einsum("mpki,mpk->pi", Jx, rw, precision=_HI)  # (P,3)

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

        poses_new = jax.vmap(lambda x, T: se3_exp(x) @ T)(dxi, poses)
        points_new = points + dX
        cost_new = _cost(poses_new, points_new, obs, mask, cam)
        finite = jnp.isfinite(cost_new)
        accept = (cost_new < cost) & finite
        return (
            jnp.where(accept, poses_new, poses),
            jnp.where(accept, points_new, points),
            jnp.where(accept, lam * 0.3, lam * 4.0),
            jnp.where(accept, cost_new, cost),
        ), cost

    cost0 = _cost(poses0, points0, obs, mask, cam)
    init = (poses0, points0, jnp.asarray(init_lambda, poses0.dtype), cost0)
    (poses, points, _, cost), _ = jax.lax.scan(lm_step, init, None, length=iters)
    return BAResult(
        poses=poses, points=points, initial_cost=cost0, final_cost=cost
    )


ba_solve_jit = jax.jit(ba_solve, static_argnums=(1,))
