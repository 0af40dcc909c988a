"""Essential-matrix estimation and relative pose recovery, vmapped.

TPU-native replacement for the reference's monocular back-end
(``cv2.findEssentialMat`` RANSAC prob=0.999 threshold=1px +
``cv2.recoverPose``, mono_slam.py:111-112). Estimation runs in three dense,
fixed-shape stages (no adaptive loops — SURVEY.md §7.3 item 2):

1. **Hypotheses**: a static batch of normalized 8-point minimal solves
   (vs OpenCV's Nister 5-point — Groebner bases are hostile to batched TPU
   execution, while the 8-point nullspace is one small SVD), scored against
   all points with Sampson distance in one broadcast.
2. **Cheirality**: 4-way (R, t) decomposition of the best hypothesis with
   triangulation depth voting — the disambiguation ``recoverPose`` performs.
3. **Pose-space polish**: Gauss-Newton on the signed Sampson residual over
   the 5-dof (R, unit-t) manifold with annealed inlier gating. This replaces
   algebraic inlier refits, which are numerically treacherous: the consensus
   set of an overfit minimal model is near-degenerate for re-fitting E
   linearly (observed: refits *lose* inliers), while pose-space GN converges
   to sub-0.1 degree rotation error on the same data.

Everything operates in normalized camera coordinates; pixel thresholds are
converted by dividing by focal length, matching the scalar-focal call form
the reference uses.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from forest_slam_tpu.core.lie import so3_exp, so3_orthonormalize
from forest_slam_tpu.geometry.ransac import ransac_sample_indices

_HI = jax.lax.Precision.HIGHEST


def _epipolar_rows(x0: jax.Array, x1: jax.Array) -> jax.Array:
    """Rows of the linear system x1^T E x0 = 0. (..., 9)."""
    u0, v0 = x0[..., 0], x0[..., 1]
    u1, v1 = x1[..., 0], x1[..., 1]
    one = jnp.ones_like(u0)
    return jnp.stack(
        [u1 * u0, u1 * v0, u1, v1 * u0, v1 * v0, v1, u0, v0, one], axis=-1
    )


def _essential_from_nullspace(A: jax.Array) -> jax.Array:
    """A (k, 9) -> E (3, 3): smallest right singular vector, projected onto
    the essential manifold (singular values (s, s, 0))."""
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    E = vt[-1].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(E)
    s = (S[0] + S[1]) * 0.5
    D = jnp.diag(jnp.array([1.0, 1.0, 0.0]) * s)
    return jnp.matmul(jnp.matmul(U, D, precision=_HI), Vt, precision=_HI)


def essential_from_pose(R: jax.Array, t: jax.Array) -> jax.Array:
    """E = [t]x R (x1^T E x0 = 0 for x1 = R x0 + t)."""
    tx = jnp.array(
        [
            [0.0, -t[2], t[1]],
            [t[2], 0.0, -t[0]],
            [-t[1], t[0], 0.0],
        ]
    )
    return jnp.matmul(tx, R, precision=_HI)


def sampson_error(E: jax.Array, x0: jax.Array, x1: jax.Array) -> jax.Array:
    """Squared first-order geometric (Sampson) distance, normalized coords.

    x0, x1: (N, 2). Returns (N,) — the residual OpenCV's essential-matrix
    RANSAC thresholds (compare against threshold^2).
    """
    x0h = jnp.concatenate([x0, jnp.ones_like(x0[..., :1])], axis=-1)
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    Ex0 = jnp.einsum("ij,nj->ni", E, x0h, precision=_HI)
    Etx1 = jnp.einsum("ji,nj->ni", E, x1h, precision=_HI)
    num = jnp.einsum("ni,ni->n", x1h, Ex0, precision=_HI) ** 2
    den = Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def _signed_sampson(R: jax.Array, t: jax.Array, x0h: jax.Array, x1h: jax.Array):
    E = essential_from_pose(R, t)
    Ex0 = jnp.einsum("ij,nj->ni", E, x0h, precision=_HI)
    Etx1 = jnp.einsum("ji,nj->ni", E, x1h, precision=_HI)
    num = jnp.einsum("ni,ni->n", x1h, Ex0, precision=_HI)
    den = Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
    return num / jnp.sqrt(jnp.maximum(den, 1e-12))


class EssentialResult(NamedTuple):
    E: jax.Array  # (3, 3)
    inliers: jax.Array  # (N,) bool
    n_inliers: jax.Array  # () int32


def find_essential_ransac(
    x0: jax.Array,
    x1: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    threshold: float,
    n_hypotheses: int = 1024,
    minimal: str = "8pt",
) -> EssentialResult:
    """Essential-matrix RANSAC over a fixed hypothesis batch.

    Args:
        x0, x1: (N, 2) normalized camera coordinates.
        valid: (N,) mask.
        threshold: inlier gate on sqrt(Sampson) in normalized units
            (pixel_threshold / focal).
        minimal: "8pt" (linear nullspace — fast, needs non-planar scenes)
            or "5pt" (Nister — the reference's cv2.findEssentialMat
            semantics, mono_slam.py:111; survives planar-dominant scenes
            where the 8-point system is rank-deficient). The 5-point path
            yields up to 10 candidate models per sample; all are scored.
    """
    from forest_slam_tpu.geometry.pnp import nullspace_inverse_iteration

    thr2 = threshold * threshold
    if minimal == "5pt":
        from forest_slam_tpu.geometry.fivepoint import five_point_candidates

        idx = ransac_sample_indices(key, valid, n_hypotheses, 5)  # (H, 5)
        Es, cand_ok = jax.vmap(five_point_candidates)(x0[idx], x1[idx])
        Es = Es.reshape(-1, 3, 3)  # (H*10, 3, 3)
        cand_ok = cand_ok.reshape(-1)
        errs = jax.vmap(lambda E: sampson_error(E, x0, x1))(Es)
        inl = (errs < thr2) & valid[None, :] & cand_ok[:, None]
    else:
        idx = ransac_sample_indices(key, valid, n_hypotheses, 8)  # (H, 8)

        # Raw nullspace hypotheses (no essential-manifold projection): the
        # Sampson distance scores any fundamental-like 3x3, so the batched
        # 3x3 SVD projection per hypothesis is skipped; only the winner is
        # projected below. Nullspaces via Cholesky inverse iteration — ~6x
        # faster than batched SVD on TPU (pnp.nullspace_inverse_iteration).
        A = _epipolar_rows(x0[idx], x1[idx])  # (H, 8, 9)
        Es = nullspace_inverse_iteration(A, 9).reshape(-1, 3, 3)
        errs = jax.vmap(lambda E: sampson_error(E, x0, x1))(Es)  # (H, N)
        inl = (errs < thr2) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)

    # The raw winner is a fundamental-like 3x3 off the essential manifold
    # (inverse iteration's f32 floor); projecting it directly can destroy
    # the consensus. Instead refit on the winner's inlier rows with one
    # accurate (N, 9) SVD, then project — the consensus here is large
    # (best-of-H raw hypotheses), so the LS refit is well-posed, unlike
    # refitting a minimal-solve's narrow consensus (see module docstring).
    rows = _epipolar_rows(x0, x1)  # (N, 9)
    w = inl[best].astype(rows.dtype)[:, None]
    E_fit = _essential_from_nullspace(rows * w)
    err_b = sampson_error(E_fit, x0, x1)
    inl_b = (err_b < thr2) & valid
    if minimal == "5pt":
        # On the planar scenes the 5-point path exists for, the linear
        # refit is itself rank-deficient — keep the winning manifold-valid
        # candidate whenever the refit loses consensus.
        keep = jnp.sum(inl_b) >= counts[best]
        E_fit = jnp.where(keep, E_fit, Es[best])
        inl_b = jnp.where(keep, inl_b, inl[best])
    return EssentialResult(E=E_fit, inliers=inl_b, n_inliers=jnp.sum(inl_b))


class PoseResult(NamedTuple):
    R: jax.Array  # (3, 3)
    t: jax.Array  # (3,) unit norm
    n_cheirality: jax.Array  # () int32 points passing the depth test


def recover_pose(
    E: jax.Array, x0: jax.Array, x1: jax.Array, mask: jax.Array
) -> PoseResult:
    """Disambiguate the 4 (R, t) decompositions of E by cheirality voting —
    the semantics of ``cv2.recoverPose`` (mono_slam.py:112): returned (R, t)
    satisfy x1 = R @ x0 + t with |t| = 1 (scale is unobservable, reference
    quirk B6).
    """
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    mm = lambda a, b: jnp.matmul(a, b, precision=_HI)
    Ra = so3_orthonormalize(mm(mm(U, W), Vt))
    Rb = so3_orthonormalize(mm(mm(U, W.T), Vt))
    t = U[:, 2]
    candidates = [(Ra, t), (Ra, -t), (Rb, t), (Rb, -t)]

    x0h = jnp.concatenate([x0, jnp.ones_like(x0[..., :1])], axis=-1)
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)

    def score(Rt):
        # closed-form two-view depths (no per-point SVD triangulation):
        # x1h x z1 = R x0h z0 + t  =>  cross(x1h, R x0h) z0 = -cross(x1h, t)
        # solved in least squares; only the SIGNS matter for cheirality.
        R, tt = Rt
        Rx0 = jnp.einsum("ij,nj->ni", R, x0h, precision=_HI)
        c1 = jnp.cross(x1h, Rx0)
        c2 = jnp.cross(x1h, jnp.broadcast_to(tt, x1h.shape))
        z0 = -jnp.einsum("ni,ni->n", c1, c2, precision=_HI) / jnp.maximum(
            jnp.einsum("ni,ni->n", c1, c1, precision=_HI), 1e-12
        )
        z1 = Rx0[:, 2] * z0 + tt[2]
        ok = (z0 > 0) & (z1 > 0) & mask
        return jnp.sum(ok)

    scores = jnp.stack([score(c) for c in candidates])
    Rs = jnp.stack([c[0] for c in candidates])
    ts = jnp.stack([c[1] for c in candidates])
    best = jnp.argmax(scores)
    return PoseResult(R=Rs[best], t=ts[best], n_cheirality=scores[best])


def refine_pose_sampson(
    R: jax.Array,
    t: jax.Array,
    x0: jax.Array,
    x1: jax.Array,
    valid: jax.Array,
    threshold: float,
    iters: int = 8,
    anneal: float = 4.0,
    damping: float = 1e-10,
) -> tuple[jax.Array, jax.Array]:
    """Gauss-Newton polish of (R, unit t) on the signed Sampson residual.

    The inlier gate anneals from ``anneal * threshold^2`` down to
    ``threshold^2`` over the first half of the iterations, then stays tight —
    this reliably pulls in the full consensus set from a mediocre minimal
    hypothesis (see module docstring).
    """
    x0h = jnp.concatenate([x0, jnp.ones_like(x0[..., :1])], axis=-1)
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    thr2 = threshold * threshold
    half = max(iters // 2, 1)

    def step(carry, i):
        R, t = carry
        frac = jnp.minimum(i.astype(jnp.float32) / half, 1.0)
        gate2 = thr2 * (anneal * (1.0 - frac) + frac)
        e = _signed_sampson(R, t, x0h, x1h)
        w = ((e * e < gate2) & valid).astype(x0.dtype)

        def res(xi):
            Rp = jnp.matmul(so3_exp(xi[:3]), R, precision=_HI)
            tp = t + xi[3:]
            tp = tp / jnp.maximum(jnp.linalg.norm(tp), 1e-12)
            return _signed_sampson(Rp, tp, x0h, x1h) * w

        J = jax.jacfwd(res)(jnp.zeros((6,), x0.dtype))
        r = res(jnp.zeros((6,), x0.dtype))
        H = jnp.matmul(J.T, J, precision=_HI) + damping * jnp.eye(6, dtype=x0.dtype)
        dx = -jnp.linalg.solve(H, jnp.einsum("ni,n->i", J, r, precision=_HI))
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
        Rn = so3_orthonormalize(jnp.matmul(so3_exp(dx[:3]), R, precision=_HI))
        tn = t + dx[3:]
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), 1e-12)
        return (Rn, tn), None

    (R, t), _ = jax.lax.scan(step, (R, t), jnp.arange(iters))
    return R, t


class RelativePoseResult(NamedTuple):
    R: jax.Array  # (3, 3)
    t: jax.Array  # (3,) unit norm
    E: jax.Array  # (3, 3) from the refined pose
    inliers: jax.Array  # (N,) bool
    n_inliers: jax.Array  # () int32
    ok: jax.Array  # () bool


def estimate_relative_pose(
    x0: jax.Array,
    x1: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    threshold: float,
    n_hypotheses: int = 1024,
    refine_iters: int = 8,
    min_inliers: int = 8,
    minimal: str = "8pt",
) -> RelativePoseResult:
    """Full monocular two-view stack: E-RANSAC -> recoverPose -> GN polish.

    The one-call equivalent of the reference's
    findEssentialMat + recoverPose pair (mono_slam.py:111-112).
    """
    res = find_essential_ransac(
        x0, x1, valid, key, threshold, n_hypotheses, minimal=minimal
    )
    pose = recover_pose(res.E, x0, x1, res.inliers)
    R, t = refine_pose_sampson(
        pose.R, pose.t, x0, x1, valid, threshold, iters=refine_iters
    )
    E = essential_from_pose(R, t)
    err = sampson_error(E, x0, x1)
    inl = (err < threshold * threshold) & valid
    # guard: keep the polished pose only if it did not lose the consensus
    better = jnp.sum(inl) >= res.n_inliers
    R = jnp.where(better, R, pose.R)
    t = jnp.where(better, t, pose.t)
    E = jnp.where(better, E, res.E)
    inl = jnp.where(better, inl, res.inliers)
    n = jnp.sum(inl)
    return RelativePoseResult(R=R, t=t, E=E, inliers=inl, n_inliers=n, ok=n >= min_inliers)
