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
from forest_slam_tpu.core.lie import (
    se3_compose,
    se3_exp,
    se3_matrix,
    so3_orthonormalize,
)
from forest_slam_tpu.geometry.ransac import ransac_sample_indices

_HI = jax.lax.Precision.HIGHEST


def _spd_inverse_unrolled(B: jax.Array) -> jax.Array:
    """Batched SPD inverse of (..., n, n) via a statically-unrolled
    Cholesky + unrolled lower-triangular inversion (n <= ~16).

    XLA's LAPACK-style ``cho_factor``/``cho_solve`` serialize over the
    matrix dimension with batched-unfriendly dynamic control flow; for the
    tiny SPD systems RANSAC minimal solvers produce (n = 12, batch ~1e3)
    an unrolled factorization is pure elementwise/VPU work over the batch.

    Both triangles are assembled COLUMN-WISE in python lists and stacked
    once at the end. The earlier formulation updated full (..., n, n)
    matrices with ``.at[].set`` per column — each update copies the whole
    operand, and at RANSAC batch shapes those copies were the single
    largest byte bill in PnP (measured ~100 MB/pair of XLA-counted
    traffic, scripts/probe_pnp_bytes.py). Column lists keep every
    intermediate at (..., n) and cut the solve to arithmetic-only traffic.
    """
    n = B.shape[-1]
    iota = jnp.arange(n)
    zero_vec = jnp.zeros(B.shape[:-2] + (n,), B.dtype)
    # Cholesky: cols[j][..., i] = L[i, j] (zeros above the diagonal)
    cols: list[jax.Array] = []
    for j in range(n):
        rowj = [cols[k][..., j] for k in range(j)]  # L[j, k], k < j
        d = B[..., j, j]
        for r in rowj:
            d = d - r * r
        d = jnp.sqrt(jnp.maximum(d, 1e-30))
        colv = B[..., :, j]
        for k in range(j):
            colv = colv - cols[k] * rowj[k][..., None]
        colv = colv / d[..., None]
        cols.append(
            jnp.where(
                iota == j, d[..., None], jnp.where(iota > j, colv, 0.0)
            )
        )
    # inverse of L column-by-column: forward substitution on basis vectors;
    # L[i, k] = cols[k][..., i], diag L[i, i] = cols[i][..., i]
    zero_s = zero_vec[..., 0]
    Li_cols: list[jax.Array] = []
    for j in range(n):
        xs: list[jax.Array | None] = [None] * n
        for i in range(j, n):
            acc = None
            for k in range(j, i):
                term = cols[k][..., i] * xs[k]
                acc = term if acc is None else acc + term
            num = -acc if acc is not None else None
            if i == j:
                num = 1.0 + num if num is not None else 1.0 + zero_s
            xs[i] = num / cols[i][..., i]
        col = jnp.stack(
            [xs[i] if xs[i] is not None else zero_s for i in range(n)],
            axis=-1,
        )
        Li_cols.append(col)
    Li = jnp.stack(Li_cols, axis=-1)  # (..., n, n), lower triangular
    return jnp.einsum("...ki,...kj->...ij", Li, Li, precision=_HI)


def nullspace_inverse_iteration(
    A: jax.Array, dim: int, iters: int = 8, shift: float = 1e-6,
    method: str = "unrolled",
) -> jax.Array:
    """Smallest right singular vector of batched A (..., k, dim) via
    inverse iteration on A^T A + shift*I.

    ~6x faster than batched ``jnp.linalg.svd`` on TPU for the small systems
    RANSAC minimal solvers produce (measured: 2.0 ms vs 13.2 ms for
    512 x 12x12 with the cho_factor path), at ~1e-5 directional error —
    irrelevant for hypothesis scoring, and the winning hypothesis is
    refined downstream anyway.

    ``method="unrolled"`` (default) inverts the SPD system once with the
    statically-unrolled batched Cholesky (:func:`_spd_inverse_unrolled`)
    so every iteration is a single batched matvec; ``method="cho"`` keeps
    the LAPACK-style ``cho_factor`` + per-iteration ``cho_solve``.
    """
    AtA = jnp.einsum("...ij,...ik->...jk", A, A, precision=_HI)
    # scale-normalize so the shift is meaningful across problem scales
    scale = jnp.maximum(
        jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None] / dim, 1e-12
    )
    B = AtA / scale + shift * jnp.eye(dim, dtype=A.dtype)
    v = jnp.ones(A.shape[:-2] + (dim,), A.dtype)

    if method == "unrolled":
        Binv = _spd_inverse_unrolled(B)

        def body(v, _):
            v = jnp.einsum("...ij,...j->...i", Binv, v, precision=_HI)
            v = v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12
            )
            return v, None

    else:
        cho = jax.scipy.linalg.cho_factor(B)

        def body(v, _):
            v = jax.scipy.linalg.cho_solve(cho, v[..., None])[..., 0]
            v = v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12
            )
            return v, None

    v, _ = jax.lax.scan(body, v, None, length=iters)
    return v


def _gather_rows(data: jax.Array, idx: jax.Array) -> jax.Array:
    """(N, C) f32 gathered at (H, S) int32 -> (H, S, C), as one-hot MXU
    contractions instead of an XLA gather.

    Under the pipelines' pair-vmap, XLA lowers the advanced-indexing
    gather of RANSAC minimal samples to ~50 MB/pair of HBM traffic
    (measured: 2.5 GB per 48-pair chunk for a (1024, 6) x (1024, 5)
    gather, scripts/probe_pnp_bytes.py). The same selection as a one-hot
    matmul is MXU work on a ~13 MB bf16 operand (~0.02 GB/chunk). The
    hi/lo bf16 split keeps the result exact to ~2^-16 relative (bf16
    truncation of the residual), far below any geometric tolerance
    downstream.
    """
    N = data.shape[0]
    onehot = (idx[..., None] == jnp.arange(N)).astype(jnp.bfloat16)
    hi = data.astype(jnp.bfloat16)
    lo = (data - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jnp.einsum(
        "hsn,nc->hsc", onehot, hi, preferred_element_type=jnp.float32
    )
    out = out + jnp.einsum(
        "hsn,nc->hsc", onehot, lo, preferred_element_type=jnp.float32
    )
    return out


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
    R = jnp.matmul(U, Vt, precision=_HI)
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
    R2 = jnp.matmul(U2, Vt2, precision=_HI)
    det2 = jnp.linalg.det(R2)
    R2 = R2 * det2
    s2 = jnp.mean(S2) * det2
    t2 = -P[:, 3] / jnp.where(jnp.abs(s2) < 1e-12, 1e-12, s2)
    R = jnp.where(flip, R2, R)
    t = jnp.where(flip, t2, t)
    return jnp.concatenate([R, t[:, None]], axis=1)


def _solve_quartic(c4, c3, c2, c1, c0):
    """All four (complex64) roots of batched quartics via Ferrari's closed
    form. Inputs (...,) -> roots (..., 4).

    Elementwise complex arithmetic only — no per-root eigendecompositions,
    so the whole RANSAC hypothesis batch solves in one fused VPU pass.
    f32-precision roots are polished by the caller (Newton) before use.
    """
    c4 = jnp.where(jnp.abs(c4) < 1e-12, 1e-12, c4)
    a3, a2, a1, a0 = (c.astype(jnp.complex64) / c4 for c in (c3, c2, c1, c0))
    # depressed quartic y^4 + p y^2 + q y + r, x = y - a3/4
    p = a2 - 3 * a3 * a3 / 8
    q = a1 - a3 * a2 / 2 + a3 * a3 * a3 / 8
    r = a0 - a3 * a1 / 4 + a3 * a3 * a2 / 16 - 3 * a3**4 / 256
    # resolvent cubic z^3 - p z^2 - 4 r z + (4 p r - q^2) = 0; one root via
    # Cardano (any root yields a valid factorization)
    b, c_, d = -p, -4 * r, 4 * p * r - q * q
    t_shift = b / 3
    cp = c_ - b * b / 3
    cq = d - b * c_ / 3 + 2 * b**3 / 27
    disc = jnp.sqrt((cq / 2) ** 2 + (cp / 3) ** 3)
    # pick the larger-magnitude cube-root argument for numerical stability
    u1 = -cq / 2 + disc
    u2 = -cq / 2 - disc
    ua = jnp.where(jnp.abs(u1) > jnp.abs(u2), u1, u2)
    cbrt = jnp.where(
        jnp.abs(ua) < 1e-30, 0.0, jnp.exp(jnp.log(ua + 0j) / 3)
    )
    z = jnp.where(
        jnp.abs(cbrt) < 1e-30, 0.0, cbrt - cp / (3 * jnp.where(jnp.abs(cbrt) < 1e-30, 1.0, cbrt))
    ) - t_shift
    # factor into two quadratics: y^2 -+ w y + (z/2 +- q/(2w))
    w = jnp.sqrt(z - p)
    w_ok = jnp.abs(w) > 1e-6
    ws = jnp.where(w_ok, w, 1.0)
    # w ~ 0 -> biquadratic y^4 + p y^2 + r: fall back to that closed form
    e1 = jnp.where(w_ok, z / 2 - q / (2 * ws), (-p + jnp.sqrt(p * p - 4 * r)) / 2)
    e2 = jnp.where(w_ok, z / 2 + q / (2 * ws), (-p - jnp.sqrt(p * p - 4 * r)) / 2)
    wq = jnp.where(w_ok, w, 0.0)
    # quartic = (y^2 + w y + e1)(y^2 - w y + e2)
    d1 = jnp.sqrt(wq * wq - 4 * e1)
    d2 = jnp.sqrt(wq * wq - 4 * e2)
    y = jnp.stack(
        [(-wq + d1) / 2, (-wq - d1) / 2, (wq + d2) / 2, (wq - d2) / 2],
        axis=-1,
    )
    return y - a3[..., None] / 4


def _p3p_grunert(pts3d: jax.Array, f: jax.Array) -> jax.Array:
    """Grunert's P3P: (3, 3) world points + (3, 3) unit bearings -> (4, 3, 4)
    candidate rigid [R|t] poses (x_cam = R X + t), NaN-filled rows for
    complex/degenerate roots (they score zero inliers downstream).

    Minimal-sample size 3 instead of the DLT's 6 is the decisive RANSAC
    lever at wide-baseline inlier rates: a clean hypothesis needs p^3 draws
    instead of p^6 (~30x more clean hypotheses at p = 0.3). Quartic
    coefficients derived symbolically (resultant of the two Grunert
    quadrics, common factor aa^2 removed); roots polished by two Newton
    steps to recover f32 accuracy.
    """
    P1, P2, P3 = pts3d[0], pts3d[1], pts3d[2]
    aa = jnp.sum((P2 - P3) ** 2)
    bb = jnp.sum((P1 - P3) ** 2)
    cc = jnp.sum((P1 - P2) ** 2)
    # the quartic coefficients are homogeneous degree 2 in (aa, bb, cc):
    # normalize to ~1 so their f32 cancellations happen at eps, not eps *
    # (scene scale)^4
    dscale = jnp.maximum((aa + bb + cc) / 3, 1e-12)
    aa, bb, cc = aa / dscale, bb / dscale, cc / dscale
    ca = jnp.dot(f[1], f[2])  # cos angle opposite side a
    cb = jnp.dot(f[0], f[2])
    cg = jnp.dot(f[0], f[1])

    A4 = aa**2 - 2*aa*bb - 2*aa*cc + bb**2 - 4*bb*ca**2*cc + 2*bb*cc + cc**2
    A3 = (-4*aa**2*cb + 4*aa*bb*ca*cg + 4*aa*bb*cb + 8*aa*cb*cc
          - 4*bb**2*ca*cg + 8*bb*ca**2*cb*cc + 4*bb*ca*cc*cg - 4*bb*cb*cc
          - 4*cb*cc**2)
    A2 = (4*aa**2*cb**2 + 2*aa**2 - 8*aa*bb*ca*cb*cg - 4*aa*bb*cg**2
          - 8*aa*cb**2*cc - 4*aa*cc + 4*bb**2*ca**2 + 4*bb**2*cg**2
          - 2*bb**2 - 4*bb*ca**2*cc - 8*bb*ca*cb*cc*cg + 4*cb**2*cc**2
          + 2*cc**2)
    A1 = (-4*aa**2*cb + 4*aa*bb*ca*cg + 8*aa*bb*cb*cg**2 - 4*aa*bb*cb
          + 8*aa*cb*cc - 4*bb**2*ca*cg + 4*bb*ca*cc*cg + 4*bb*cb*cc
          - 4*cb*cc**2)
    A0 = aa**2 - 4*aa*bb*cg**2 + 2*aa*bb - 2*aa*cc + bb**2 - 2*bb*cc + cc**2

    roots = _solve_quartic(A4, A3, A2, A1, A0)  # (4,) complex
    near_real = jnp.abs(roots.imag) < 1e-3 * (1.0 + jnp.abs(roots.real))
    v = roots.real  # (4,)

    def quartic(v):
        return (((A4 * v + A3) * v + A2) * v + A1) * v + A0

    def dquartic(v):
        return ((4 * A4 * v + 3 * A3) * v + 2 * A2) * v + A1

    for _ in range(2):  # Newton polish in f32
        v = v - quartic(v) / jnp.where(
            jnp.abs(dquartic(v)) < 1e-12, 1e-12, dquartic(v)
        )

    # u from the combination eliminating u^2:
    # (aa - cc) * q1 + bb * q2 is linear in u, where
    # q1 = aa(1+v^2-2v cb) - bb(u^2+v^2-2uv ca)
    # q2 = aa(1+u^2-2u cg) - cc(u^2+v^2-2uv ca)
    # coefficient of u: 2v ca (bb(aa-cc) ... derive directly:
    # q1 = -bb u^2 + 2 bb ca v u + [aa(1+v^2-2v cb) - bb v^2]
    # q2 = (aa-cc) u^2 + (2 cc ca v - 2 aa cg) u + [aa - cc v^2]
    # lin = (aa-cc) q1 + bb q2:
    lin_u = (aa - cc) * 2 * bb * ca * v + bb * (2 * cc * ca * v - 2 * aa * cg)
    lin_c = (aa - cc) * (aa * (1 + v * v - 2 * v * cb) - bb * v * v) + bb * (
        aa - cc * v * v
    )
    u = -lin_c / jnp.where(jnp.abs(lin_u) < 1e-12, 1e-12, lin_u)

    den = 1 + v * v - 2 * v * cb
    s1 = jnp.sqrt(bb / jnp.where(den < 1e-12, 1e-12, den))
    s2 = u * s1
    s3 = v * s1

    # Newton on the original distance system in (s1, s2, s3): recovers the
    # f32 accuracy the quartic's coefficient cancellations lose.
    #   g1 = s2^2 + s3^2 - 2 s2 s3 ca - aa, g2/g3 cyclically
    def newton_s(s, _):
        s1_, s2_, s3_ = s[..., 0], s[..., 1], s[..., 2]
        g = jnp.stack(
            [
                s2_**2 + s3_**2 - 2 * s2_ * s3_ * ca - aa,
                s1_**2 + s3_**2 - 2 * s1_ * s3_ * cb - bb,
                s1_**2 + s2_**2 - 2 * s1_ * s2_ * cg - cc,
            ],
            axis=-1,
        )
        zero = jnp.zeros_like(s1_)
        J = jnp.stack(
            [
                jnp.stack([zero, 2 * (s2_ - s3_ * ca), 2 * (s3_ - s2_ * ca)], -1),
                jnp.stack([2 * (s1_ - s3_ * cb), zero, 2 * (s3_ - s1_ * cb)], -1),
                jnp.stack([2 * (s1_ - s2_ * cg), 2 * (s2_ - s1_ * cg), zero], -1),
            ],
            axis=-2,
        )
        J = J + 1e-9 * jnp.eye(3)
        ds = jnp.linalg.solve(J, g[..., None])[..., 0]
        ds = jnp.where(jnp.isfinite(ds), ds, 0.0)
        return s - ds, None

    s_vec, _ = jax.lax.scan(
        newton_s, jnp.stack([s1, s2, s3], axis=-1), None, length=3
    )
    scale_back = jnp.sqrt(dscale)
    s1, s2, s3 = (s_vec[..., i] * scale_back for i in range(3))
    valid = (
        near_real & (den > 1e-12) & (s1 > 0) & (s2 > 0) & (s3 > 0)
        & jnp.isfinite(s1) & jnp.isfinite(s2) & jnp.isfinite(s3)
    )

    Y = jnp.stack([s1, s2, s3], axis=-1)[..., None] * f[None, :, :]  # (4,3,3)

    def kabsch(Ycam):
        Xc = pts3d - pts3d.mean(0)
        Yc = Ycam - Ycam.mean(0)
        Hm = jnp.einsum("ni,nj->ij", Xc, Yc, precision=_HI)
        U, _, Vt = jnp.linalg.svd(Hm)
        mm = lambda a, b: jnp.matmul(a, b, precision=_HI)
        d = jnp.linalg.det(mm(Vt.T, U.T))
        R = mm(Vt.T * jnp.array([1.0, 1.0, 0.0]), U.T) + d * mm(
            Vt.T * jnp.array([0.0, 0.0, 1.0]), U.T
        )
        t = Ycam.mean(0) - jnp.einsum("ij,j->i", R, pts3d.mean(0), precision=_HI)
        return jnp.concatenate([R, t[:, None]], axis=1)

    Ps = jax.vmap(kabsch)(Y)  # (4, 3, 4)
    return jnp.where(valid[:, None, None], Ps, jnp.nan)


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
            Tp = se3_compose(se3_exp(xi), T)
            return ((reproject(Tp) - pts2d) * w[:, None]).reshape(-1)

        zero = jnp.zeros((6,), T.dtype)
        J = jax.jacfwd(residual)(zero)  # (2N, 6)
        r = residual(zero)
        H = jnp.matmul(J.T, J, precision=_HI) + damping * jnp.eye(6, dtype=T.dtype)
        g = jnp.einsum("ni,n->i", J, r, precision=_HI)
        dx = -jnp.linalg.solve(H, g)
        # reject steps that are not finite (degenerate inlier sets)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
        return se3_compose(se3_exp(dx), T), None

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
    weights: jax.Array | None = None,
    minimal: str = "dlt6",
    preemptive_subset: int = 128,
    preemptive_keep: int = 64,
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

    ``weights`` (N,, optional) is a per-correspondence quality prior that
    biases minimal-sample draws (see ransac_sample_indices); scoring and
    refinement still treat all valid points equally, so a wrong prior can
    only cost hypothesis diversity, never flip the consensus.

    ``minimal`` picks the minimal solver: ``"dlt6"`` (6-point DLT, raw
    projective hypotheses) or ``"p3p"`` (3-point Grunert, up to 4 rigid
    poses per sample — use at low inlier rates, where p^3 vs p^6 decides
    whether any clean hypothesis exists in the batch).

    ``preemptive_subset`` > 0 enables two-stage (preemptive) scoring when
    the point set is large enough: every hypothesis is first scored on a
    random ``preemptive_subset``-point subset, and only the
    ``preemptive_keep`` best advance to full-set scoring — the
    fixed-shape TPU analogue of OpenCV's adaptive early exit
    (stereo_slam.py:294-295's iterationsCount=1000 run mostly scores
    hypotheses that a subset vote already rules out). Cuts hypothesis-
    scoring work ~5x at bench shapes; set 0 to disable.

    Preemptive caveats (ADVICE r3): (a) the subset vote is a random
    estimator — on a NEAR-TIE between hypotheses the full-set consensus
    winner can rank below ``preemptive_keep`` on the subset and be
    dropped (binomial vote noise; with keep=64 of 1024 hypotheses and a
    128-point subset the probability is negligible unless dozens of
    hypotheses tie within the vote's ~sqrt(subset*p) noise, in which
    case the survivors are statistically equivalent poses anyway — the
    GN polish then converges them to the same optimum); (b) enabling it
    consumes an extra key split, so RANSAC hypothesis sampling draws a
    DIFFERENT stream than rounds <= 2 at the same seed — per-seed
    trajectories are reproducible within a version but not across the
    r2/r3 boundary.
    """
    key, sub_key = jax.random.split(key)
    xn = undistort_points(pts2d, cam)  # normalized coords for the DLT
    if minimal == "p3p":
        idx = ransac_sample_indices(key, valid, n_hypotheses, 3, weights)
        fbear = jnp.concatenate(
            [xn, jnp.ones(xn.shape[:-1] + (1,), xn.dtype)], axis=-1
        )
        fbear = fbear / jnp.linalg.norm(fbear, axis=-1, keepdims=True)
        sampled = _gather_rows(
            jnp.concatenate([pts3d, fbear], axis=-1), idx
        )  # (H, 3, 6)
        Ps = jax.vmap(_p3p_grunert)(
            sampled[..., :3], sampled[..., 3:]
        ).reshape(-1, 3, 4)
    else:
        idx = ransac_sample_indices(key, valid, n_hypotheses, 6, weights)
        # raw (un-orthogonalized) hypotheses: scoring is scale/sign-invariant
        sampled = _gather_rows(
            jnp.concatenate([pts3d, xn], axis=-1), idx
        )  # (H, 6, 5)
        A = _dlt_rows(sampled[..., :3], sampled[..., 3:])  # (H, 12, 12)
        Ps = nullspace_inverse_iteration(A, 12).reshape(-1, 3, 4)

    N = pts3d.shape[0]
    n_keep = min(preemptive_keep, Ps.shape[0])
    if preemptive_subset > 0 and N >= 2 * preemptive_subset:
        # stage 1: subset vote (Gumbel top-k = uniform sample of valid
        # points without replacement; invalid slots only drawn when fewer
        # than subset valid points exist, and they never count as inliers)
        g = -jnp.log(-jnp.log(
            jax.random.uniform(sub_key, (N,), minval=1e-9, maxval=1.0)
        ))
        _, sub_idx = jax.lax.top_k(
            jnp.where(valid, g, -jnp.inf), preemptive_subset
        )
        p3_s, p2_s, v_s = pts3d[sub_idx], pts2d[sub_idx], valid[sub_idx]
        errs_s = jax.vmap(lambda P: _reproject_error(P, p3_s, p2_s, cam))(Ps)
        counts_s = jnp.sum((errs_s < reproj_threshold) & v_s[None, :], axis=1)
        _, keep_idx = jax.lax.top_k(counts_s, n_keep)
        Ps = Ps[keep_idx]
    errs = jax.vmap(lambda P: _reproject_error(P, pts3d, pts2d, cam))(Ps)
    inl = (errs < reproj_threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=1)

    k = min(max(n_starts, 1), Ps.shape[0])
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
    # backstop re-rigidification: TPU default-precision matmul chains can
    # de-orthonormalize R by ~1% (measured det 0.9883 on a VO frame before
    # the pose path moved to Precision.HIGHEST); downstream transpose-
    # inverses assume exact SO(3)
    P_fin = jnp.concatenate(
        [so3_orthonormalize(P_fin[:, :3]), P_fin[:, 3:4]], axis=1
    )
    inl_fin = inl_c[b]
    n = cnt_c[b]
    return PnPResult(
        R=P_fin[:, :3],
        t=P_fin[:, 3],
        inliers=inl_fin,
        n_inliers=n,
        ok=n >= min_inliers,
    )
