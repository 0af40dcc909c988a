"""SO(3) / SE(3) and quaternion utilities.

Conventions match the reference pipeline's use of ROS ``tf.transformations``
(reference: ros_ws/src/stereo_slam.py:327, gt_localisation.py:72):

- quaternions are ``[x, y, z, w]`` (scalar last),
- ``quat_from_matrix`` returns the quaternion with ``w >= 0`` (the
  ``tf.transformations.quaternion_from_matrix`` eigenvector method also
  normalizes to a non-negative scalar part),
- homogeneous transforms are 4x4 row-major with points as column vectors,
  composed left-to-right as ``T_world_cam = T_world_prev @ T_prev_cam``
  (reference: stereo_slam.py:306).

Everything is pure ``jnp``: jit-able, vmappable, and differentiable. All
functions broadcast over leading batch dimensions where documented.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Small (3x3 / 4x4) geometry matmuls must not drop to the TPU default
# (bfloat16 MXU passes): pose chaining amplifies rounding over thousands of
# frames. Pin full float32 precision; the cost at these shapes is nil.
_HI = jax.lax.Precision.HIGHEST

_EPS = 1e-12


# --------------------------------------------------------------------------
# Quaternions ([x, y, z, w], scalar last — ROS convention)
# --------------------------------------------------------------------------


def quat_normalize(q: jax.Array) -> jax.Array:
    """Normalize quaternion(s) to unit norm. Shape (..., 4)."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 ⊗ q2, both (..., 4) in [x, y, z, w]."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) [x,y,z,w] -> rotation matrix (..., 3, 3)."""
    q = quat_normalize(q)
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_matrix(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) (or 4x4 transform) -> quaternion [x,y,z,w].

    Branch-free Shepperd's method: computes all four candidate solutions and
    selects the numerically best via the largest of
    (trace, R00, R11, R22) — equivalent to the case analysis used by
    ``tf.transformations`` but expressed with ``where`` masks so it is
    jit/vmap friendly. The result is normalized with ``w >= 0`` to match the
    reference's sign convention (SURVEY.md §7.3 item 4).
    """
    R = R[..., :3, :3]
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions, each stable in a different region.
    # q_t: trace-dominant;  q_x/q_y/q_z: diagonal-dominant cases.
    def safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS))

    s_t = safe_sqrt(tr + 1.0) * 2.0
    q_t = jnp.stack(
        [(m21 - m12) / s_t, (m02 - m20) / s_t, (m10 - m01) / s_t, 0.25 * s_t],
        axis=-1,
    )
    s_x = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q_x = jnp.stack(
        [0.25 * s_x, (m01 + m10) / s_x, (m02 + m20) / s_x, (m21 - m12) / s_x],
        axis=-1,
    )
    s_y = safe_sqrt(1.0 - m00 + m11 - m22) * 2.0
    q_y = jnp.stack(
        [(m01 + m10) / s_y, 0.25 * s_y, (m12 + m21) / s_y, (m02 - m20) / s_y],
        axis=-1,
    )
    s_z = safe_sqrt(1.0 - m00 - m11 + m22) * 2.0
    q_z = jnp.stack(
        [(m02 + m20) / s_z, (m12 + m21) / s_z, 0.25 * s_z, (m10 - m01) / s_z],
        axis=-1,
    )

    # Pick the branch with the largest pivot.
    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([q_t, q_x, q_y, q_z], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # Enforce w >= 0 (tf.transformations sign convention).
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


# --------------------------------------------------------------------------
# SE(3)
# --------------------------------------------------------------------------


def se3_matrix(R: jax.Array, t: jax.Array) -> jax.Array:
    """Assemble (..., 4, 4) from rotation (..., 3, 3) and translation (..., 3)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def so3_orthonormalize(R: jax.Array) -> jax.Array:
    """Project (..., 3, 3) onto SO(3) by Gram-Schmidt on the rows.

    Needed because TPU f32 matmuls at DEFAULT precision run as bfloat16
    passes: a chain of ``se3_exp(dx) @ T`` style products (PnP refinement,
    BA updates) accumulates per-entry errors of ~1e-3 per product, and a
    measured VO relative pose came out with det(R) = 0.9883 — a 1.2%
    uniform scale contraction that silently breaks every transpose-inverse
    downstream (backend/window.py round-trips poses through se3_inverse and
    was dragged ~0.5 m on a clean run by exactly this). All pose-path
    matmuls now use Precision.HIGHEST, and robust-solver outputs are
    re-projected with this helper as a backstop.

    Gram-Schmidt (not polar/SVD) because it is closed-form, exactly
    orthonormal at f32 resolution, and keeps the row directions of the
    dominant axes — for near-rigid inputs the difference from the polar
    factor is O(err^2).
    """
    r0 = R[..., 0, :]
    r0 = r0 / jnp.linalg.norm(r0, axis=-1, keepdims=True)
    r1 = R[..., 1, :]
    r1 = r1 - jnp.sum(r1 * r0, axis=-1, keepdims=True) * r0
    r1 = r1 / jnp.linalg.norm(r1, axis=-1, keepdims=True)
    r2 = jnp.cross(r0, r1)
    return jnp.stack([r0, r1, r2], axis=-2)


def se3_orthonormalize(T: jax.Array) -> jax.Array:
    """Re-rigidify (..., 4, 4): project R onto SO(3), keep t, clean row 3."""
    return se3_matrix(so3_orthonormalize(T[..., :3, :3]), T[..., :3, 3])


def se3_inverse(T: jax.Array) -> jax.Array:
    """Inverse of (..., 4, 4) rigid transform(s) without a linear solve."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return se3_matrix(Rt, -jnp.einsum("...ij,...j->...i", Rt, t, precision=_HI))


def se3_compose(T1: jax.Array, T2: jax.Array) -> jax.Array:
    """T1 @ T2 (matrix product) for (..., 4, 4)."""
    return jnp.einsum("...ij,...jk->...ik", T1, T2, precision=_HI)


def se3_chain(relative: jax.Array, initial: jax.Array | None = None) -> jax.Array:
    """Cumulatively compose a sequence of relative transforms.

    Given relatives ``(N, 4, 4)`` returns absolutes ``(N, 4, 4)`` where
    ``abs[i] = initial @ rel[0] @ ... @ rel[i]`` — the pose-chaining loop of
    the reference (stereo_slam.py:306) expressed as an associative scan so it
    parallelizes on TPU (log-depth instead of a serial Python loop).
    """
    if initial is not None:
        relative = relative.at[0].set(se3_compose(initial, relative[0]))
    return jax.lax.associative_scan(se3_compose, relative, axis=0)


def se3_transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) to points (..., N, 3) -> (..., N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts, precision=_HI) + t[..., None, :]


# --------------------------------------------------------------------------
# Exponential / logarithm maps
# --------------------------------------------------------------------------


def _hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = jnp.moveaxis(w, -1, 0)
    zero = jnp.zeros_like(wx)
    m = jnp.stack(
        [zero, -wz, wy, wz, zero, -wx, -wy, wx, zero], axis=-1
    )
    return m.reshape(w.shape[:-1] + (3, 3))


def so3_exp(w: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) (Rodrigues' formula).

    Taylor-guarded near theta=0 so it is safe to differentiate through.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    # sin(t)/t and (1-cos t)/t^2 with series fallbacks
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = _hat(w)
    W2 = jnp.einsum("...ij,...jk->...ik", W, W, precision=_HI)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


# OpenCV name used by the reference (stereo_slam.py:298): axis-angle -> R.
rodrigues = so3_exp


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Differentiable everywhere (used under jacfwd by the pose-graph and BA
    backends): the small-angle and near-pi branches use the double-where
    pattern so the untaken branch never feeds non-finite tangents through
    ``arccos``/``sqrt`` at their singular points.
    """
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    # vee of the antisymmetric part; |v| = 2 sin(theta)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # threshold must exceed the f32 ulp at 1.0 (1.19e-7) or `small` can
    # never trigger (1.0 - 1e-8 rounds to 1.0 in f32)
    small = cos_theta > 1.0 - 1e-6  # theta < ~1.4e-3
    # guard arccos' input in the non-small branch so its derivative stays
    # finite even where `small` is taken (where-grad contamination)
    cos_safe = jnp.where(small, 0.0, cos_theta)
    theta_big = jnp.arccos(cos_safe)
    vnorm2 = jnp.sum(v * v, axis=-1)
    theta_small = 0.5 * jnp.sqrt(vnorm2 + _EPS)  # theta ~ |v|/2
    theta = jnp.where(small, theta_small, theta_big)
    sin_theta = jnp.sin(theta_big)
    scale = jnp.where(
        small,
        0.5 + theta_small * theta_small / 12.0,
        theta_big / jnp.maximum(2.0 * sin_theta, _EPS),
    )
    w = scale[..., None] * v
    # Near theta = pi the antisymmetric part vanishes; recover axis from the
    # symmetric part: R ≈ I + 2*B*(ww^T - I) so diag gives |w_i|.
    near_pi = theta > jnp.pi - 1e-3
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.maximum((diag - cos_theta[..., None]) / jnp.maximum(1 - cos_theta[..., None], _EPS), 0.0)
    axis = jnp.sqrt(axis_sq + _EPS)
    # fix signs using off-diagonal sums
    s01 = R[..., 0, 1] + R[..., 1, 0]
    s02 = R[..., 0, 2] + R[..., 2, 0]
    # pick the largest axis component as reference positive
    a0, a1, a2 = axis[..., 0], axis[..., 1], axis[..., 2]
    sign1 = jnp.where(s01 >= 0, 1.0, -1.0)
    sign2 = jnp.where(s02 >= 0, 1.0, -1.0)
    axis_signed = jnp.stack([a0, sign1 * a1, sign2 * a2], axis=-1)
    w_pi = axis_signed * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def se3_exp(xi: jax.Array) -> jax.Array:
    """Twist (..., 6) [v, w] -> transform (..., 4, 4)."""
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / theta2)
    W = _hat(w)
    W2 = jnp.einsum("...ij,...jk->...ik", W, W, precision=_HI)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + A[..., None, None] * W + B[..., None, None] * W2
    V = eye + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, v, precision=_HI)
    return se3_matrix(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """Transform (..., 4, 4) -> twist (..., 6) [v, w]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS))
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    D = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - A / (2.0 * B)) / jnp.maximum(theta2, _EPS),
    )
    W = _hat(w)
    W2 = jnp.einsum("...ij,...jk->...ik", W, W, precision=_HI)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + D[..., None, None] * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, t, precision=_HI)
    return jnp.concatenate([v, w], axis=-1)
