"""Linear (DLT) two-view triangulation, batched.

Used by pose recovery's cheirality test (the disambiguation inside the
reference's ``cv2.recoverPose``, mono_slam.py:112) and by the stereo
back-end. Solves the 4x4 homogeneous system per point with a closed-form
smallest-eigenvector via SVD, vmapped over all points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def triangulate_linear(
    P0: jax.Array, P1: jax.Array, pts0: jax.Array, pts1: jax.Array
) -> jax.Array:
    """Triangulate correspondences.

    Args:
        P0, P1: (3, 4) projection matrices (in whatever units pts are).
        pts0, pts1: (N, 2) image points.

    Returns:
        (N, 3) points in the common frame (dehomogenized).
    """

    def one(x0, x1):
        A = jnp.stack(
            [
                x0[0] * P0[2] - P0[0],
                x0[1] * P0[2] - P0[1],
                x1[0] * P1[2] - P1[0],
                x1[1] * P1[2] - P1[1],
            ]
        )  # (4, 4)
        # smallest right singular vector of A
        _, _, vt = jnp.linalg.svd(A)
        X = vt[-1]
        w = X[3]
        return X[:3] / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)

    return jax.vmap(one)(pts0, pts1)


def depths_in_camera(P: jax.Array, pts3d: jax.Array) -> jax.Array:
    """Depth (z in camera frame) of world points under projection [R|t]."""
    R = P[:, :3]
    t = P[:, 3]
    return jnp.einsum("j,nj->n", R[2], pts3d, precision=_HI) + t[2]
