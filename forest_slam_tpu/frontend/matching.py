"""Descriptor matching as MXU matmuls.

Replaces the reference's ``cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)``
(stereo_slam.py:85,234) with a TPU-native formulation: unpack the 256-bit
descriptors to ±1 int8 vectors and compute ALL pairwise Hamming distances in
one (N, 256) x (256, M) matmul on the systolic array —
``hamming = (256 - dot) / 2``. Mutual-nearest-neighbour selection
(crossCheck semantics) is then two argmin reductions. No per-pair host loop,
no dynamic shapes: invalid keypoint slots are masked to +inf distance.

Float descriptor matching (for the learned front-end) follows the same
pattern with a cosine-similarity matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unpack_bits_pm1(desc: jax.Array) -> jax.Array:
    """(N, 8) uint32 -> (N, 256) int8 in {-1, +1}."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc.shape[0], 256).astype(jnp.int8)
    return 2 * bits - 1


def hamming_distance_matrix(desc_a: jax.Array, desc_b: jax.Array) -> jax.Array:
    """(N, 8) x (M, 8) packed uint32 -> (N, M) int32 Hamming distances."""
    a = unpack_bits_pm1(desc_a)
    b = unpack_bits_pm1(desc_b)
    dot = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (N, M), in [-256, 256]
    return (256 - dot) // 2


def mutual_nn_match(
    dist: jax.Array,
    valid_a: jax.Array | None = None,
    valid_b: jax.Array | None = None,
    max_distance: float | None = None,
) -> jax.Array:
    """Cross-checked nearest-neighbour matching.

    Args:
        dist: (N, M) distance matrix (smaller is better).
        valid_a/valid_b: optional masks; invalid rows/cols never match.
        max_distance: optional distance gate.

    Returns:
        (N,) int32: index into B for each A keypoint, or -1 — the same
        contract as the reference's SuperGlue ``matches0`` consumption
        (stereo_slam.py:216-218) so both front-ends plug into one backend.
    """
    big = jnp.asarray(jnp.iinfo(jnp.int32).max, dist.dtype)
    if valid_a is not None:
        dist = jnp.where(valid_a[:, None], dist, big)
    if valid_b is not None:
        dist = jnp.where(valid_b[None, :], dist, big)
    best_b = jnp.argmin(dist, axis=1)  # (N,)
    best_a = jnp.argmin(dist, axis=0)  # (M,)
    n = dist.shape[0]
    mutual = best_a[best_b] == jnp.arange(n)
    d = jnp.take_along_axis(dist, best_b[:, None], axis=1)[:, 0]
    ok = mutual & (d < big)
    if max_distance is not None:
        ok = ok & (d <= max_distance)
    if valid_a is not None:
        ok = ok & valid_a
    return jnp.where(ok, best_b, -1)


def gather_matched_points(
    xy_a: jax.Array, xy_b: jax.Array, matches: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fixed-shape equivalent of the reference's boolean-mask gather
    (``mkpts0 = kpts0[valid]; mkpts1 = kpts1[matches[valid]]``,
    stereo_slam.py:216-218): returns (pts_a (N,2), pts_b (N,2),
    mask (N,)) where unmatched slots carry mask=False instead of being
    dropped — keeping shapes static for jit.
    """
    mask = matches >= 0
    idx = jnp.where(mask, matches, 0)
    return xy_a, xy_b[idx], mask
