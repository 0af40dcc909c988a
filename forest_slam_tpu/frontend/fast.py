"""FAST-9/16 corner detection and Harris response, fully vectorized.

TPU-native replacement for the detection stage of ``cv2.ORB_create()``
(reference: commented ORB path at stereo_slam.py:84,232-246 — FAST-9 corners
ranked by Harris score). Instead of OpenCV's per-pixel C++ branch ladder,
the segment test runs as 16 shifted-image comparisons + a circular arc
reduction on the whole image at once: pure VPU element-wise work with no
data-dependent control flow.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from forest_slam_tpu.utils.filters import box_filter, maxpool2d_same, sobel

# FAST-16 Bresenham circle of radius 3, (dy, dx), clockwise from 12 o'clock
# (same ring OpenCV uses).
FAST_OFFSETS = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3),
        (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)


def _ring_stack(img: jax.Array) -> jax.Array:
    """(H, W) -> (16, H, W): the 16 circle neighbours of every pixel.

    Implemented as static pad+slice (XLA turns these into cheap views),
    border pixels see zero-padding but are masked out by callers.
    """
    H, W = img.shape
    padded = jnp.pad(img, 3)
    return jnp.stack(
        [padded[3 + dy : 3 + dy + H, 3 + dx : 3 + dx + W] for dy, dx in FAST_OFFSETS]
    )


def fast_score_map(img: jax.Array, threshold: float = 20.0) -> jax.Array:
    """FAST-9 corner score map (H, W); 0 where not a corner.

    A pixel is a corner if >= 9 contiguous ring pixels are all brighter than
    ``center + t`` or all darker than ``center - t``. The score is the
    max-over-arcs of the min absolute center-difference within the arc —
    the same "highest threshold that still detects" criterion OpenCV uses,
    evaluated in closed form.
    """
    img = img.astype(jnp.float32)
    ring = _ring_stack(img)  # (16, H, W)
    diff = ring - img[None]  # (16, H, W)

    # circular windows of length 9: windows[s] = min over k of diff[s+k]
    diff2 = jnp.concatenate([diff, diff[:8]], axis=0)  # (24, H, W)
    # bright arcs: all diffs > t  -> score = min(diff) over arc
    # dark arcs:   all diffs < -t -> score = min(-diff) over arc
    def arc_scores(d):
        # windows of 9 consecutive entries, vectorized via shifted stacks
        mins = jnp.stack(
            [jnp.min(d[s : s + 9], axis=0) for s in range(16)]
        )  # (16, H, W)
        return jnp.max(mins, axis=0)  # best arc per pixel

    bright = arc_scores(diff2)
    dark = arc_scores(-diff2)
    score = jnp.maximum(bright, dark)
    score = jnp.where(score > threshold, score, 0.0)
    # kill the 3-pixel border (ring reads zero padding there)
    H, W = img.shape
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    interior = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    return jnp.where(interior, score, 0.0)


def harris_response(img: jax.Array, block_size: int = 7, k: float = 0.04) -> jax.Array:
    """Dense Harris corner response (det - k * trace^2), ORB's ranking score
    (OpenCV ORB HARRIS_SCORE with blockSize=7, harrisK=0.04)."""
    img = img.astype(jnp.float32)
    gx, gy = sobel(img)
    # OpenCV normalizes the Sobel output by the block scale; the constant
    # only rescales responses uniformly so ranking is unaffected. We match
    # OpenCV's 1/(4*255*block) scale so magnitudes are comparable in tests.
    scale = 1.0 / ((1 << 2) * block_size * 255.0)
    gx = gx * scale
    gy = gy * scale
    ixx = box_filter(gx * gx, block_size, normalize=False)
    iyy = box_filter(gy * gy, block_size, normalize=False)
    ixy = box_filter(gx * gy, block_size, normalize=False)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    return det - k * tr * tr


def nms_topk(
    score: jax.Array,
    max_keypoints: int,
    nms_size: int = 3,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """3x3 non-max suppression + top-K selection, fixed output shape.

    Returns (xy (K, 2) float32, score (K,), valid (K,) bool). Invalid slots
    (fewer corners than K) have score 0 and xy (0, 0).
    """
    is_max = score >= maxpool2d_same(score, nms_size)
    kept = jnp.where(is_max & (score > 0.0), score, 0.0)
    flat = kept.reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_keypoints)
    W = score.shape[1]
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    valid = vals > 0.0
    xy = jnp.stack([xs, ys], axis=-1) * valid[:, None]
    return xy, vals, valid
