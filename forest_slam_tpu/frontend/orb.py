"""ORB feature extraction, TPU-native.

Functional equivalent of the reference's commented classical front-end
(``cv2.ORB_create()`` + detectAndCompute, stereo_slam.py:84,232-246):
FAST-9 corners over an 8-level 1.2x image pyramid, Harris ranking,
intensity-centroid orientation, and rotated-BRIEF 256-bit descriptors.

TPU-first design decisions (vs. OpenCV's per-keypoint C++ loops):

- every pyramid level is a *static* shape, so the whole extractor jits once;
- detection is dense map arithmetic (fast.py) + ``top_k``, no dynamic-length
  keypoint lists — outputs are fixed ``(n_features,)`` slots with a validity
  mask (SURVEY.md §7.1 "fixed-shape, batched, masked tensors everywhere");
- orientation and descriptors are batched gathers over all keypoints at
  once; BRIEF rotation uses OpenCV's 30-bin angle quantization so rotated
  patterns are a precomputed static table.

The 256 BRIEF point pairs are sampled from the ORB paper's Gaussian
distribution with a fixed seed rather than OpenCV's learned
``bit_pattern_31_`` table (deliberately not copied); descriptors are
therefore not bit-identical to OpenCV's but match with the same quality, and
trajectory-level parity is what the pipeline is gated on (BASELINE.md).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from forest_slam_tpu.frontend.fast import fast_score_map, harris_response, nms_topk
from forest_slam_tpu.utils.filters import gaussian_blur, resize_bilinear


class OrbConfig(NamedTuple):
    n_features: int = 512
    n_levels: int = 8
    scale_factor: float = 1.2
    fast_threshold: float = 20.0
    harris_block: int = 7
    edge_margin: int = 16  # keypoints closer to a level border are dropped
    n_angle_bins: int = 30  # OpenCV quantizes BRIEF rotation into 12° bins
    pattern_seed: int = 77


class OrbFeatures(NamedTuple):
    """Fixed-size keypoint set. Invalid slots: valid=False, xy=(0,0)."""

    xy: jax.Array  # (N, 2) float32, level-0 pixel coords (x, y)
    response: jax.Array  # (N,) float32 Harris response
    angle: jax.Array  # (N,) float32 radians
    octave: jax.Array  # (N,) int32 pyramid level
    desc: jax.Array  # (N, 8) uint32 — 256-bit rBRIEF
    valid: jax.Array  # (N,) bool


# --------------------------------------------------------------------------
# Static tables
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _brief_pattern(seed: int) -> np.ndarray:
    """(256, 2, 2) int32: per bit, two (dy, dx) offsets, radius <= 13."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(scale=31 / 5.0, size=(256, 2, 2))
    r = np.linalg.norm(pts, axis=-1, keepdims=True)
    pts = np.where(r > 13.0, pts * (13.0 / r), pts)
    return np.round(pts).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _rotated_patterns(seed: int, n_bins: int) -> np.ndarray:
    """(n_bins, 256, 2, 2) int32 rotated copies of the BRIEF pattern.

    Rotation convention matches OpenCV's rBRIEF: for angle a,
    sampled offset = (dx cos a - dy sin a, dx sin a + dy cos a).
    """
    base = _brief_pattern(seed).astype(np.float64)  # (256,2,2) of (dy,dx)
    out = np.zeros((n_bins, 256, 2, 2), np.int32)
    for b in range(n_bins):
        a = 2.0 * math.pi * b / n_bins
        ca, sa = math.cos(a), math.sin(a)
        dy, dx = base[..., 0], base[..., 1]
        rx = dx * ca - dy * sa
        ry = dx * sa + dy * ca
        out[b, ..., 0] = np.round(ry)
        out[b, ..., 1] = np.round(rx)
    return out


@functools.lru_cache(maxsize=None)
def _circular_mask_offsets(radius: int = 15) -> np.ndarray:
    """(M, 2) int32 (dy, dx) offsets inside a disc — orientation support."""
    ys, xs = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    mask = ys * ys + xs * xs <= radius * radius
    return np.stack([ys[mask], xs[mask]], axis=1).astype(np.int32)


def _level_geometry(height: int, width: int, cfg: OrbConfig):
    """Static per-level (h, w, scale) plus per-level keypoint budgets,
    distributed like OpenCV ORB (geometric decay by 1/scale_factor)."""
    sizes = []
    for lvl in range(cfg.n_levels):
        s = cfg.scale_factor ** lvl
        sizes.append((max(int(round(height / s)), 32), max(int(round(width / s)), 32), s))
    q = 1.0 / cfg.scale_factor
    norm = (1.0 - q) / (1.0 - q ** cfg.n_levels)
    budgets = [int(round(cfg.n_features * norm * q ** lvl)) for lvl in range(cfg.n_levels)]
    # make the budgets sum exactly to n_features
    budgets[-1] += cfg.n_features - sum(budgets)
    return sizes, budgets


# --------------------------------------------------------------------------
# Per-level feature computation
# --------------------------------------------------------------------------


def _intensity_centroid_angle(img: jax.Array, xy: jax.Array) -> jax.Array:
    """Orientation by intensity centroid over a radius-15 disc (ORB's
    IC_Angle). ``xy`` is (K, 2) float (x, y) on this level. Batched gather."""
    offs = jnp.asarray(_circular_mask_offsets(15))  # (M, 2) of (dy, dx)
    H, W = img.shape
    yi = xy[:, 1].astype(jnp.int32)[:, None] + offs[None, :, 0]  # (K, M)
    xi = xy[:, 0].astype(jnp.int32)[:, None] + offs[None, :, 1]
    yi = jnp.clip(yi, 0, H - 1)
    xi = jnp.clip(xi, 0, W - 1)
    patch = img[yi, xi]  # (K, M)
    m01 = jnp.sum(patch * offs[None, :, 0].astype(jnp.float32), axis=1)
    m10 = jnp.sum(patch * offs[None, :, 1].astype(jnp.float32), axis=1)
    return jnp.arctan2(m01, m10)


def _brief_descriptors(
    blurred: jax.Array, xy: jax.Array, angle: jax.Array, cfg: OrbConfig
) -> jax.Array:
    """(K, 8) uint32 rotated-BRIEF from the blurred level image."""
    table = jnp.asarray(_rotated_patterns(cfg.pattern_seed, cfg.n_angle_bins))
    two_pi = 2.0 * math.pi
    bins = jnp.floor((angle % two_pi) / two_pi * cfg.n_angle_bins).astype(jnp.int32)
    bins = jnp.clip(bins, 0, cfg.n_angle_bins - 1)
    offs = table[bins]  # (K, 256, 2, 2)
    H, W = blurred.shape
    yc = xy[:, 1].astype(jnp.int32)[:, None]
    xc = xy[:, 0].astype(jnp.int32)[:, None]

    def sample(point_idx):
        yi = jnp.clip(yc + offs[:, :, point_idx, 0], 0, H - 1)
        xi = jnp.clip(xc + offs[:, :, point_idx, 1], 0, W - 1)
        return blurred[yi, xi]  # (K, 256)

    bits = (sample(0) < sample(1)).astype(jnp.uint32)  # (K, 256)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    packed = jnp.sum(bits.reshape(-1, 8, 32) << shifts[None, None, :], axis=-1)
    return packed.astype(jnp.uint32)  # (K, 8)


def _extract_level(
    level_img: jax.Array, budget: int, scale: float, lvl: int, cfg: OrbConfig
):
    H, W = level_img.shape
    fast = fast_score_map(level_img, cfg.fast_threshold)
    harris = harris_response(level_img, cfg.harris_block)
    # FAST corners, 3x3 NMS, ranked by Harris (OpenCV ORB HARRIS_SCORE)
    ranked = jnp.where(fast > 0.0, harris, -jnp.inf)
    # enforce the edge margin so orientation/BRIEF patches stay in-bounds
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    m = cfg.edge_margin
    interior = (ys >= m) & (ys < H - m) & (xs >= m) & (xs < W - m)
    ranked = jnp.where(interior, ranked, -jnp.inf)
    # NMS on the ranking score
    from forest_slam_tpu.utils.filters import maxpool2d_same

    is_max = ranked >= maxpool2d_same(ranked, 3)
    flat = jnp.where(is_max & jnp.isfinite(ranked), ranked, -jnp.inf).reshape(-1)
    vals, idx = jax.lax.top_k(flat, budget)
    valid = jnp.isfinite(vals)
    xy = jnp.stack(
        [(idx % W).astype(jnp.float32), (idx // W).astype(jnp.float32)], axis=-1
    )
    xy = xy * valid[:, None]

    angle = _intensity_centroid_angle(level_img, xy)
    blurred = gaussian_blur(level_img, sigma=2.0, radius=3)
    desc = _brief_descriptors(blurred, xy, angle, cfg)
    return OrbFeatures(
        xy=xy * scale,
        response=jnp.where(valid, vals, 0.0),
        angle=angle,
        octave=jnp.full((budget,), lvl, jnp.int32),
        desc=desc,
        valid=valid,
    )


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1,))
def extract_orb(image: jax.Array, cfg: OrbConfig = OrbConfig()) -> OrbFeatures:
    """Extract ORB features from a grayscale image (H, W) in [0, 255].

    Returns fixed-shape ``OrbFeatures`` with ``cfg.n_features`` slots; jits
    once per (image shape, cfg).
    """
    image = image.astype(jnp.float32)
    H, W = image.shape
    sizes, budgets = _level_geometry(H, W, cfg)
    per_level = []
    level_img = image
    for lvl, ((h, w, scale), budget) in enumerate(zip(sizes, budgets)):
        if lvl > 0:
            level_img = resize_bilinear(level_img, h, w)
        per_level.append(_extract_level(level_img, budget, scale, lvl, cfg))
    return OrbFeatures(
        xy=jnp.concatenate([f.xy for f in per_level]),
        response=jnp.concatenate([f.response for f in per_level]),
        angle=jnp.concatenate([f.angle for f in per_level]),
        octave=jnp.concatenate([f.octave for f in per_level]),
        desc=jnp.concatenate([f.desc for f in per_level]),
        valid=jnp.concatenate([f.valid for f in per_level]),
    )
