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

from forest_slam_tpu.utils import tpu_backend

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
    # spatial bucketing: keep at most one corner per cell x cell tile and
    # top-k over tile maxima instead of sorting the full score map — the
    # TPU analogue of OpenCV ORB's quadtree keypoint distribution, and ~3x
    # cheaper than a full-image top_k. 0 restores exact full-image top-k.
    cell_size: int = 8
    # detection backend: "auto" uses the fused Pallas kernel
    # (frontend/pallas_detect.py) on TPU — measured 2.6x faster than the
    # XLA detection path at 960x600 on v5e — and XLA ops elsewhere;
    # "xla"/"pallas" force a specific path.
    detect_backend: str = "auto"


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


_PATCH = 31  # patch side for orientation + BRIEF (offsets are <= 15)
_PR = _PATCH // 2


@functools.lru_cache(maxsize=None)
def _moment_matrix() -> np.ndarray:
    """(31*31, 2) f32: disc-masked (dx, dy) weights — IC-angle moments as
    one patch @ matrix matmul (m10, m01 columns)."""
    ys, xs = np.mgrid[-_PR : _PR + 1, -_PR : _PR + 1]
    disc = (ys * ys + xs * xs <= _PR * _PR).astype(np.float32)
    return np.stack(
        [(xs * disc).reshape(-1), (ys * disc).reshape(-1)], axis=1
    ).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _brief_select_matrix(seed: int, n_bins: int) -> np.ndarray:
    """(31*31, n_bins*256) f32 one-hot difference matrix.

    Column (b*256 + i) holds +1 at the flattened patch index of rotated
    pair point 1 and -1 at point 0, so ``patch_flat @ M > 0`` evaluates
    every BRIEF bit for every rotation bin as ONE matmul (MXU) instead of
    per-keypoint scattered gathers (measured ~10 ms/frame at 1024 kpts on
    v5e — gathers run at ~10^8 elem/s while the equivalent matmul is
    ~0.3 ms).
    """
    pats = _rotated_patterns(seed, n_bins)  # (n_bins, 256, 2, 2) of (dy,dx)
    M = np.zeros((_PATCH * _PATCH, n_bins * 256), np.float32)
    for b in range(n_bins):
        for i in range(256):
            (y0, x0), (y1, x1) = pats[b, i]
            M[(y0 + _PR) * _PATCH + (x0 + _PR), b * 256 + i] -= 1.0
            M[(y1 + _PR) * _PATCH + (x1 + _PR), b * 256 + i] += 1.0
    return M


def _extract_patches(img: jax.Array, xy: jax.Array) -> jax.Array:
    """(K, 31, 31) patches centered on integer-cast keypoints.

    The image is padded by the patch radius so every dynamic_slice start is
    in-bounds without clamping (keypoints already respect edge_margin >= 16;
    invalid slots sit at (0, 0) and slice padding). dynamic_slice is ~3x
    faster than advanced-indexing gathers on TPU for this access pattern.
    """
    pad = _PR + 1
    padded = jnp.pad(img, pad)
    xi = xy[:, 0].astype(jnp.int32) + pad - _PR
    yi = xy[:, 1].astype(jnp.int32) + pad - _PR

    def one(x, y):
        return jax.lax.dynamic_slice(padded, (y, x), (_PATCH, _PATCH))

    return jax.vmap(one)(xi, yi)


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


def _select_keypoints(ranked: jax.Array, budget: int, cell: int):
    """NMS + top-k selection. ``cell > 0``: bucketed (<=1 corner per
    cell x cell tile, top-k over tile maxima); ``cell == 0``: exact
    full-image top-k. Returns (xy (K, 2) f32, score (K,), valid (K,))."""
    from forest_slam_tpu.utils.filters import maxpool2d_same

    H, W = ranked.shape
    is_max = ranked >= maxpool2d_same(ranked, 3)
    kept = jnp.where(is_max & jnp.isfinite(ranked), ranked, -jnp.inf)

    if cell <= 0:
        vals, idx = jax.lax.top_k(kept.reshape(-1), budget)
        ys = (idx // W).astype(jnp.float32)
        xs = (idx % W).astype(jnp.float32)
    else:
        Hp = -(-H // cell) * cell
        Wp = -(-W // cell) * cell
        kp = jnp.pad(
            kept, ((0, Hp - H), (0, Wp - W)), constant_values=-jnp.inf
        )
        tiles = (
            kp.reshape(Hp // cell, cell, Wp // cell, cell)
            .transpose(0, 2, 1, 3)
            .reshape(-1, cell * cell)
        )
        tvals = jnp.max(tiles, axis=1)
        targ = jnp.argmax(tiles, axis=1)
        if budget > tvals.shape[0]:  # tiny pyramid level: fewer tiles
            pad = budget - tvals.shape[0]
            tvals = jnp.concatenate([tvals, jnp.full((pad,), -jnp.inf)])
            targ = jnp.concatenate([targ, jnp.zeros((pad,), targ.dtype)])
        vals, tidx = jax.lax.top_k(tvals, budget)
        within = targ[tidx]
        ncx = Wp // cell
        ys = ((tidx // ncx) * cell + within // cell).astype(jnp.float32)
        xs = ((tidx % ncx) * cell + within % cell).astype(jnp.float32)
    valid = jnp.isfinite(vals)
    xy = jnp.stack([xs, ys], axis=-1) * valid[:, None]
    return xy, jnp.where(valid, vals, 0.0), valid


def _orient_and_describe(patches: jax.Array, cfg: OrbConfig):
    """IC angle + rotated BRIEF from (K, 31, 31) patches, all as matmuls.

    Moments come from a disc-masked (dx, dy) weight matrix; all
    ``n_angle_bins x 256`` BRIEF comparisons are evaluated at once by the
    one-hot difference matmul and the keypoint's quantized-angle bin row is
    selected with a one-hot contraction — zero per-keypoint gathers.
    """
    K = patches.shape[0]
    flat = patches.reshape(K, _PATCH * _PATCH)
    mom = flat @ jnp.asarray(_moment_matrix())  # (K, 2) = (m10, m01)
    angle = jnp.arctan2(mom[:, 1], mom[:, 0])

    two_pi = 2.0 * math.pi
    nb = cfg.n_angle_bins
    bins = jnp.floor((angle % two_pi) / two_pi * nb).astype(jnp.int32)
    bins = jnp.clip(bins, 0, nb - 1)

    sel = jnp.asarray(_brief_select_matrix(cfg.pattern_seed, nb))
    diffs = (flat @ sel).reshape(K, nb, 256)  # I[p1] - I[p0], all bins
    onehot = jax.nn.one_hot(bins, nb, dtype=diffs.dtype)  # (K, nb)
    picked = jnp.einsum("kb,kbi->ki", onehot, diffs)  # (K, 256)
    bits = (picked > 0).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    packed = jnp.sum(bits.reshape(-1, 8, 32) << shifts[None, None, :], axis=-1)
    return angle, packed.astype(jnp.uint32)


def _use_pallas(cfg: OrbConfig) -> bool:
    if cfg.detect_backend == "pallas":
        return True
    if cfg.detect_backend == "xla":
        return False
    return tpu_backend()


def _select_keypoints_pallas(level_img, budget: int, cfg: OrbConfig):
    """Detection via the fused Pallas kernel: cell-pooled scores/indices
    from one VMEM pass, then a tiny top-k over cells (same semantics as
    the XLA path with cell_size=8 — equivalence-tested)."""
    from forest_slam_tpu.frontend.pallas_detect import detect_pooled

    vals, idx, Wp = detect_pooled(
        level_img,
        threshold=cfg.fast_threshold,
        harris_block=cfg.harris_block,
        margin=cfg.edge_margin,
    )
    flat_v = vals.reshape(-1)
    flat_i = idx.reshape(-1)
    if budget > flat_v.shape[0]:
        pad = budget - flat_v.shape[0]
        flat_v = jnp.concatenate([flat_v, jnp.full((pad,), -jnp.inf)])
        flat_i = jnp.concatenate([flat_i, jnp.zeros((pad,), flat_i.dtype)])
    v, sel = jax.lax.top_k(flat_v, budget)
    fi = flat_i[sel]
    valid = jnp.isfinite(v)
    xy = jnp.stack(
        [(fi % Wp).astype(jnp.float32), (fi // Wp).astype(jnp.float32)],
        axis=-1,
    ) * valid[:, None]
    return xy, jnp.where(valid, v, 0.0), valid


def _extract_level(
    level_img: jax.Array, budget: int, scale: float, lvl: int, cfg: OrbConfig
):
    H, W = level_img.shape
    if _use_pallas(cfg) and cfg.cell_size == 8:
        xy, resp, valid = _select_keypoints_pallas(level_img, budget, cfg)
    else:
        fast = fast_score_map(level_img, cfg.fast_threshold)
        harris = harris_response(level_img, cfg.harris_block)
        # FAST corners ranked by Harris (OpenCV ORB HARRIS_SCORE)
        ranked = jnp.where(fast > 0.0, harris, -jnp.inf)
        # enforce the edge margin so orientation/BRIEF patches stay in-bounds
        ys = jnp.arange(H)[:, None]
        xs = jnp.arange(W)[None, :]
        m = cfg.edge_margin
        interior = (ys >= m) & (ys < H - m) & (xs >= m) & (xs < W - m)
        ranked = jnp.where(interior, ranked, -jnp.inf)

        xy, resp, valid = _select_keypoints(ranked, budget, cfg.cell_size)

    # one patch slab from the blurred level serves orientation AND BRIEF
    # (ORB computes IC angle on the raw image; a sigma-2 blur preserves the
    # centroid direction and saves a second patch extraction — documented
    # deviation, like the non-copied BRIEF pattern above)
    blurred = gaussian_blur(level_img, sigma=2.0, radius=3)
    patches = _extract_patches(blurred, xy)
    angle, desc = _orient_and_describe(patches, cfg)
    return OrbFeatures(
        xy=xy * scale,
        response=resp,
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
