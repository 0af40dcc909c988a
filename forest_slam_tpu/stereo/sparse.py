"""Sparse per-keypoint stereo matching — the pipeline fast path.

The reference computes a FULL dense SGBM disparity map every frame and then
reads it at <=1024 integer keypoint locations (stereo_slam.py:262,278) — on
a 600x960x96 volume that is ~500x more arithmetic than the pipeline
consumes. TPU-first redesign: match only at keypoints.

For each keypoint: gather an (anchor) patch from the x-Sobel-prefiltered
left image, gather the D candidate patches along the same row of the right
image, SAD over the window for all candidates at once, winner-take-all +
parabola sub-pixel — one batched (K, D, w, w) gather + reduction, no
scanline DP. Keypoints sit on textured corners (that is why they were
detected), where local matching is reliable without SGM's smoothness prior;
the PnP-RANSAC stage downstream gates residual mismatches.

The dense SGM kernel (disparity.py) remains available for dense mapping and
for parity experiments (StereoConfig.dense_depth=True).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from forest_slam_tpu.utils import tpu_backend

from forest_slam_tpu.stereo.disparity import SgmConfig, _prefilter


class SparseStereoConfig(NamedTuple):
    num_disparities: int = 96
    window: int = 7  # SAD window (odd)
    prefilter_cap: float = 31.0
    max_cost_ratio: float = 0.8  # best/second-best uniqueness gate
    subpixel: bool = True
    # Cost construction, all arithmetically identical (equivalence-tested):
    #   "pallas": fused TPU kernel (pallas_sparse.py) — both prefiltered
    #     images live in VMEM, per-keypoint windows come from in-VMEM
    #     aligned loads + rotates, no HBM gathers. 0.55 ms/frame at
    #     K=1024, 960x600, D=96 on v5e — bit-exact vs "gather".
    #   "gather": one row-strip dynamic_slice per keypoint (XLA); the TPU
    #     gather unit bounds it at ~190M elem/s: 3.8 ms/frame at K=1024.
    #   "volume": dense box-filtered |diff| volume + row pickup; measured
    #     slower than gather at SLAM-scale K (6.3/3.8 ms) — kept for
    #     reference.
    # "auto" (default): pallas on TPU when D + w - 1 <= 128, else gather.
    cost_path: str = "auto"
    volume_dtype: str = "bfloat16"


def resolve_cost_path(cfg: SparseStereoConfig, K: int, H: int, W: int) -> str:
    """Static cost-path choice. "auto" -> the fused Pallas kernel on TPU
    when its tiling constraints hold (D + w - 1 <= 128, w <= 8), else the
    gather path (measured fastest XLA fallback at SLAM-scale K)."""
    del K, H, W
    if cfg.cost_path != "auto":
        return cfg.cost_path
    on_tpu = tpu_backend()
    fits = cfg.num_disparities + cfg.window - 1 <= 128 and cfg.window <= 8
    return "pallas" if (on_tpu and fits) else "gather"


def _cost_rows_gather(pl, pr, xi, yi, cfg: SparseStereoConfig) -> jax.Array:
    """(K, D) SAD cost via one row-strip slice per keypoint (work ~ K)."""
    D = cfg.num_disparities
    w = cfg.window
    r = w // 2
    K = xi.shape[0]

    # left anchor patches: (K, w, w) via dynamic_slice from a padded image
    # (border keypoints read zero-padding; they are masked invalid below)
    pl_pad = jnp.pad(pl, r)

    def one_patch(x, y):
        return jax.lax.dynamic_slice(pl_pad, (y, x), (w, w))

    patch_l = jax.vmap(one_patch)(xi, yi)

    # Right candidates: instead of gathering (K, D, w, w) scattered patches
    # (K*D*w*w random HBM touches — measured 84 ms/frame at 960x600), slice
    # ONE contiguous row-strip per keypoint covering all D candidate windows
    # (dynamic_slice from a pre-padded image — ~3x faster than
    # advanced-indexing gathers on TPU), then expand the D sliding windows
    # on-chip with conv_general_dilated_patches.
    S = D + w - 1  # strip width covers x - (D-1) - r .. x + r
    # pad so the strip start is (yi, xi) in padded coords, never clamped;
    # zero-padded entries only appear at rows/disparities the validity and
    # in_range masks already exclude
    pr_pad = jnp.pad(pr, ((r, r), (D - 1 + r, r)))

    def one_strip(x, y):
        return jax.lax.dynamic_slice(pr_pad, (y, x), (w, S))

    strip = jax.vmap(one_strip)(xi, yi)  # (K, w, S)

    # windows[k, :, j] = strip[k, :, j:j+w] flattened; candidate disparity d
    # corresponds to window offset j = D - 1 - d
    windows = jax.lax.conv_general_dilated_patches(
        strip[:, None, :, :],  # (K, 1, w, S)
        filter_shape=(w, w),
        window_strides=(1, 1),
        padding="VALID",
    )  # (K, w*w, 1, D)
    windows = windows[:, :, 0, :]  # (K, w*w, D)
    flat_l = patch_l.reshape(K, w * w, 1)
    cost_j = jnp.sum(jnp.abs(flat_l - windows), axis=1)  # (K, D) over j
    return cost_j[:, ::-1]  # j = D-1-d  ->  index by d


def _cost_rows_volume(pl, pr, xi, yi, cfg: SparseStereoConfig) -> jax.Array:
    """(K, D) SAD cost via a dense box-filtered difference volume.

    Identical arithmetic to the gather path (cost(k, d) = sum over the
    w x w window of |pl(p) - pr(p - d)|, zero padding outside the image),
    but built as pure streaming passes over an (D, H, W) volume — no
    per-keypoint gathers until a final (K, D)-row pickup. On TPU the
    bandwidth (~5 volume passes, fused shifted adds) beats the gather
    unit as soon as K is more than a few hundred.
    """
    H, W = pl.shape
    D = cfg.num_disparities
    w = cfg.window
    r = w // 2
    dt = jnp.bfloat16 if cfg.volume_dtype == "bfloat16" else jnp.float32

    # diff volume: vol[d, y, x] = |pl[y, x] - pr[y, x - d]| (zeros where
    # x - d is outside, matching the gather path's zero padding)
    prp = jnp.pad(pr, ((0, 0), (D - 1, 0)))
    vol = jnp.stack(
        [
            jnp.abs(pl - jax.lax.dynamic_slice(prp, (0, D - 1 - d), (H, W)))
            for d in range(D)
        ]
    ).astype(dt)  # (D, H, W)
    # 7x7 box via two separable shifted-add passes (XLA fuses the taps)
    volp = jnp.pad(vol, ((0, 0), (0, 0), (r, r)))
    sw = sum(volp[:, :, k : k + W] for k in range(w))
    swp = jnp.pad(sw, ((0, 0), (r, r), (0, 0)))
    cost_vol = sum(swp[:, k : k + H, :] for k in range(w))  # (D, H, W)
    # row-major pickup: (H*W, D) rows are contiguous after the transpose
    cm = cost_vol.transpose(1, 2, 0).reshape(H * W, D)
    flat = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
    return cm[flat].astype(jnp.float32)  # (K, D)


def sparse_disparity_at_keypoints(
    left: jax.Array,
    right: jax.Array,
    xy: jax.Array,
    cfg: SparseStereoConfig = SparseStereoConfig(),
) -> tuple[jax.Array, jax.Array]:
    """Disparity for (K, 2) integer-ish keypoint coords.

    Returns ((K,) float32 disparity, (K,) bool validity). Invalid when the
    winner is at the search border, out of image bounds, or fails the
    uniqueness gate.
    """
    H, W = left.shape
    D = cfg.num_disparities
    w = cfg.window
    r = w // 2

    pl = _prefilter(left, cfg.prefilter_cap)
    pr = _prefilter(right, cfg.prefilter_cap)

    # round, not floor: keypoints are fractional under the com3 sub-pixel
    # readout (frontend/superpoint.py), and the SAD patch should sit on
    # the nearest pixel so the measured disparity corresponds to the
    # keypoint within +-0.5 px instead of +-1 px
    xi = jnp.round(xy[:, 0]).astype(jnp.int32)
    yi = jnp.round(xy[:, 1]).astype(jnp.int32)
    K = xi.shape[0]

    path = resolve_cost_path(cfg, K, H, W)
    if path in ("pallas", "pallas_interpret"):
        from forest_slam_tpu.stereo.pallas_sparse import sparse_cost_rows

        cost = sparse_cost_rows(
            pl, pr, xi, yi, D, w, interpret=path == "pallas_interpret"
        )
    elif path == "volume":
        cost = _cost_rows_volume(pl, pr, xi, yi, cfg)
    else:
        cost = _cost_rows_gather(pl, pr, xi, yi, cfg)
    return _decide_from_cost(cost, xi, yi, H, W, cfg)


def _decide_from_cost(cost, xi, yi, H: int, W: int, cfg: SparseStereoConfig):
    """(K, D) SAD cost -> (disp, valid): winner-take-all + uniqueness gate
    + sub-pixel parabola + bounds masks (shared by every cost path)."""
    D = cfg.num_disparities
    w = cfg.window
    r = w // 2
    ds = jnp.arange(D)
    max_cost = 2.0 * cfg.prefilter_cap * w * w
    in_range = (xi[:, None] - ds[None, :]) >= r
    cost = jnp.where(in_range, cost, max_cost)

    best = jnp.argmin(cost, axis=1)  # (K,)
    best_cost = jnp.min(cost, axis=1)

    # uniqueness: best must beat the best candidate outside +-1 by the ratio
    near = jnp.abs(ds[None, :] - best[:, None]) <= 1
    second = jnp.min(jnp.where(near, max_cost, cost), axis=1)
    unique = best_cost < cfg.max_cost_ratio * second

    # sub-pixel parabola
    b = jnp.clip(best, 1, D - 2)
    cm = jnp.take_along_axis(cost, (b - 1)[:, None], axis=1)[:, 0]
    cc = jnp.take_along_axis(cost, b[:, None], axis=1)[:, 0]
    cp = jnp.take_along_axis(cost, (b + 1)[:, None], axis=1)[:, 0]
    denom = cm - 2 * cc + cp
    offset = jnp.where(denom > 1e-6, jnp.clip((cm - cp) / (2 * denom), -0.5, 0.5), 0.0)
    disp = best.astype(jnp.float32) + (offset if cfg.subpixel else 0.0)

    valid = (
        unique
        & (best >= 1)
        & (best <= D - 2)
        & (xi >= r)
        & (xi < W - r)
        & (yi >= r)
        & (yi < H - r)
        & (best_cost < max_cost)
    )
    return disp, valid


def sparse_depth_at_keypoints(
    left: jax.Array,
    right: jax.Array,
    xy: jax.Array,
    fx: jax.Array,
    baseline: jax.Array,
    cfg: SparseStereoConfig = SparseStereoConfig(),
) -> tuple[jax.Array, jax.Array]:
    """((K,) depth, (K,) validity) via sparse matching."""
    disp, valid = sparse_disparity_at_keypoints(left, right, xy, cfg)
    depth = fx * baseline / jnp.maximum(disp, 0.1)
    return depth, valid & (disp > 0.1)


def sparse_depth_at_keypoints_batched(
    images_l: jax.Array,  # (B, H, W)
    images_r: jax.Array,
    xy: jax.Array,  # (B, K, 2)
    fx,
    baseline,
    cfg: SparseStereoConfig = SparseStereoConfig(),
) -> tuple[jax.Array, jax.Array]:
    """Batched ((B, K) depth, validity). A plain vmap: on the pallas path
    the custom_vmap rule routes the whole batch to the kernel's native
    batch grid in one pallas_call."""
    return jax.vmap(
        lambda l, r, p: sparse_depth_at_keypoints(l, r, p, fx, baseline, cfg)
    )(images_l, images_r, xy)
