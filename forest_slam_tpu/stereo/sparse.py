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

from forest_slam_tpu.stereo.disparity import SgmConfig, _prefilter


class SparseStereoConfig(NamedTuple):
    num_disparities: int = 96
    window: int = 7  # SAD window (odd)
    prefilter_cap: float = 31.0
    max_cost_ratio: float = 0.8  # best/second-best uniqueness gate
    subpixel: bool = True


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

    xi = xy[:, 0].astype(jnp.int32)
    yi = xy[:, 1].astype(jnp.int32)
    K = xi.shape[0]

    # left anchor patches: (K, w, w) via dynamic_slice from a padded image
    # (border keypoints read zero-padding; they are masked invalid below)
    pl_pad = jnp.pad(pl, r)

    def one_patch(x, y):
        return jax.lax.dynamic_slice(pl_pad, (y, x), (w, w))

    patch_l = jax.vmap(one_patch)(xi, yi)

    # Right candidates, TPU-first: instead of gathering (K, D, w, w)
    # scattered patches (K*D*w*w random HBM touches — measured 84 ms/frame
    # at 960x600), slice ONE contiguous row-strip per keypoint covering all
    # D candidate windows (dynamic_slice from a pre-padded image — ~3x
    # faster than advanced-indexing gathers on TPU), then expand the D
    # sliding windows on-chip with conv_general_dilated_patches.
    S = D + w - 1  # strip width covers x - (D-1) - r .. x + r
    ds = jnp.arange(D)
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
    cost = cost_j[:, ::-1]  # j = D-1-d  ->  index by d
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
