"""Semi-global matching (SGM) disparity, TPU-native.

Replaces the reference's ``cv2.StereoSGBM_create(numDisparities=96,
blockSize=7, P1=8*49, P2=32*49, MODE_SGBM_3WAY)`` (stereo_slam.py:108-117)
— the hardest port in the build plan (SURVEY.md §7.3 item 1): OpenCV's SGBM
is a hand-scheduled C++ dynamic program. The TPU formulation:

- matching cost: SAD over a 7x7 window of x-Sobel prefiltered intensities
  (SGBM's BT-over-sobel cost to first order), built for all disparities at
  once as a (D, H, W) volume with static shifts + box filters — pure
  conv/VPU work;
- aggregation: the SGM recurrence along 4 directions (left/right/up/down),
  each a ``lax.scan`` whose carry is a whole scanline of (spatial, D)
  costs — the dynamic program is sequential along the scan axis but vector-
  parallel across the line and disparity axes, which is exactly the
  VPU-friendly layout;
- winner-take-all + parabola sub-pixel interpolation, uniqueness and
  left-right checks, invalid = -1.0 (matching OpenCV's convention after the
  reference's ``/16`` normalization, stereo_slam.py:117-121).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from forest_slam_tpu.utils.filters import box_filter, sobel


class SgmConfig(NamedTuple):
    num_disparities: int = 96  # stereo_slam.py:109
    block_size: int = 7
    p1: float = 8.0 * 7 * 7
    p2: float = 32.0 * 7 * 7
    prefilter_cap: float = 31.0
    uniqueness_ratio: float = 0.0  # OpenCV create() default: disabled
    lr_max_diff: float = -1.0  # disabled (OpenCV default disp12MaxDiff=0)
    subpixel: bool = True


def _prefilter(img: jax.Array, cap: float) -> jax.Array:
    """x-Sobel clipped to [-cap, cap] — SGBM's input transform."""
    gx, _ = sobel(img.astype(jnp.float32))
    return jnp.clip(gx * 0.25, -cap, cap)


def _cost_volume(left: jax.Array, right: jax.Array, cfg: SgmConfig) -> jax.Array:
    """(H, W, D) SAD cost. Disparity d matches left(x) with right(x - d).

    Out-of-range columns (x < d) get the maximum cost so they never win.

    Disparity is the MINOR axis: a d-major (D, H, W) stack leaves size-1
    slices in the lane-tiled position during aggregation transposes — XLA
    pads each 2.2 MB slice to 281 MB (128x) and the program OOMs at
    600x960x96 (26.6 GB for a 211 MB volume). With d minor the volume
    keeps its natural tiling and the vertical SGM scans need no transpose
    at all.
    """
    H, W = left.shape
    D = cfg.num_disparities
    b = cfg.block_size
    pl = _prefilter(left, cfg.prefilter_cap)
    pr = _prefilter(right, cfg.prefilter_cap)
    max_cost = 2.0 * cfg.prefilter_cap * b * b

    # ad[y, x, d] = |pl[y, x] - pr[y, x - d]| (zeros outside; masked below).
    # All D shifted views come from ONE dilated-patches op: building the
    # volume by stacking 96 per-disparity slices makes XLA materialize each
    # (H, W, 1) slice with the size-1 axis lane-padded 128x — 281 MB per
    # 2.2 MB slice, 26.6 GB total at 600x960x96 (OOM on a 16 GB chip).
    prp = jnp.pad(pr, ((0, 0), (D - 1, 0)))
    win = jax.lax.conv_general_dilated_patches(
        prp[None, None], (1, D), (1, 1), "VALID"
    )[0]  # (D, H, W): win[j, y, x] = pr[y, x + j - (D - 1)]
    win = jnp.transpose(win, (1, 2, 0))  # (H, W, D)
    ad = jnp.abs(pl[..., None] - win)[..., ::-1]  # j = D-1-d -> index by d
    # SAME zero-padded box sum over (y, x) — matches utils.filters.box_filter
    c = jax.lax.reduce_window(
        ad, 0.0, jax.lax.add, (b, 1, 1), (1, 1, 1), "SAME"
    )
    c = jax.lax.reduce_window(
        c, 0.0, jax.lax.add, (1, b, 1), (1, 1, 1), "SAME"
    )
    xs = jnp.arange(W)[None, :, None]
    ds = jnp.arange(D)[None, None, :]
    return jnp.where(xs >= ds, c, max_cost)


def _sgm_scan_dir(cost_dw: jax.Array, p1: float, p2: float) -> jax.Array:
    """Aggregate along axis 0 of (L, S, D): L = scan length, S = lines.

    Returns aggregated costs of the same shape. The carry is the previous
    step's (S, D) aggregated slice — the SGM recurrence:
      L(p,d) = C(p,d) + min(Lp(d), Lp(d±1)+P1, min_d' Lp(d')+P2) - min_d' Lp
    """
    D = cost_dw.shape[-1]
    big = jnp.asarray(jnp.inf, cost_dw.dtype)

    def step(prev, c):
        # prev: (S, D) aggregated costs of the previous pixel on the path
        prev_min = jnp.min(prev, axis=-1, keepdims=True)  # (S, 1)
        up = jnp.concatenate([prev[:, 1:], jnp.full_like(prev[:, :1], big)], axis=1)
        down = jnp.concatenate([jnp.full_like(prev[:, :1], big), prev[:, :-1]], axis=1)
        m = jnp.minimum(
            jnp.minimum(prev, prev_min + p2),
            jnp.minimum(up + p1, down + p1),
        )
        out = c + m - prev_min
        return out, out

    init = cost_dw[0]
    _, agg = jax.lax.scan(step, init, cost_dw[1:])
    return jnp.concatenate([cost_dw[:1], agg], axis=0)


@functools.partial(jax.jit, static_argnums=(2,))
def sgm_disparity(
    left: jax.Array, right: jax.Array, cfg: SgmConfig = SgmConfig()
) -> jax.Array:
    """Dense disparity (H, W) float32; invalid pixels are -1.0.

    Same output convention as the reference consumes: a float map where
    unmatched pixels carry -1 (it then clamps 0/-1 to 0.1,
    stereo_slam.py:120-121).
    """
    H, W = left.shape
    D = cfg.num_disparities
    vol = _cost_volume(left, right, cfg)  # (H, W, D), d minor

    # --- 4-direction aggregation --------------------------------------
    # horizontal: scan over x; lines = rows. (H,W,D) -> (W, H, D)
    chw = jnp.transpose(vol, (1, 0, 2))
    agg_lr = _sgm_scan_dir(chw, cfg.p1, cfg.p2)
    agg_rl = _sgm_scan_dir(chw[::-1], cfg.p1, cfg.p2)[::-1]
    # vertical: scan over y; lines = cols — already (H, W, D)
    agg_td = _sgm_scan_dir(vol, cfg.p1, cfg.p2)
    agg_bu = _sgm_scan_dir(vol[::-1], cfg.p1, cfg.p2)[::-1]

    total = (
        jnp.transpose(agg_lr, (1, 0, 2))
        + jnp.transpose(agg_rl, (1, 0, 2))
        + agg_td
        + agg_bu
    )  # (H, W, D)

    best = jnp.argmin(total, axis=-1)  # (H, W)
    best_cost = jnp.min(total, axis=-1)

    # --- sub-pixel parabola fit ---------------------------------------
    d0 = jnp.clip(best, 1, D - 2)
    cm = jnp.take_along_axis(total, (d0 - 1)[..., None], axis=-1)[..., 0]
    cc = jnp.take_along_axis(total, d0[..., None], axis=-1)[..., 0]
    cp = jnp.take_along_axis(total, (d0 + 1)[..., None], axis=-1)[..., 0]
    denom = cm - 2.0 * cc + cp
    offset = jnp.where(
        denom > 1e-6, jnp.clip((cm - cp) / (2.0 * denom), -0.5, 0.5), 0.0
    )
    disp = jnp.where(
        (best >= 1) & (best <= D - 2),
        best.astype(jnp.float32) + (offset if cfg.subpixel else 0.0),
        best.astype(jnp.float32),
    )

    # --- validity ------------------------------------------------------
    xs = jnp.arange(W)[None, :]
    valid = xs >= best  # right-image sample in bounds
    # border columns where no disparity could be evaluated at all
    valid = valid & (xs >= cfg.block_size // 2)
    if cfg.uniqueness_ratio > 0:
        # second-best outside d_best +- 1
        d_idx = jnp.arange(D)[None, None, :]
        masked = jnp.where(
            jnp.abs(d_idx - best[..., None]) <= 1, jnp.inf, total
        )
        second = jnp.min(masked, axis=-1)
        valid = valid & (second * (100 - cfg.uniqueness_ratio) / 100.0 >= best_cost)
    return jnp.where(valid, disp, -1.0)
