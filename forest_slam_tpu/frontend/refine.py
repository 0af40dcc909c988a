"""Post-match keypoint refinement by local template search.

Wide-baseline SuperGlue matches on the synthetic corridor are coarsely
correct but poorly localized (median reprojection residual 12-30 px at
frame gaps 10-20, measured) — SuperPoint's detections do not repeat to
sub-pixel accuracy under the scale change of forward motion, so
PnP-RANSAC's 1 px inlier gate (stereo_slam.py:294 parity) rejects nearly
everything and tracking collapses at large keyframe intervals.

``refine_matches`` pulls each matched point toward the true correspondence
with a classical template search (the feature-alignment step of
SVO/DSO-style VO): an 8x8 template around the frame-0 keypoint is matched
by SAD against a (2R+1)^2 neighbourhood of the frame-1 estimate, with
parabola sub-pixel in both axes. All fixed-shape and vmapped: one
dynamic_slice per template + one per search window, SAD expansion via
conv_general_dilated_patches — same gather discipline as stereo/sparse.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from forest_slam_tpu.utils import tpu_backend


class RefineConfig(NamedTuple):
    radius: int = 12  # search +-radius px around the matcher's estimate
    template: int = 8  # template side (even: centred on the pixel grid)
    max_cost_ratio: float = 0.9  # best/second-best uniqueness gate
    # Cost-volume construction, arithmetically equivalent (tested):
    #   "pallas": fused TPU kernel (pallas_refine.py) — both images in
    #     VMEM, per-keypoint template/window from aligned in-VMEM loads,
    #     no HBM gathers;
    #   "xla": tap-accumulation over dynamic-sliced windows (any backend).
    # "auto": pallas on TPU when the tiling constraints hold, else xla.
    # Measured v5e 960x600 K=1024 R=24, batched(8), host-fetch timing:
    # pallas 11.3 ms/pair vs xla 10.5 — currently a wash (kernel notes in
    # pallas_refine.py); auto stays on pallas for its flat scaling in R.
    cost_path: str = "auto"
    # Template-to-window scale ratios to search. Forward motion enlarges
    # approaching patches by z0/z1 (~1.45x at a 3 m step onto a 10 m
    # point); a fixed-scale SAD then cannot lock on (measured at frame
    # gap 20: 34% of refine survivors are within 24 px of GT but only 8%
    # reach 2 px — vs 54%/57% at gap 10 where scale change is mild). Each
    # s > 1 reruns the search with frame 0 UPSCALED by s (so the search
    # stays at frame 1's native resolution — full sub-pixel precision),
    # and the per-keypoint winner is the scale whose SAD valley is deepest
    # relative to its own second-best (ratio, not raw cost — resampling
    # smoothing biases raw SAD).
    scales: tuple = (1.0,)


def _resolve_cost_path(
    cfg: RefineConfig, img_shapes: tuple | None = None
) -> str:
    if cfg.cost_path != "auto":
        return cfg.cost_path
    on_tpu = tpu_backend()
    # VMEM budget: the kernel holds both padded frames + a (K, n8, 128)
    # f32 cost block in scoped VMEM. pallas_refine.py now sizes the
    # compiler's vmem_limit from its own buffers (the 16 MB default OOM'd
    # by 340 KB at 960x600 / R=24 once the live-count zero-store landed),
    # so the gate only needs to keep the total within a conservative
    # fraction of physical VMEM (128 MB on v5e): padded frames <= 48 MB
    # covers 960x600 and its 1.7x-upscaled scale-search copies.
    frames_ok = True
    if img_shapes is not None:
        (h0, w0), (h1, w1) = img_shapes
        padded = (h0 + 40) * (w0 + 400) + (h1 + 104) * (w1 + 440)
        frames_ok = padded * 4 <= 48_000_000
    fits = (
        cfg.template <= 8
        and 2 * cfg.radius + cfg.template <= 128
        and frames_ok
    )
    return "pallas" if (on_tpu and fits) else "xla"


def _cost_volume_xla(
    img0: jax.Array,
    img1: jax.Array,
    xi0: jax.Array,
    yi0: jax.Array,
    xi1: jax.Array,
    yi1: jax.Array,
    t: int,
    R: int,
) -> jax.Array:
    """(K, n, n) SAD cost via per-keypoint dynamic slices (any backend)."""
    ht = t // 2
    S = t + 2 * R
    img0p = jnp.pad(img0, ht)
    img1p = jnp.pad(img1, ht + R)

    def one(x0, y0, x1, y1):
        tpl = jax.lax.dynamic_slice(img0p, (y0, x0), (t, t))
        win = jax.lax.dynamic_slice(img1p, (y1, x1), (S, S))
        return tpl, win

    tpl, win = jax.vmap(one)(xi0, yi0, xi1, yi1)

    # SAD over all (2R+1)^2 offsets by accumulating one template tap at a
    # time inside a fori_loop — both a (t*t)-fold patches expansion and an
    # unrolled tap loop let XLA keep t*t (K, 2R+1, 2R+1) temporaries alive
    # at once (measured 20 GB under the pair-chunk vmap at R=24); the
    # sequential loop peaks at a single accumulator
    n = 2 * R + 1
    Kn = win.shape[0]

    def tap(i, acc):
        ty = i // t
        tx = i % t
        wslice = jax.lax.dynamic_slice(win, (0, ty, tx), (Kn, n, n))
        tval = jax.lax.dynamic_slice(tpl, (0, ty, tx), (Kn, 1, 1))
        return acc + jnp.abs(wslice - tval)

    return jax.lax.fori_loop(
        0, t * t, tap, jnp.zeros((Kn, n, n), jnp.float32)
    )


def _refine_single(
    img0: jax.Array,  # (H0, W0) frame 0
    img1: jax.Array,  # (H1, W1) frame 1 (possibly downscaled)
    xy0: jax.Array,  # (K, 2) keypoints in frame 0
    xy1: jax.Array,  # (K, 2) estimates in FRAME-1 coords
    valid: jax.Array,
    cfg: RefineConfig,
    nvalid: jax.Array | None = None,  # () live count (valid-compacted)
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One fixed-scale search: ((K, 2) refined frame-1 coords, (K,) ok,
    (K,) best/second cost ratio — lower = more distinctive valley)."""
    H0, W0 = img0.shape
    H1, W1 = img1.shape
    R = cfg.radius
    t = cfg.template
    ht = t // 2
    n = 2 * R + 1

    # clamp to the image so both cost paths see identical in-range starts
    # (out-of-range points are masked by in_bounds below either way)
    xi0 = jnp.clip(jnp.round(xy0[:, 0]).astype(jnp.int32), 0, W0 - 1)
    yi0 = jnp.clip(jnp.round(xy0[:, 1]).astype(jnp.int32), 0, H0 - 1)
    xi1 = jnp.clip(jnp.round(xy1[:, 0]).astype(jnp.int32), 0, W1 - 1)
    yi1 = jnp.clip(jnp.round(xy1[:, 1]).astype(jnp.int32), 0, H1 - 1)

    path = _resolve_cost_path(cfg, ((H0, W0), (H1, W1)))
    if path in ("pallas", "pallas_interpret"):
        from forest_slam_tpu.frontend.pallas_refine import refine_cost_volume

        cost = refine_cost_volume(
            img0, img1, xi0, yi0, xi1, yi1, t, R,
            interpret=path == "pallas_interpret", nvalid=nvalid,
        )
    else:
        cost = _cost_volume_xla(img0, img1, xi0, yi0, xi1, yi1, t, R)
    flat = cost.reshape(-1, n * n)
    best = jnp.argmin(flat, axis=1)
    by = best // n
    bx = best % n
    best_cost = jnp.min(flat, axis=1)

    # uniqueness: best must beat the best candidate outside the 3x3
    # neighbourhood of the winner
    oy = jnp.arange(n)
    near = (
        (jnp.abs(oy[None, :, None] - by[:, None, None]) <= 1)
        & (jnp.abs(oy[None, None, :] - bx[:, None, None]) <= 1)
    )
    big = jnp.float32(1e30)
    second = jnp.min(jnp.where(near, big, cost).reshape(-1, n * n), axis=1)
    unique = best_cost < cfg.max_cost_ratio * second

    # parabola sub-pixel per axis (clamped winners at the border: offset 0)
    def subpix(b, axis_cost):
        bc = jnp.clip(b, 1, n - 2)
        cm = jnp.take_along_axis(axis_cost, (bc - 1)[:, None], axis=1)[:, 0]
        cc = jnp.take_along_axis(axis_cost, bc[:, None], axis=1)[:, 0]
        cp = jnp.take_along_axis(axis_cost, (bc + 1)[:, None], axis=1)[:, 0]
        den = cm - 2 * cc + cp
        off = jnp.where(den > 1e-6, jnp.clip((cm - cp) / (2 * den), -0.5, 0.5), 0.0)
        return jnp.where((b >= 1) & (b <= n - 2), off, 0.0)

    # winner-row / winner-column extraction as one-hot contractions: a
    # take_along_axis row-select here lowers (under the pipeline's
    # pair-chunk vmap) to a masked full-operand reduction PER OUTPUT
    # ELEMENT — measured 53 GB of the 58 GB refine byte bill at bench
    # shapes (stage bisection, round 4). The einsum reads the cost
    # volume once: 2.5 MB/pair instead of ~1.1 GB/pair.
    one_by = (oy[None, :] == by[:, None]).astype(cost.dtype)  # (K, n)
    one_bx = (oy[None, :] == bx[:, None]).astype(cost.dtype)
    col_at_by = jnp.einsum("kn,knm->km", one_by, cost)
    row_at_bx = jnp.einsum("km,knm->kn", one_bx, cost)
    sx = subpix(bx, col_at_by)
    sy = subpix(by, row_at_bx)

    dx = bx.astype(jnp.float32) - R + sx
    dy = by.astype(jnp.float32) - R + sy
    refined = jnp.stack(
        [xi1.astype(jnp.float32) + dx, yi1.astype(jnp.float32) + dy], axis=1
    )

    in_bounds = (
        (xi1 - R - ht >= 0)
        & (xi1 + R + ht < W1)
        & (yi1 - R - ht >= 0)
        & (yi1 + R + ht < H1)
        & (xi0 - ht >= 0)
        & (xi0 + ht < W0)
        & (yi0 - ht >= 0)
        & (yi0 + ht < H0)
    )
    ok = valid & unique & in_bounds
    ratio = best_cost / jnp.maximum(second, 1e-6)
    return refined, ok, jnp.where(ok, ratio, jnp.float32(2.0))


def refine_matches_quality(
    img0: jax.Array,  # (H, W) frame 0
    img1: jax.Array,  # (H, W) frame 1
    xy0: jax.Array,  # (K, 2) keypoints in frame 0
    xy1: jax.Array,  # (K, 2) matched estimates in frame 1
    valid: jax.Array,  # (K,) match validity
    cfg: RefineConfig = RefineConfig(),
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """((K, 2) refined frame-1 coords, (K,) refinement ok, (K,) quality).

    Points that fail the uniqueness gate (at every searched scale) or
    whose window leaves the image keep their input coordinate with
    ok=False. With several cfg.scales, each keypoint's winning scale is
    the one with the deepest relative SAD valley (see RefineConfig).

    ``quality`` is 1 - best/second SAD ratio of the winning scale in
    [0, 1] (0 for not-ok points): a deep, distinctive cost valley scores
    high, a near-ambiguous one near 0. Downstream RANSAC uses it to bias
    minimal-sample draws toward trustworthy correspondences.

    Valid keypoints are compacted to the front before the search so the
    Pallas kernel's per-chunk loops bound to the live count — refine cost
    scales with the matched fraction, not the padded K (results are
    un-permuted on return; per-keypoint outputs are identical).
    """
    H, W = img0.shape
    order = jnp.argsort(jnp.logical_not(valid), stable=True)
    inv = jnp.argsort(order, stable=True)
    xy0 = xy0[order]
    xy1 = xy1[order]
    valid = valid[order]
    nvalid = jnp.sum(valid).astype(jnp.int32)
    cands = []
    for s in cfg.scales:
        if s == 1.0:
            cands.append(
                _refine_single(img0, img1, xy0, xy1, valid, cfg, nvalid)
            )
            continue
        # UPSCALE frame 0 by s (rather than downscaling frame 1): the
        # template then matches frame 1's enlarged appearance while the
        # search still runs at frame 1's native resolution — the refined
        # coordinate keeps full-res sub-pixel precision instead of the
        # +-0.5*s px quantization a downscaled search window would give
        # (decisive against PnP's 1 px gate at s ~ 1.4).
        H0s, W0s = int(round(H * s)), int(round(W * s))
        img0s = jax.image.resize(img0, (H0s, W0s), "linear")
        sc0 = jnp.array([W0s / W, H0s / H], jnp.float32)  # exact, ~s
        r, ok, ratio = _refine_single(
            img0s, img1, xy0 * sc0, xy1, valid, cfg, nvalid
        )
        cands.append((r, ok, ratio))
    if len(cands) == 1:
        refined, ok, ratio = cands[0]
    else:
        refined = jnp.stack([c[0] for c in cands])  # (S, K, 2)
        oks = jnp.stack([c[1] for c in cands])  # (S, K)
        ratios = jnp.stack([c[2] for c in cands])  # (S, K)
        pick = jnp.argmin(jnp.where(oks, ratios, jnp.float32(3.0)), axis=0)
        take = lambda a: jnp.take_along_axis(
            a, pick.reshape((1,) + pick.shape + (1,) * (a.ndim - 2)), axis=0
        )[0]
        ok = take(oks[..., None])[..., 0]
        ratio = take(ratios[..., None])[..., 0]
        refined = take(refined)
    out = jnp.where(ok[:, None], refined, xy1)
    quality = jnp.where(ok, jnp.clip(1.0 - ratio, 0.0, 1.0), 0.0)
    return out[inv], ok[inv], quality[inv]


def refine_matches(
    img0: jax.Array,
    img1: jax.Array,
    xy0: jax.Array,
    xy1: jax.Array,
    valid: jax.Array,
    cfg: RefineConfig = RefineConfig(),
) -> tuple[jax.Array, jax.Array]:
    """:func:`refine_matches_quality` without the quality channel."""
    out, ok, _ = refine_matches_quality(img0, img1, xy0, xy1, valid, cfg)
    return out, ok
