"""Wide-baseline match diagnostics (K=10/20 failure analysis).

For a frame pair (0, gap) of a 960x600 synthetic sequence: extract + match
with the learned front-end (and ORB for contrast), reproject frame-0
keypoints into the second frame with ground-truth depth + poses, and
report the residual distribution of the matcher's assignments. Separates
ASSIGNMENT quality (is the matched keypoint near the true reprojection?)
from LOCALIZATION quality (how far off, i.e. what search radius a
refinement stage needs).

Usage: python scripts/diag_wide_baseline.py [--gaps 5 10 20] [--scene corridor]
       [--weights PATH] [--scales 1.0] [--frontends sp orb]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--gaps", type=int, nargs="+", default=[1, 5, 10, 20])
    ap.add_argument("--scene", default="corridor")
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--scales", type=float, nargs="+", default=[1.0])
    ap.add_argument("--frontends", nargs="+", default=["sp", "orb"])
    ap.add_argument("--speed", type=float, default=0.15)
    args = ap.parse_args()

    import jax

    from forest_slam_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from forest_slam_tpu.frontend import OrbConfig
    from forest_slam_tpu.frontend.base import learned_frontend, orb_frontend
    from forest_slam_tpu.io.synthetic import render_sequence

    H, W = args.height, args.width
    n = max(args.gaps) + 1
    seq = render_sequence(
        n, height=H, width=W, speed=args.speed, scene=args.scene
    )
    K = np.asarray(seq.rig.left.K, np.float64)
    gt = np.asarray(seq.T_world_cam, np.float64)
    depths = np.asarray(seq.depths_left, np.float32)

    fes = {}
    if "sp" in args.frontends:
        from forest_slam_tpu.frontend.weights import (
            DEFAULT_PATH,
            load_learned_frontend,
        )

        fe, fp = load_learned_frontend(
            (H, W), args.weights or DEFAULT_PATH, max_keypoints=1024,
            scales=tuple(args.scales),
        )
        fes["sp"] = (learned_frontend(fe), fp)
    if "orb" in args.frontends:
        fes["orb"] = (
            orb_frontend(OrbConfig(n_features=512, n_levels=8), 64.0),
            None,
        )

    def reproject(xy, gap):
        """GT reprojection of frame-0 pixels into frame `gap` (+ a depth-
        validity mask)."""
        xi = np.clip(np.round(xy[:, 0]).astype(int), 0, W - 1)
        yi = np.clip(np.round(xy[:, 1]).astype(int), 0, H - 1)
        z = depths[0][yi, xi].astype(np.float64)
        finite = np.isfinite(z)
        pts_cam0 = (
            np.stack([xy[:, 0], xy[:, 1], np.ones(len(xy))], 1)
            @ np.linalg.inv(K).T
        ) * z[:, None]
        T = np.linalg.inv(gt[gap]) @ gt[0]
        pts_cam1 = pts_cam0 @ T[:3, :3].T + T[:3, 3]
        uv = pts_cam1 @ K.T
        front = uv[:, 2] > 0.1
        uv = uv[:, :2] / np.maximum(uv[:, 2:3], 1e-9)
        inside = (
            (uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        )
        return uv, finite & front & inside

    for name, (fn, fp) in fes.items():
        for gap in args.gaps:
            img0, img1 = seq.images_left[0], seq.images_left[gap]
            f0 = fn.extract(fp, img0)
            f1 = fn.extract(fp, img1)
            m0 = np.asarray(fn.match(fp, f0, f1, (H, W)))
            xy0 = np.asarray(f0.xy)
            xy1 = np.asarray(f1.xy)
            v0 = np.asarray(f0.valid)
            matched = (m0 >= 0) & v0
            uv, vis = reproject(xy0, gap)
            usable = matched & vis
            if usable.sum() == 0:
                print(f"{name:4s} gap={gap:<3d} no usable matches")
                continue
            resid = np.linalg.norm(
                xy1[m0[usable]] - uv[usable], axis=1
            )
            q = np.percentile(resid, [50, 75, 90])
            n_vis = int(vis.sum())
            rec = lambda r: (resid < r).sum()
            print(
                f"{name:4s} gap={gap:<3d} kp0_visible {n_vis:4d} "
                f"matched {int(usable.sum()):4d} "
                f"resid px p50/p75/p90 {q[0]:6.1f}/{q[1]:6.1f}/{q[2]:6.1f}  "
                f"<2px {rec(2):4d}  <8px {rec(8):4d}  <24px {rec(24):4d}  "
                f"<48px {rec(48):4d}",
                flush=True,
            )


if __name__ == "__main__":
    main()
